"""DSIR importance weighting (ops/dsir.py)."""
import hashlib
import math

import pytest

from rdf_spark.ops.dsir import dsir_select, dsir_weights, gumbel_key_col

B = 64  # tiny bucket table so collisions are exercised


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _target_like(spark):
    # target vocabulary: "alpha beta gamma"; off-target: "zeta eta theta"
    tgt = _docs(spark, [(100 + i, "alpha beta gamma alpha beta")
                        for i in range(3)])
    raw = _docs(spark, [
        (0, "alpha beta gamma alpha"),       # on-target
        (1, "alpha beta alpha beta"),        # on-target
        (2, "zeta eta theta zeta eta"),      # off-target
        (3, "zeta theta zeta theta"),        # off-target
        (4, ""),                             # empty
    ])
    return raw, tgt


class TestWeights:
    def test_on_target_scores_higher(self, spark):
        raw, tgt = _target_like(spark)
        w = {r.doc_id: r.dsir_logw
             for r in dsir_weights(raw, tgt, n=2, n_buckets=B).collect()}
        assert min(w[0], w[1]) > max(w[2], w[3])
        assert w[4] == 0.0

    def test_empty_doc_zero_grams(self, spark):
        raw, tgt = _target_like(spark)
        out = {r.doc_id: r.n_grams
               for r in dsir_weights(raw, tgt, n=2, n_buckets=B).collect()}
        assert out[4] == 0
        assert out[0] == 3  # 4 tokens → 3 bigrams

    def test_partitioning_invariant(self, spark):
        raw, tgt = _target_like(spark)
        a = sorted(dsir_weights(raw.repartition(1), tgt, n=2,
                                n_buckets=B).collect())
        b = sorted(dsir_weights(raw.repartition(7), tgt, n=2,
                                n_buckets=B).collect())
        assert a == b

    def test_unigram_python_replay(self, spark):
        raw, tgt = _target_like(spark)
        alpha = 0.01

        def buckets(text):
            toks = [t for t in text.split() if t]
            return [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % B
                    for t in toks]

        tgt_rows = [r.text for r in tgt.collect()]
        raw_rows = {r.doc_id: r.text for r in raw.collect()}
        tcnt, rcnt = {}, {}
        for t in tgt_rows:
            for b in buckets(t):
                tcnt[b] = tcnt.get(b, 0) + 1
        for t in raw_rows.values():
            for b in buckets(t):
                rcnt[b] = rcnt.get(b, 0) + 1
        nt, nr = sum(tcnt.values()), sum(rcnt.values())

        def w_of(b):
            pt = (tcnt.get(b, 0) + alpha) / (nt + alpha * B)
            pr = (rcnt.get(b, 0) + alpha) / (nr + alpha * B)
            return round(math.log(pt) - math.log(pr), 9)

        expected = {
            d: round(sum(w_of(b) for b in buckets(t)), 6)
            for d, t in raw_rows.items()
        }
        got = {r.doc_id: r.dsir_logw
               for r in dsir_weights(raw, tgt, n=1, n_buckets=B,
                                     alpha=alpha).collect()}
        for d in expected:
            assert got[d] == pytest.approx(expected[d], abs=2e-6), d


class TestSelect:
    def test_deterministic_and_sized(self, spark):
        raw, tgt = _target_like(spark)
        a = sorted(r.doc_id for r in dsir_select(raw, tgt, k=3,
                                                 n_buckets=B).collect())
        b = sorted(r.doc_id for r in dsir_select(raw.repartition(5), tgt,
                                                 k=3, n_buckets=B).collect())
        assert a == b and len(a) == 3

    def test_strong_doc_always_selected(self, spark):
        raw, tgt = _target_like(spark)
        # unigram model: docs 0/1 use only target vocabulary; at low
        # temperature the exp(logw/T) gap dominates any Gumbel draw
        got = {r.doc_id for r in dsir_select(raw, tgt, k=2, n=1,
                                             n_buckets=B,
                                             temperature=0.01).collect()}
        assert got == {0, 1}

    def test_k_validates(self, spark):
        raw, tgt = _target_like(spark)
        with pytest.raises(ValueError):
            dsir_select(raw, tgt, k=0)

    def test_gumbel_is_pure_function_of_id(self, spark):
        df = _docs(spark, [(i, "x") for i in range(50)])
        a = df.select("doc_id", gumbel_key_col().alias("g")).collect()
        b = df.repartition(9).select("doc_id",
                                     gumbel_key_col().alias("g")).collect()
        assert sorted(a) == sorted(b)
        assert len({round(r.g, 9) for r in a}) == 50  # all distinct


class TestPlanShape:
    def test_weight_join_is_broadcast(self, spark):
        raw, tgt = _target_like(spark)
        plan = dsir_weights(raw, tgt, n=1, n_buckets=B)._jdf.queryExecution(
        ).executedPlan().toString()
        # the n_buckets-row weight table must broadcast: raw gram rows
        # never shuffle for the scoring join
        assert "BroadcastHashJoin" in plan
