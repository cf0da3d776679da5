"""Exact duplicated-substring spans (ops/dedup.py::duplicate_spans)."""
from collections import Counter

import pytest

from rdf_spark.ops.dedup import duplicate_spans


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def _naive(texts, k=8, min_df=2):
    toks = {
        i: [w for w in (t or "").strip().lower().split() if w]
        for i, t in texts.items()
    }
    grams = Counter()
    per_doc = {}
    for i, ts in toks.items():
        gs = [" ".join(ts[p:p + k]) for p in range(len(ts) - k + 1)]
        per_doc[i] = gs
        grams.update(gs)
    out = set()
    for i, gs in per_doc.items():
        run = []
        for p, g in enumerate(gs + [None]):
            if g is not None and grams[g] >= min_df:
                run.append(p)
            elif run:
                out.add((i, run[0], run[-1] + k - 1,
                         run[-1] - run[0] + k, len(run)))
                run = []
    return out


def _got(df):
    return {
        (r.doc_id, r.span_start, r.span_end, r.n_tokens, r.n_windows)
        for r in df.collect()
    }


class TestDuplicateSpans:
    def test_planted_shared_sentence(self, spark):
        shared = "one two three four"
        texts = {
            1: f"alpha beta {shared} gamma",
            2: f"{shared} delta epsilon zeta",
            3: "entirely different words here now",
        }
        got = _got(duplicate_spans(_docs(spark, texts), k=4))
        # doc1: shared tokens at 2..5 → only window [2..5]; doc2: [0..3]
        assert got == {(1, 2, 5, 4, 1), (2, 0, 3, 4, 1)}

    def test_within_doc_repetition(self, spark):
        texts = {1: "a b c x y a b c"}
        got = _got(duplicate_spans(_docs(spark, texts), k=3))
        assert got == {(1, 0, 2, 3, 1), (1, 5, 7, 3, 1)}

    def test_disjoint_spans_stay_separate(self, spark):
        texts = {
            1: "p q r GAP1 s t u",
            2: "p q r GAP2 s t u",
        }
        got = _got(duplicate_spans(_docs(spark, texts), k=3))
        assert got == _naive(texts, k=3)
        assert len([g for g in got if g[0] == 1]) == 2

    def test_short_and_empty_docs(self, spark):
        texts = {1: "a b", 2: "", 3: "a b"}
        assert _got(duplicate_spans(_docs(spark, texts), k=3)) == set()
        # but at k=2 the full 2-token doc pair is a duplicated span
        assert _got(duplicate_spans(_docs(spark, texts), k=2)) == {
            (1, 0, 1, 2, 1), (3, 0, 1, 2, 1)}

    def test_validates(self, spark):
        with pytest.raises(ValueError):
            duplicate_spans(_docs(spark, {1: "a"}), k=0)

    @pytest.mark.parametrize("k,min_df", [(3, 2), (4, 2), (3, 3)])
    def test_matches_naive_random(self, spark, k, min_df):
        import random

        rng = random.Random(k * 100 + min_df)
        vocab = [f"w{i}" for i in range(12)]
        texts = {
            i: " ".join(rng.choice(vocab)
                        for _ in range(rng.randrange(0, 30)))
            for i in range(20)
        }
        got = _got(duplicate_spans(_docs(spark, texts), k=k,
                                   min_df=min_df))
        assert got == _naive(texts, k=k, min_df=min_df)


class TestDuplicatedFraction:
    def test_fraction_math(self, spark):
        from rdf_spark.ops.dedup import duplicated_fraction

        shared = "one two three four"
        texts = {
            1: f"alpha beta {shared} gamma",   # 4 of 7 tokens covered
            2: f"{shared} delta epsilon zeta",  # 4 of 7
            3: "entirely different words here now",  # 0 of 5
            4: "ab",                            # shorter than k
            5: None,
        }
        df = spark.createDataFrame(
            [(i, t) for i, t in texts.items()], "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_fraction)
            for r in duplicated_fraction(df, k=4).collect()
        }
        assert got == {
            1: (7, 4, round(4 / 7, 6)),
            2: (7, 4, round(4 / 7, 6)),
            3: (5, 0, 0.0),
            4: (1, 0, 0.0),
            5: (0, 0, 0.0),
        }
