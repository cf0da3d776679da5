"""Interpolated bigram LM scoring (ops/retrieval.py::bigram_lm_nll)."""
import math
from collections import Counter
from decimal import Decimal

from rdf_spark.ops.retrieval import bigram_lm_nll


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def _naive(texts, lam=0.75, alpha=0.5):
    toks = {
        i: [t for t in (txt or "").strip().lower().split() if t]
        for i, txt in texts.items()
    }
    uni = Counter(t for ts in toks.values() for t in ts)
    t_total, v_size = sum(uni.values()), len(uni)
    bi = Counter()
    for ts in toks.values():
        bi.update(zip(ts, ts[1:]))
    cl = Counter()
    for (v, _), c in bi.items():
        cl[v] += c
    out = {}
    for i, ts in toks.items():
        if len(ts) < 2:
            continue
        s, n = Decimal(0), 0
        for (v, w), tfc in Counter(zip(ts, ts[1:])).items():
            p = lam * (bi[(v, w)] / cl[v]) + (1.0 - lam) * (
                (uni[w] + alpha) / (t_total + alpha * v_size)
            )
            s += Decimal(str(round(tfc * round(-math.log(p), 12), 9)))
            n += tfc
        out[i] = (round(float(s) / n, 6), n)
    return out


def _got(df):
    return {r.doc_id: (r.lm2_nll, r.n_bigrams) for r in df.collect()}


class TestBigramLm:
    def test_hand_corpus(self, spark):
        texts = {
            1: "the cat sat on the mat",
            2: "the cat sat",
            3: "mat the cat",     # same unigrams as a prefix of 1
        }
        got = _got(bigram_lm_nll(_docs(spark, texts)))
        assert got == _naive(texts)

    def test_word_order_signal(self, spark):
        # 20 copies of the canonical sentence dominate every context;
        # the shuffled copy reuses the exact vocabulary but all its
        # transitions are 1-in-21 → clearly higher nll
        sent = "the quick brown fox jumps"
        texts = {i: sent for i in range(20)}
        texts[99] = "fox the jumps brown quick"
        got = _got(bigram_lm_nll(_docs(spark, texts)))
        assert got == _naive(texts)
        assert got[99][0] > got[0][0] * 2

    def test_short_docs_omitted(self, spark):
        texts = {1: "one", 2: "", 3: "   ", 4: "two tokens"}
        got = _got(bigram_lm_nll(_docs(spark, texts)))
        assert set(got) == {4}
        assert got[4][1] == 1

    def test_matches_naive_random(self, spark):
        import random

        rng = random.Random(91)
        vocab = [f"w{i}" for i in range(30)]
        texts = {
            i: " ".join(rng.choice(vocab)
                        for _ in range(rng.randrange(2, 40)))
            for i in range(25)
        }
        texts[100] = "w0"          # omitted
        for lam, alpha in ((0.75, 0.5), (0.5, 0.25)):
            got = _got(bigram_lm_nll(_docs(spark, texts), lam=lam,
                                     alpha=alpha))
            assert got == _naive(texts, lam=lam, alpha=alpha)

    def test_partitioning_invariant(self, spark):
        texts = {i: f"a b c w{i} a b" for i in range(10)}
        base = _got(bigram_lm_nll(_docs(spark, texts)))
        repart = _got(bigram_lm_nll(_docs(spark, texts).repartition(7)))
        assert base == repart
