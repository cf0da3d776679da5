"""Hashed linear classifier scoring (ops/text.py)."""
import hashlib
import math

import pytest

from rdf_spark.ops.text import hashed_classifier_score

W = [(i % 13 - 6) / 64.0 for i in range(64)]


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 64


def _expected(text: str, bias: float = 0.0) -> float:
    toks = [t for t in text.split() if t]
    if toks:
        z = bias + sum(W[_bucket(t)] for t in toks) / len(toks)
    else:
        z = bias
    return round(1.0 / (1.0 + math.exp(-z)), 6)


def _score(spark, rows, **kw):
    df = spark.createDataFrame([(r,) for r in rows], "text string")
    out = hashed_classifier_score(df, W, **kw)
    return {r.text: r.clf_score for r in out.collect()}


class TestHashedClassifierScore:
    def test_matches_reference_python(self, spark):
        texts = [
            "the quick brown fox",
            "spam spam spam spam spam buy now",
            "a",
            "mixed CASE Tokens 123 !!",
        ]
        got = _score(spark, texts)
        for t in texts:
            assert got[t] == pytest.approx(_expected(t), abs=1e-6), t

    def test_empty_and_null_score_sigmoid_bias(self, spark):
        df = spark.createDataFrame([("",), (None,), ("   ",)], "text string")
        out = hashed_classifier_score(df, W, bias=1.0).collect()
        expect = round(1.0 / (1.0 + math.exp(-1.0)), 6)
        assert all(r.clf_score == pytest.approx(expect, abs=1e-6) for r in out)

    def test_partitioning_invariant(self, spark):
        texts = [f"tok{i} tok{i + 1} tok{i * 7}" for i in range(50)]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        a = {r.text: r.clf_score
             for r in hashed_classifier_score(df, W).collect()}
        b = {r.text: r.clf_score
             for r in hashed_classifier_score(df.repartition(7), W).collect()}
        assert a == b

    def test_token_order_invariant_sum(self, spark):
        # decimal fold: permuting tokens must give the IDENTICAL score
        got = _score(spark, ["alpha beta gamma", "gamma alpha beta"])
        assert len(set(got.values())) == 1

    def test_empty_weights_raise(self, spark):
        df = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(ValueError):
            hashed_classifier_score(df, [])
