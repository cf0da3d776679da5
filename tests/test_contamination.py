

def test_embedding_decontaminate(spark):
    import math

    from rdf_spark.ops.contamination import embedding_decontaminate

    # basis-vector corpus: cosine vs e0 is exactly 1/sqrt(1.25) for d=0
    # rows, 0.5/sqrt(1.25) for d=15, 0 otherwise
    def vec(d):
        v = [0.0] * 16
        v[d] = 2.0 + d          # scaling must not matter (cosine)
        v[(d + 1) % 16] = (2.0 + d) / 2
        return v

    corpus = spark.createDataFrame(
        [(i, vec(i % 16)) for i in range(64)],
        "doc_id long, embedding array<float>")
    e0 = [0.0] * 16
    e0[0] = 3.0
    eval_set = spark.createDataFrame(
        [(0, e0)], "eval_id long, embedding array<float>")

    surv = embedding_decontaminate(corpus, eval_set, threshold=0.8)
    kept = {r.doc_id for r in surv.collect()}
    assert kept == {i for i in range(64) if i % 16 != 0}
    # threshold between the two nonzero cosines keeps the d=15 rows
    lo = embedding_decontaminate(corpus, eval_set, threshold=0.4)
    assert {r.doc_id % 16 for r in lo.collect()} == set(range(1, 15))
    # audit mode flags instead of dropping
    flagged = embedding_decontaminate(
        corpus, eval_set, threshold=0.8, keep_contaminated=True)
    assert flagged.count() == 64
    assert flagged.filter("contaminated").count() == 4
    # sanity: the analytic cosine really is what the test assumes
    assert math.isclose(1 / math.sqrt(1.25), 0.894, abs_tol=1e-3)
    import pytest as _p
    with _p.raises(ValueError):
        embedding_decontaminate(corpus, eval_set, threshold=0.8, max_eval=0)
