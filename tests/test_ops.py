"""Training-data operator tests: text analysis, dedup families, ANN,
multimodal plumbing — over the driver-provided documents/embeddings
tables plus synthetic edge cases."""

import os

import pytest

from pyspark.sql import functions as F

from rdf_spark.ops import ann, dedup, multimodal
from rdf_spark.ops import text as textops

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_text_analysis(spark, documents):
    out = textops.analyze_documents(documents).collect()
    assert all(r.q_tokens > 0 for r in out)
    assert all(0.0 <= r.q_score <= 1.0 for r in out)
    assert all(len(r.fingerprint) == 32 for r in out)
    langs = {r.lang_guess for r in out}
    assert langs <= {"en", "de", "und"}


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world",), ("",), ("  a  b  ",), ("don't stop, won't stop!",)], ["text"]
    )
    got = df.select(
        textops.token_count_col(F.col("text")).alias("n"),
        textops.bpe_token_count_col(F.col("text")).alias("b"),
    ).collect()
    assert [r.n for r in got] == [2, 0, 2, 4]
    # BPE-ish: don ' t stop , won ' t stop ! → 10
    assert got[3].b == 10


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat"), (2, "the  cat   sat"), (3, "a different doc")],
        ["doc_id", "text"],
    )
    groups = dedup.exact_dedup(df).collect()
    sizes = sorted(g.n_docs for g in groups)
    assert sizes == [1, 2]  # normalization merges 1 and 2
    rep = [g.rep_id for g in groups if g.n_docs == 2][0]
    assert rep == 1


def test_minhash_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    near = base.replace("lazy", "sleepy")
    far = "completely different content about spark engines and parquet files " * 4
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)], ["doc_id", "text"]
    )
    pairs = dedup.minhash_near_duplicates(df, threshold=0.5)
    got = {(r.a, r.b) for r in pairs.collect()}
    assert (1, 4) in got  # exact dup must be found
    assert (1, 2) in got or (2, 4) in got  # near dup found
    assert not any(3 in p for p in got)  # far doc never pairs


def test_simhash_near_duplicates(spark):
    # simhash is order-invariant: a shuffled doc is hamming-0; the banded
    # join guarantees recall for hamming ≤ 3 (4 bands × 16 bits)
    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    shuffled = " ".join(reversed(base.split()))
    far = "totally unrelated words describing other situations entirely " * 8
    df = spark.createDataFrame([(1, base), (2, shuffled), (3, far)], ["doc_id", "text"])
    pairs = dedup.simhash_near_duplicates(df, max_hamming=3).collect()
    got = {(r.a, r.b): r.hamming for r in pairs}
    assert got.get((1, 2)) == 0
    assert not any(3 in p for p in got)


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")], ["doc_id", "text"]
    )
    cand = spark.createDataFrame([(1, 2), (1, 3)], ["a", "b"])
    out = {(r.a, r.b): r.jaccard for r in
           dedup.jaccard_verify(cand, df, threshold=0.0).collect()}
    assert out[(1, 2)] == pytest.approx(3 / 5)
    assert out[(1, 3)] == 0.0
    # bigram variant
    bi = {(r.a, r.b): r.jaccard for r in
          dedup.jaccard_verify(cand, df, threshold=0.0, ngram=2).collect()}
    assert bi[(1, 2)] == pytest.approx(2 / 4)


def test_brute_force_topk(spark, embeddings):
    queries = embeddings.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann.brute_force_topk(embeddings, queries, k=5)
    rows = out.collect()
    assert len(rows) == 15
    # self is always the nearest neighbor at sim ≈ 1
    top1 = {r.query_id: (r.vec_id, r.sim) for r in rows if r.rank == 1}
    for q, (v, s) in top1.items():
        assert q == v and s >= 0.999999


def test_lsh_topk_recall(spark, embeddings):
    queries = embeddings.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = ann.brute_force_topk(embeddings, queries, k=3)
    approx = ann.lsh_topk(embeddings, queries, dim=64, k=3, n_bits=6)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    # self-match always shares its own bucket → recall ≥ 1/3 guaranteed;
    # random hyperplanes at 6 bits typically do much better
    assert len(a & e) >= 5


def test_multimodal_stub(spark):
    media = multimodal.synthetic_media(spark, 60)
    feats = multimodal.decode_images(media, dim=8)
    rows = feats.collect()
    assert all(len(r.features) == 8 for r in rows)
    # deterministic: same payload → same features
    again = {r.media_id: r.features for r in multimodal.decode_images(media, dim=8).collect()}
    assert all(again[r.media_id] == r.features for r in rows)
    frames = multimodal.sample_frames(media, every_ms=10000)
    assert frames.count() > 0
    with pytest.raises(NotImplementedError):
        multimodal.decode_images(media, stub=False)
