"""RAG document chunking (ops.text.chunk_documents)."""
import pytest

from rdf_spark.ops.text import chunk_documents


def _chunks(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, **kw).orderBy("doc_id", "chunk_ix")
    return [(r.doc_id, r.chunk_ix, r.begin_token, r.n_tokens,
             r.chunk_text) for r in out.collect()]


def test_window_math(spark):
    text = " ".join(f"t{i}" for i in range(10))
    got = _chunks(spark, [(1, text)], chunk_tokens=4, overlap=1)
    assert got == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 3, 4, "t3 t4 t5 t6"),
        (1, 2, 6, 4, "t6 t7 t8 t9"),
    ]


def test_short_doc_single_chunk(spark):
    got = _chunks(spark, [(1, "a b c")], chunk_tokens=8, overlap=2)
    assert got == [(1, 0, 0, 3, "a b c")]


def test_empty_docs_produce_no_chunks(spark):
    got = _chunks(spark, [(1, ""), (2, "   "), (3, None), (4, "x")],
                  chunk_tokens=4, overlap=1)
    assert got == [(4, 0, 0, 1, "x")]


def test_last_chunk_may_be_short_and_reaches_end(spark):
    text = " ".join(f"t{i}" for i in range(11))
    got = _chunks(spark, [(1, text)], chunk_tokens=4, overlap=1)
    # stride 3: ceil((11-4)/3)=3 → 4 chunks; last begins at 9, len 2
    assert [g[2] for g in got] == [0, 3, 6, 9]
    assert got[-1][3] == 2 and got[-1][4] == "t9 t10"
    # every token appears in some chunk, in order
    reconstructed = got[0][4].split()
    for g in got[1:]:
        reconstructed += g[4].split()[1:]  # drop the 1-token overlap
    assert reconstructed == text.split()


def test_overlap_property(spark):
    text = " ".join(f"w{i}" for i in range(50))
    got = _chunks(spark, [(1, text)], chunk_tokens=16, overlap=4)
    for a, b in zip(got, got[1:]):
        assert a[4].split()[-4:] == b[4].split()[:4]


def test_whitespace_normalization(spark):
    got = _chunks(spark, [(1, "  a\t b\n  c ")], chunk_tokens=4,
                  overlap=0)
    assert got == [(1, 0, 0, 3, "a b c")]


def test_extra_columns_survive(spark):
    df = spark.createDataFrame([(1, "en", "a b c d e")],
                               "doc_id long, lang string, text string")
    out = chunk_documents(df, chunk_tokens=3, overlap=0)
    assert out.columns == ["doc_id", "lang", "chunk_ix", "begin_token",
                           "n_tokens", "chunk_text"]
    assert {r.lang for r in out.collect()} == {"en"}


def test_param_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=-1)
