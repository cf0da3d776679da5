"""Streaming corpus curation: the row-local cascade per micro-batch plus
cross-batch stateful fingerprint dedup (first-seen wins)."""

from pyspark.sql import functions as F

from rdf_spark import curate

DOCS_DDL = "doc_id int, text string, lang string"

GOOD = "the cat and the dog were friends in the park for a while"
GOOD2 = "it was the best of times and it was a fine day for all of them"


def _write(spark, rows, path, mode):
    spark.createDataFrame(rows, DOCS_DDL).write.mode(mode).parquet(path)


def test_curate_stream_cross_batch_dedup(spark, tmp_path):
    in_dir = str(tmp_path / "docs_in")
    batch1 = [
        (1, GOOD, "en"),           # kept
        (2, GOOD, "zh"),           # lang-dropped
        (3, ";;;; !!!!", "en"),    # quality-dropped
        (4, GOOD2, "en"),          # kept
    ]
    _write(spark, batch1, in_dir, "overwrite")

    stream = (spark.readStream.schema(DOCS_DDL)
              .option("maxFilesPerTrigger", 8).parquet(in_dir))
    out = curate.curate_stream(
        stream, langs=("en",), min_quality=0.5, sample_rate=1.0, n_key_buckets=8
    )
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("curated").start())
    try:
        q.processAllAvailable()
        got1 = {r.doc_id for r in spark.sql("select doc_id from curated").collect()}
        assert got1 == {1, 4}

        # batch 2: a cross-batch duplicate of doc 1 (different id), a
        # within-batch duplicate pair, and a fresh doc
        fresh = "a perfectly ordinary sentence with the varied words of a new doc"
        batch2 = [
            (10, GOOD, "en"),     # duplicate of doc 1 from batch 1 → dropped
            (11, fresh, "en"),    # kept (first of the in-batch pair)
            (12, fresh, "en"),    # in-batch duplicate → dropped
        ]
        _write(spark, batch2, in_dir, "append")
        q.processAllAvailable()
        got2 = {r.doc_id for r in spark.sql("select doc_id from curated").collect()}
        assert 10 not in got2  # cross-batch duplicate never re-enters
        # exactly one of the in-batch pair survives; which one depends on
        # partition arrival order (first-seen, not min-id — documented)
        assert len({11, 12} & got2) == 1
        assert got2 - {11, 12} == {1, 4}
    finally:
        q.stop()


def test_curate_stream_rowlocal_matches_batch(spark, tmp_path):
    """Per-batch row-local filtering must equal the batch cascade's
    lang/quality/repetition/sample verdicts (dedup aside)."""
    in_dir = str(tmp_path / "docs_in2")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text", "lang")
    docs.write.mode("overwrite").parquet(in_dir)

    stream = (spark.readStream.schema("doc_id bigint, text string, lang string")
              .option("maxFilesPerTrigger", 100).parquet(in_dir))
    out = curate.curate_stream(
        stream, langs=("en", "de"), min_quality=0.6, sample_rate=0.5,
        n_key_buckets=8,
    )
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("curated2").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {r.doc_id for r in spark.sql("select doc_id from curated2").collect()}
    batch_kept = curate.curate_corpus(
        docs, langs=("en", "de"), min_quality=0.6, sample_rate=0.5
    )
    expected = {r.doc_id for r in batch_kept.select("doc_id").collect()}
    # corpus has no exact duplicates → first-seen dedup equals min-id dedup
    assert streamed == expected

    # schema: stream output keeps the original + signal columns
    cols = set(spark.sql("select * from curated2 limit 1").columns)
    assert {"doc_id", "text", "lang", "q_score", "rep_keep"} <= cols


def test_curate_stream_classifier_gate(spark, tmp_path):
    """The model-based gate is row-local, so it applies per micro-batch
    exactly like the batch cascade: all-negative weights drop every doc
    before the stateful dedup stage ever sees it."""
    in_dir = str(tmp_path / "docs_clf")
    _write(spark, [(1, GOOD, "en"), (2, GOOD2, "en")], in_dir, "overwrite")
    stream = (spark.readStream.schema(DOCS_DDL)
              .option("maxFilesPerTrigger", 8).parquet(in_dir))
    out = curate.curate_stream(
        stream, langs=("en",), min_quality=0.0, sample_rate=1.0,
        n_key_buckets=4,
        classifier=dict(weights=[-1.0] * 16, min_score=0.5),
    )
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("curated_clf").start())
    try:
        q.processAllAvailable()
        assert spark.sql("select * from curated_clf").count() == 0
    finally:
        q.stop()


def test_curate_stream_c4_stage(spark, tmp_path):
    g1 = "the quick brown fox jumps over the lazy dog today."
    g2 = "every good sentence carries at least five real words!"
    g3 = "what does a terminal question mark look like here?"
    in_dir = str(tmp_path / "docs_c4")
    _write(spark, [
        (1, "\n".join([g1, "click here", g2, g3]), "en"),   # kept, cleaned
        (2, "\n".join([g1, "click here"]), "en"),           # c4 page drop
        (3, "\n".join([g1, g2, g3, "buy now"]), "en"),      # dup of 1 cleaned
    ], in_dir, "overwrite")
    stream = (spark.readStream.schema(DOCS_DDL)
              .option("maxFilesPerTrigger", 8).parquet(in_dir))
    out = curate.curate_stream(
        stream, langs=("en",), min_quality=0.0, sample_rate=1.0,
        n_key_buckets=4, c4=True,
    )
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("curated_c4").start())
    try:
        q.processAllAvailable()
        rows = spark.sql("select doc_id, text from curated_c4").collect()
        got = {r.doc_id: r.text for r in rows}
        assert set(got) == {1} or set(got) == {3}  # first-seen of the pair
        assert next(iter(got.values())) == "\n".join([g1, g2, g3])
    finally:
        q.stop()
