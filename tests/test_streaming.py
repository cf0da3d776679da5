"""Structured Streaming ingest tests: file-source micro-batches through the
fused stage into an appendable store, with watermarked counters."""

import glob
import json
import os

from pyspark.sql import functions as F

from rdf_spark import datagen, scoring, streaming


def test_streaming_pipeline_end_to_end(spark, tmp_path):
    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "kg_stream")

    # two "arriving" page shards
    pages = datagen.pages(spark, 200)
    pages.filter(F.col("url").endswith("0") | F.col("url").endswith("1")
                 | F.col("url").endswith("2") | F.col("url").endswith("3")
                 | F.col("url").endswith("4")).write.mode("overwrite").parquet(in_dir)
    alias_rows = [(r.surface, r.entity_iri, r.prior)
                  for r in datagen.aliases(spark).collect()]

    stream = streaming.stream_pages(spark, in_dir, max_files_per_trigger=2)
    q = streaming.start_streaming_pipeline(stream, alias_rows, out_dir)
    try:
        q.processAllAvailable()
        # second shard arrives
        pages.filter(~(F.col("url").endswith("0") | F.col("url").endswith("1")
                       | F.col("url").endswith("2") | F.col("url").endswith("3")
                       | F.col("url").endswith("4"))).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    store = streaming.read_stream_store(spark, out_dir)
    # streamed store must equal the batch oracle exactly
    expected = datagen.expected_triples(spark, 200)
    score = scoring.pr_score(store, expected)
    assert score.precision == 1.0 and score.recall == 1.0

    manifests = sorted(glob.glob(os.path.join(out_dir, "_stream_manifest", "*.json")))
    assert len(manifests) >= 2  # multiple micro-batches
    total = sum(json.load(open(m))["n_triples"] for m in manifests)
    assert total >= store.count()  # per-batch counts (pre-global-dedup)


def test_crawl_rate_counters(spark, tmp_path):
    in_dir = str(tmp_path / "pages_in2")
    datagen.pages(spark, 100).write.mode("overwrite").parquet(in_dir)
    stream = streaming.stream_pages(spark, in_dir)
    agg = streaming.crawl_rate_counters(stream, window="7 days", watermark="1 day")
    q = (agg.writeStream.outputMode("append").format("memory")
         .queryName("crawl_counters").trigger(availableNow=True).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # append mode only emits finalized windows; just assert the query ran
    # and the aggregation is well-formed
    rows = spark.sql("select * from crawl_counters").collect()
    assert rows is not None


def test_stateful_dedup_stream(spark, tmp_path):
    from rdf_spark import streaming as S
    from rdf_spark import terms

    in_dir = str(tmp_path / "tri_in")
    rows1 = [("http://s1", 1, "http://p", "a", 2, terms.XSD_STRING, None),
             ("http://s2", 1, "http://p", "b", 2, terms.XSD_STRING, None)]
    spark.createDataFrame(rows1, terms.TRIPLE_DDL).write.mode("overwrite").parquet(in_dir)

    stream = (spark.readStream.schema(terms.TRIPLE_DDL)
              .option("maxFilesPerTrigger", 8).parquet(in_dir))
    deduped = S.stateful_dedup_stream(stream, state_timeout_minutes=None, n_key_buckets=8)
    q = (deduped.writeStream.outputMode("append").format("memory")
         .queryName("dedup_out").start())
    try:
        q.processAllAvailable()
        n1 = spark.sql("select count(*) n from dedup_out").first().n
        assert n1 == 2
        # batch 2: one duplicate of s1 + one new triple
        rows2 = [("http://s1", 1, "http://p", "a", 2, terms.XSD_STRING, None),
                 ("http://s3", 1, "http://p", "c", 2, terms.XSD_STRING, None)]
        spark.createDataFrame(rows2, terms.TRIPLE_DDL).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        got = spark.sql("select s from dedup_out").collect()
        subjects = sorted(r.s for r in got)
        assert subjects == ["http://s1", "http://s2", "http://s3"]  # dup suppressed
    finally:
        q.stop()
