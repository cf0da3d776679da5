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


def test_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-processing the same batch_id must
    not double the stored triples (batch_id-keyed overwrite)."""
    from rdf_spark import extraction

    out_dir = str(tmp_path / "replay_store")
    alias_rows = [(r.surface, r.entity_iri, r.prior)
                  for r in datagen.aliases(spark).collect()]
    tagged = extraction.fused_extract_parse_link(datagen.pages(spark, 60), alias_rows)
    process = streaming.make_batch_processor(out_dir)
    process(tagged, 0)
    n_first = streaming.read_stream_store(spark, out_dir).count()
    process(tagged, 0)  # replay of the SAME micro-batch
    store = streaming.read_stream_store(spark, out_dir)
    assert store.count() == n_first
    raw = spark.read.parquet(os.path.join(out_dir, "triples_stream"))
    assert raw.count() == n_first  # not even pre-dedup doubling


def test_triple_hash_distinguishes_kinds_and_nulls():
    import pandas as pd

    from rdf_spark.streaming import triple_hash_pd

    cols = ["s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang"]
    pdf = pd.DataFrame(
        [
            ("u:s", 1, "u:p", "u:x", 1, None, None),      # object as IRI
            ("u:s", 1, "u:p", "u:x", 2, None, None),      # same lexical as literal
            ("u:s", 1, "u:p", "v", 2, "dt", None),        # no lang
            ("u:s", 1, "u:p", "v", 2, "dt", "None"),      # literal string 'None'
            ("u:s", 1, "u:p", "\x00", 2, "dt", None),     # sentinel as value
            ("u:s", 1, "u:p", None, 2, "dt", None),       # true null
            ("u:s", 1, "u:p", "u:x", 1, None, None),      # dup of row 0
        ],
        columns=cols,
    )
    h = triple_hash_pd(pdf, cols)
    assert h[0] != h[1] and h[2] != h[3] and h[4] != h[5]
    assert h[0] == h[6]


def test_stateful_dedup_keeps_iri_vs_literal(spark, tmp_path):
    """Two triples with the same lexical object but different o_kind must
    BOTH pass the streaming dedup (they are distinct triples)."""
    from rdf_spark import streaming as S
    from rdf_spark import terms

    in_dir = str(tmp_path / "tri_kinds")
    rows = [("http://s1", 1, "http://p", "http://x", 1, None, None),
            ("http://s1", 1, "http://p", "http://x", 2, terms.XSD_STRING, None)]
    spark.createDataFrame(rows, terms.TRIPLE_DDL).write.mode("overwrite").parquet(in_dir)
    stream = (spark.readStream.schema(terms.TRIPLE_DDL)
              .option("maxFilesPerTrigger", 8).parquet(in_dir))
    deduped = S.stateful_dedup_stream(stream, state_timeout_minutes=None, n_key_buckets=4)
    q = (deduped.writeStream.outputMode("append").format("memory")
         .queryName("dedup_kinds").start())
    try:
        q.processAllAvailable()
        n = spark.sql("select count(*) n from dedup_kinds").first().n
        assert n == 2
    finally:
        q.stop()


def test_global_dedup_stateful_processor_class():
    """The preferred transformWithStateInPandas path can't RUN in this
    container (google.protobuf missing in Python workers), so construct
    the processor against the installed pyspark StatefulProcessor API and
    drive its dedup logic with a fake MapState handle — catches API drift
    (method renames, abstractmethod additions) before the fallback masks
    it."""
    import pandas as pd

    from rdf_spark.streaming import _stateful_processor_cls

    key_cols = ["s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang"]
    cls = _stateful_processor_cls()
    proc = cls(key_cols, key_cols)

    class FakeMap:
        def __init__(self):
            self.d = {}

        def containsKey(self, k):
            return k in self.d

        def updateValue(self, k, v):
            self.d[k] = v

    class FakeHandle:
        def getMapState(self, name, key_ddl, value_ddl):
            assert name == "seen"
            return FakeMap()

    proc.init(FakeHandle())
    rows = pd.DataFrame(
        [
            ("urn:s1", 1, "urn:p", "o", 2, None, None),
            ("urn:s1", 1, "urn:p", "o", 2, None, None),  # in-batch dup
            ("urn:s2", 1, "urn:p", "o", 1, None, None),  # kind differs: keep
        ],
        columns=key_cols,
    )
    out1 = pd.concat(list(proc.handleInputRows(None, [rows], None)))
    assert len(out1) == 2
    # cross-batch: the same triples again are all dups now
    assert list(proc.handleInputRows(None, [rows], None)) == []
    proc.close()


def test_global_dedup_stream_rocksdb(spark, tmp_path):
    """VERDICT item 7: a duplicate arriving across 3 separate micro-batches
    is emitted exactly once, with seen-hash state in the RocksDB state
    store (point lookups, no timeout window)."""
    from rdf_spark import terms

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", streaming.ROCKSDB_PROVIDER
    )
    try:
        in_dir = str(tmp_path / "tri_global")
        t = lambda s, o: (s, 1, "http://p", o, 2, None, None)  # noqa: E731

        def write(rows, mode):
            spark.createDataFrame(rows, terms.TRIPLE_DDL).coalesce(1).write.mode(
                mode
            ).parquet(in_dir)

        write([t("http://s1", "a"), t("http://s2", "b")], "overwrite")
        stream = (spark.readStream.schema(terms.TRIPLE_DDL)
                  .option("maxFilesPerTrigger", 1).parquet(in_dir))
        deduped = streaming.global_dedup_stream(stream, n_key_buckets=4)
        q = (deduped.writeStream.outputMode("append").format("memory")
             .queryName("global_dedup").start())
        try:
            q.processAllAvailable()
            write([t("http://s1", "a"), t("http://s3", "c")], "append")  # dup batch 2
            q.processAllAvailable()
            write([t("http://s1", "a"), t("http://s4", "d")], "append")  # dup batch 3
            q.processAllAvailable()
            got = spark.sql("select s, o from global_dedup").collect()
            assert sorted((r.s, r.o) for r in got) == [
                ("http://s1", "a"), ("http://s2", "b"),
                ("http://s3", "c"), ("http://s4", "d"),
            ]
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_crawl_ops_compose_with_streams(spark, tmp_path):
    """decode_html / extract_main_text / extract_page_meta are stateless
    projections, so the crawl-ingest chain runs unchanged on a
    readStream source (micro-batch per parquet file)."""
    from pyspark.sql import functions as F

    from rdf_spark.ops.content import extract_main_text
    from rdf_spark.ops.html import decode_html, extract_page_meta

    long = "A body paragraph easily long enough to be kept as content."
    html = ('<meta charset="iso-8859-1"><title>T</title>'
            f"<p>{long} café</p>").encode("cp1252")
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(
        [(f"https://st.example/{i}", html) for i in range(4)],
        "url string, html binary",
    ).write.parquet(src)

    stream = spark.readStream.schema("url string, html binary").parquet(src)
    decoded = decode_html(stream, out_col="page")
    chain = extract_main_text(decoded, html_col="page")
    q = (chain.writeStream.outputMode("append").format("memory")
         .queryName("crawl_chain").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("select * from crawl_chain").collect()
    assert len(got) == 4
    assert all(r.main_text == f"{long} café" for r in got)

    meta = extract_page_meta(decoded, html_col="page")
    q2 = (meta.writeStream.outputMode("append").format("memory")
          .queryName("crawl_meta").start())
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert {r.title for r in spark.sql(
        "select * from crawl_meta").collect()} == {"T"}
