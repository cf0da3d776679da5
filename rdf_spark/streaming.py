"""Structured Streaming ingest: a continuously-arriving crawl → triple store.

The reference's "streaming" is pull-based iteration (decoder.go:40-52);
the distributed analogue for a live crawl is a file-source stream of page
shards driving the SAME fused batch stage via ``foreachBatch``:

    readStream(pages dir) → fused extract/parse/link → skolemize/validate
      → per-batch dedup → append to the store + per-batch manifest row

``foreachBatch`` + checkpointing gives exactly-once per micro-batch:
a re-delivered batch overwrites its own batch-id-keyed data partition
AND manifest row (append alone would double triples on replay), which
is the streaming twin of the batch pipeline's shard-manifest resume.
Watermarked event-time counters over ``warc_ts`` ride the same stream.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_spark import canonical, extraction

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_pages(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def start_streaming_pipeline(
    pages_stream: DataFrame,
    alias_rows: list[tuple[str, str, float]],
    out_dir: str,
    trigger_seconds: int | None = None,
):
    """Start the KG ingest stream; returns the StreamingQuery.

    Each micro-batch is deduped batch-locally and appended; global dedup is
    the store's responsibility (the canonical store is periodically
    compacted with canonical.dedup_triples, or consumers read through a
    dropDuplicates view) — streaming global dedup state at 10^12 docs
    would be unbounded.
    """
    tagged = extraction.fused_extract_parse_link(pages_stream, alias_rows)
    process_batch = make_batch_processor(out_dir)
    writer = (
        tagged.writeStream.outputMode("append")
        .foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def make_batch_processor(out_dir: str):
    """The foreachBatch sink: tagged rows → skolemize/validate/dedup →
    batch_id-keyed idempotent writes + manifest.  Factored out so replay
    semantics (calling it twice with the same batch_id) are testable."""
    store_dir = os.path.join(out_dir, "triples_stream")
    quarantine_dir = os.path.join(out_dir, "quarantine_stream")
    manifest_dir = os.path.join(out_dir, "_stream_manifest")
    os.makedirs(manifest_dir, exist_ok=True)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        t0 = time.time()
        from pyspark import StorageLevel

        batch_df = batch_df.persist(StorageLevel.DISK_ONLY)
        quarantine = batch_df.filter(F.col("err").isNotNull()).select("url", "err")
        triples = batch_df.filter(F.col("err").isNull()).drop("err")
        good = canonical.validate_triples(triples).filter(F.col("valid")).drop("valid")
        final = canonical.dedup_triples(canonical.skolemize(good), keep_lineage=True)
        # foreachBatch is at-least-once: a replayed micro-batch must not
        # append its triples a second time.  Writing each batch into its
        # own batch_id-keyed partition with overwrite makes the DATA write
        # idempotent too (the manifest alone only made the counters so).
        final.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"batch_id={batch_id}")
        )
        n_q = quarantine.count()
        if n_q:
            quarantine.write.mode("overwrite").parquet(
                os.path.join(quarantine_dir, f"batch_id={batch_id}")
            )
        n = final.count()
        batch_df.unpersist()
        # batch-id-keyed manifest → idempotent on micro-batch replay
        with open(os.path.join(manifest_dir, f"batch-{batch_id}.json"), "w") as f:
            json.dump(
                {"batch_id": batch_id, "n_triples": n, "n_quarantined": n_q,
                 "wall_s": round(time.time() - t0, 3), "ts": time.time()},
                f,
            )

    return process_batch


def crawl_rate_counters(pages_stream: DataFrame, window: str = "1 hour",
                        watermark: str = "2 hours") -> DataFrame:
    """Watermarked event-time ingest counters (late pages beyond the
    watermark are dropped from the aggregate, not the store)."""
    domain = F.regexp_extract(F.col("url"), r"^https?://([^/]+)/", 1)
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), domain.alias("domain"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.approx_count_distinct("url").alias("approx_urls"),
        )
    )


def triple_hash_pd(pdf, key_cols: list[str]):
    """64-bit identity hash of a triple batch over the FULL identity key.

    Includes the kind discriminants (the same lexical as IRI vs literal
    must NOT collide) and disambiguates nulls from the literal string
    'None' / sentinel values by hashing the sentinel-filled values AND
    the null mask, then mixing the two streams.
    """
    import pandas as pd

    kf = pdf[key_cols]
    filled = kf.astype("string").fillna("\x00")
    h_vals = pd.util.hash_pandas_object(filled, index=False).to_numpy().view("int64")
    h_mask = pd.util.hash_pandas_object(
        kf.isna().astype("int8"), index=False
    ).to_numpy().view("int64")
    return pd.Series(h_vals ^ (h_mask * -0x61C8864680B583EB), index=pdf.index)


def stateful_dedup_stream(
    triples_stream: DataFrame,
    state_timeout_minutes: int | None = 60,
    n_key_buckets: int = 1024,
) -> DataFrame:
    """Streaming cross-batch dedup as a custom stateful operator
    (``applyInPandasWithState``): keyed by a subject hash-bucket, the state
    holds the set of triple hashes already emitted; only first-seen triples
    pass through.

    State is bounded two ways: bucketing keeps per-key state mergeable and
    the processing-time timeout drops buckets idle longer than
    ``state_timeout_minutes`` (so dedup is exact within the window and
    best-effort across it — the batch compaction remains the source of
    global exactness).  NOTE: with a processing-time timeout Spark keeps
    scheduling (empty) micro-batches to evaluate timers, so
    ``processAllAvailable`` never returns — poll the sink instead, or pass
    ``state_timeout_minutes=None`` for unbounded state without timers.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    cols = [c for c in triples_stream.columns if c != "_kb"]
    keyed = triples_stream.withColumn(
        "_kb", F.pmod(F.xxhash64("s"), F.lit(n_key_buckets)).cast("int")
    )
    out_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in triples_stream.schema.fields)

    use_timeout = state_timeout_minutes is not None

    key_cols = [c for c in ("s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang")
                if c in triples_stream.columns]

    def dedup_fn(key, pdf_iter, state):
        if use_timeout and state.hasTimedOut:
            state.remove()
            return
        seen = set(state.get[0]) if state.exists else set()
        out = []
        for pdf in pdf_iter:
            ph = triple_hash_pd(pdf, key_cols)
            fresh = ~ph.isin(list(seen)) & ~ph.duplicated()
            seen.update(int(x) for x in ph[fresh])
            out.append(pdf.loc[fresh, cols])
        state.update((list(seen),))
        if use_timeout:
            state.setTimeoutDuration(state_timeout_minutes * 60 * 1000)
        result = pd.concat(out) if out else None
        if result is not None and len(result):
            yield result

    return keyed.groupBy("_kb").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_ddl,
        stateStructType="seen array<long>",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _stateful_processor_cls():
    # deferred import: pyspark.sql.streaming.stateful_processor exists only
    # on Spark 4+; keep module import safe elsewhere
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class GlobalDedupProcessor(StatefulProcessor):
        """Cross-batch exact dedup state: one MapState entry per seen
        triple hash.  Point lookups/inserts against the (RocksDB) state
        store — the state is never materialized wholesale per batch the
        way the ListState/applyInPandasWithState variant rewrites it, so
        it survives indefinitely and scales past executor memory."""

        def __init__(self, key_cols: list[str], out_cols: list[str]):
            self._key_cols = key_cols
            self._out_cols = out_cols

        def init(self, handle) -> None:
            self._seen = handle.getMapState("seen", "h long", "v tinyint")

        def handleInputRows(self, key, rows, timer_values):
            for pdf in rows:
                ph = triple_hash_pd(pdf, self._key_cols)
                batch_seen: set[int] = set()
                keep = []
                for h in ph:
                    h = int(h)
                    if h in batch_seen or self._seen.containsKey((h,)):
                        keep.append(False)
                    else:
                        batch_seen.add(h)
                        self._seen.updateValue((h,), (1,))
                        keep.append(True)
                out = pdf.loc[keep, self._out_cols]
                if len(out):
                    yield out

        def close(self) -> None:
            pass

    return GlobalDedupProcessor


def global_dedup_stream(
    triples_stream: DataFrame,
    n_key_buckets: int = 1024,
) -> DataFrame:
    """Globally-exact streaming cross-batch dedup on the state store.

    Unlike :func:`stateful_dedup_stream`'s default (windowed-exact: a
    processing-time timeout bounds the list state), exactness here never
    expires.  Run it with the RocksDB state store provider — start the
    session with ``get_spark(streaming_state="rocksdb")`` or set
    ``spark.sql.streaming.stateStore.providerClass`` to
    :data:`ROCKSDB_PROVIDER` before the query starts — so state lives
    off-heap/on-disk instead of executor memory.

    Preferred plan: ``transformWithStateInPandas`` with one MapState entry
    per seen triple hash (RocksDB point lookups/inserts; the state is
    never rewritten wholesale).  That API needs the ``google.protobuf``
    package in the Python workers; where it is unavailable (this
    container), falls back to ``applyInPandasWithState`` with NoTimeout —
    same exact semantics, still RocksDB-resident, but the per-bucket hash
    list is reserialized each batch (raise ``n_key_buckets`` to keep
    individual state rows small).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
        has_proto = True
    except ImportError:
        has_proto = False
    if not has_proto:
        return stateful_dedup_stream(
            triples_stream, state_timeout_minutes=None, n_key_buckets=n_key_buckets
        )
    cols = [c for c in triples_stream.columns if c != "_kb"]
    key_cols = [c for c in ("s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang")
                if c in triples_stream.columns]
    keyed = triples_stream.withColumn(
        "_kb", F.pmod(F.xxhash64("s"), F.lit(n_key_buckets)).cast("int")
    )
    out_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in triples_stream.schema.fields)
    proc = _stateful_processor_cls()(key_cols, cols)
    return keyed.groupBy("_kb").transformWithStateInPandas(
        proc, outputStructType=out_ddl, outputMode="append", timeMode="none"
    )


def read_stream_store(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read-through view of the streamed store with global dedup applied."""
    df = spark.read.parquet(os.path.join(out_dir, "triples_stream"))
    return canonical.dedup_triples(df.drop("url_hash", "n_sources", "url", "batch_id"))
