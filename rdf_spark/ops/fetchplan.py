"""Politeness-aware fetch scheduling — the step between a crawl
frontier (CDX records, sitemap URLs, discovered links) and the fetcher
fleet.

EXCEEDS reference parity (the reference has no crawl layer); completes
this repo's crawl loop: ``cdx.parse_cdxj`` / ``sitemap.parse_sitemaps``
discover URLs, ``ops.robots`` decides WHETHER a URL may be fetched and
publishes per-host ``Crawl-delay`` budgets (robots_crawl_delays), and
this module decides WHEN: one serial queue per host, consecutive
fetches ``crawl_delay`` seconds apart.

Spark-first shape, sized for a 10^10-URL frontier:

- the per-host queue position is ONE window (`row_number` over host),
  ordered by ``(md5(url), url)`` — the repo's deterministic-sampling
  convention, so the schedule is partitioning-invariant, replayable in
  plain SQL, and insensitive to input order;
- delays join on ``host`` with NO forced broadcast — a web-scale host
  table is 10^8 rows, Catalyst/AQE picks the strategy;
- the output is a plain column recipe (slot, fetch_at_s) — a fetcher
  shards it by ``host`` and each task replays its hosts' queues with
  zero coordination, because the schedule is data, not driver state.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from rdf_spark.ops.url import url_host


def plan_fetches(
    frontier: DataFrame,
    delays: DataFrame | None = None,
    url_col: str = "url",
    default_delay: float = 1.0,
) -> DataFrame:
    """Append ``(host, slot, fetch_at_s)`` to the frontier rows.

    ``slot`` is the 1-based position in the host's serial fetch queue
    (deterministic md5 order); ``fetch_at_s = (slot−1) × delay`` where
    delay is the host's ``crawl_delay`` from ``delays`` (the
    ``robots_crawl_delays`` shape: host, crawl_delay) or
    ``default_delay``.  Rows without an absolute URL get host '' and
    schedule among themselves — callers filter them or not; they are
    not silently dropped.
    """
    df = url_host(frontier, col=url_col, out="host")
    if delays is not None:
        d = delays.select(
            F.col("host"), F.col("crawl_delay").cast("double").alias("_delay")
        )
        df = df.join(d, "host", "left")
    else:
        df = df.withColumn("_delay", F.lit(None).cast("double"))
    w = Window.partitionBy("host").orderBy(
        F.md5(F.col(url_col)), F.col(url_col)
    )
    return (
        df.withColumn("slot", F.row_number().over(w))
        .withColumn(
            "fetch_at_s",
            (F.col("slot") - F.lit(1))
            * F.coalesce(F.col("_delay"), F.lit(float(default_delay))),
        )
        .drop("_delay")
    )
