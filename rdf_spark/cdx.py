"""CDXJ crawl-index source (Common Crawl / OpenWayback index format).

The reference has no crawl-index source (its sources are RDF syntaxes);
a crawl→KG pipeline at 100 TB does NOT enumerate WARC segments blindly —
it plans fetches from the CDX index: per-URL capture records keyed by
SURT, each line

    ``<surt key> <14..17-digit timestamp> <JSON block>``

e.g. ``com,example)/page 20240101120000 {"url": "https://example.com/
page", "status": "200", "mime": "text/html", "digest": "sha1:..",
"filename": "crawl-00.warc.gz", "offset": "384", "length": "1027"}``.

Design: CDXJ is line-oriented text → ``spark.read.text`` splits files
for free (unlike WARC).  Parsing is ONE JVM ``regexp_extract`` per
field group plus ``get_json_object`` for the JSON block — no Python in
the hot path, codegen-wide, zero shuffle.  Malformed lines follow the
sources.py quarantine convention: an ``err`` column (null on success)
so one corrupt index shard cannot kill a planning job; ``strict=True``
raises on the first malformed line instead.

The numeric fields (``status``, ``offset``, ``length``) arrive as JSON
strings in real indexes; they are surfaced both raw and as
``try_cast`` columns (ANSI-safe) because fetch planning needs to sum
``length`` and range-sort ``offset``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# key = anything up to first space; ts = 14-17 digits; json = { ... } to EOL
_CDXJ_RE = r"^(\S+) ([0-9]{14,17}) (\{.*\})\s*$"


def parse_cdxj(
    lines: DataFrame, line_col: str = "value", strict: bool = False
) -> DataFrame:
    """Parse CDXJ index lines → ``(surt_key, ts, url, mime, digest,
    filename, status, offset, length, err)``.

    Blank lines are dropped (trailing newlines in real index shards);
    any other non-matching line or JSON block missing the mandatory
    ``url`` key yields ``err`` = the offending line (all data columns
    null).  ``strict=True`` raises on the first bad line via a
    ``raise_error`` embedded in the ``err`` column — same convention as
    sources.py decode-all.  (The raise fires when ``err`` is evaluated;
    a caller that explicitly projects ``err`` away opted back into
    quarantine semantics for that plan.)
    """
    src = lines.select(F.col(line_col).alias("_line")).filter(
        F.trim(F.col("_line")) != ""
    )
    key = F.regexp_extract("_line", _CDXJ_RE, 1)
    ts = F.regexp_extract("_line", _CDXJ_RE, 2)
    js = F.regexp_extract("_line", _CDXJ_RE, 3)
    matched = F.col("_line").rlike(_CDXJ_RE)
    url = F.get_json_object(js, "$.url")
    ok = matched & url.isNotNull()
    # strict: the raise lives INSIDE the err output column — a detached
    # guard column would be pruned by Catalyst and never evaluate
    err = (
        F.when(~ok, F.raise_error(
            F.concat(F.lit("CDXJ: malformed line: "), F.col("_line"))
        ).cast("string"))
        if strict
        else F.when(~ok, F.col("_line"))
    )
    out = src.select(
        F.when(ok, key).alias("surt_key"),
        F.when(ok, ts).alias("ts"),
        F.when(ok, url).alias("url"),
        F.when(ok, F.get_json_object(js, "$.mime")).alias("mime"),
        F.when(ok, F.get_json_object(js, "$.digest")).alias("digest"),
        F.when(ok, F.get_json_object(js, "$.filename")).alias("filename"),
        F.when(ok, F.get_json_object(js, "$.status")).alias("status_raw"),
        F.when(ok, F.get_json_object(js, "$.status"))
        .try_cast("int").alias("status"),
        F.when(ok, F.get_json_object(js, "$.offset"))
        .try_cast("bigint").alias("offset"),
        F.when(ok, F.get_json_object(js, "$.length"))
        .try_cast("bigint").alias("length"),
        err.alias("err"),
    )
    return out


def read_cdxj(
    spark: SparkSession, path: str, strict: bool = False
) -> DataFrame:
    """``spark.read.text`` (splittable, unlike WARC) → :func:`parse_cdxj`."""
    return parse_cdxj(spark.read.text(path), strict=strict)


def recrawl_stats(records: DataFrame) -> DataFrame:
    """Change-rate statistics per URL from CDX capture history →
    ``(url, n_captures, n_versions, change_rate, first_ts, last_ts)``.

    The index stores one row per CAPTURE; a recrawl scheduler wants to
    know how often a page actually CHANGES (distinct payload digests)
    relative to how often it was fetched: ``change_rate =
    (n_versions − 1) / (n_captures − 1)`` (0.0 for single-capture URLs —
    no evidence of change), rounded to 6 dp.  High change_rate → crawl
    often; 0 → archive-stable, fetch rarely.

    One hash aggregate over (url); count_distinct(digest) is exact —
    per-URL capture counts are small (bounded by crawl frequency), so
    the distinct state never skews the way corpus-wide vocabularies do
    (ops/skew.py exists for THAT shape).
    """
    g = records.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_captures"),
        # digest-less captures carry no change evidence: count_distinct
        # skips nulls, so clamp to ≥1 version (all-null ⇒ 1, not 0)
        F.greatest(
            F.count_distinct(F.col("digest")), F.lit(1).cast("bigint")
        ).alias("n_versions"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    rate = F.when(
        F.col("n_captures") > 1,
        F.round(
            (F.col("n_versions") - F.lit(1)).cast("double")
            / (F.col("n_captures") - F.lit(1)).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return g.select(
        "url", "n_captures", "n_versions",
        rate.alias("change_rate"), "first_ts", "last_ts",
    )
