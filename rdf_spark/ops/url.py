"""URL canonicalization — the key-cleaning step of a URL-keyed crawl
corpus (north rule: pages keyed by ``url``; the reference keys its
extraction by exact url string, so lookalike URLs become spurious
distinct pages unless normalized first).

``normalize_url`` rewrites each URL into a canonical form so that
byte-different spellings of the same resource collapse under exact
dedup / groupBy:

- scheme and host lowercased (RFC 3986 §6.2.2.1 case normalization)
- fragment stripped (never sent to the server)
- default ports dropped (``http://h:80`` → ``http://h``,
  ``https://h:443`` → ``https://h``; non-default ports kept)
- empty path → ``/`` (RFC 3986 §6.2.3)
- query parameters: empties dropped, tracking parameters removed by
  configurable prefix (``utm_`` etc.), survivors SORTED so parameter
  order is canonical; an emptied query loses its ``?``

Everything is a single projection of pure JVM expressions
(regexp_extract / array_sort / filter lambdas) — zero shuffle, scales
row-locally at any corpus size, and whole-stage codegen applies.  Inputs
that do not look like absolute URLs (no ``scheme://``) pass through
trimmed-but-unchanged rather than being mangled (sound-not-complete,
same policy as the arrow fast paths).

At 100 TB this runs as a narrow stage ahead of ``exact_dedup`` or the
url-hash shard partitioner in ``pipeline.py`` — normalizing BEFORE the
shuffle means lookalike spellings land in the same partition and
collapse map-side.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query-parameter prefixes that identify tracking/session noise; matched
# with startswith against the full "k=v" token, so "utm_" catches every
# utm_* key and "fbclid=" only that exact key
DEFAULT_DROP_PARAMS = ("utm_", "fbclid=", "gclid=", "msclkid=", "sessionid=")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"


def normalize_url_col(
    col: Column, drop_params: tuple[str, ...] = DEFAULT_DROP_PARAMS
) -> Column:
    """The canonical-URL expression over a string column (see module
    docstring for the exact rewrite rules)."""
    u0 = F.trim(col)
    # fragment first: a '?' inside a fragment must not read as a query
    u = F.regexp_replace(u0, r"#.*$", "")
    has_scheme = u.rlike(_SCHEME_RE)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)

    def _keep(x: Column) -> Column:
        return reduce(
            lambda acc, p: acc & ~x.startswith(p),
            drop_params,
            x != "",
        )

    qn = F.array_join(F.array_sort(F.filter(F.split(query, "&"), _keep)), "&")
    norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qn != "", F.concat(F.lit("?"), qn)).otherwise(F.lit("")),
    )
    return F.when(has_scheme, norm).otherwise(u0)


def normalize_url(
    df: DataFrame,
    col: str = "url",
    out: str = "url_norm",
    drop_params: tuple[str, ...] = DEFAULT_DROP_PARAMS,
) -> DataFrame:
    """Add ``out`` = the canonical form of ``col``.  Row-local (zero
    shuffle); feed the result to ``ops.dedup.exact_dedup`` keyed on
    ``out`` to collapse lookalike URL spellings."""
    return df.withColumn(out, normalize_url_col(F.col(col), drop_params))


def url_host(df: DataFrame, col: str = "url", out: str = "host") -> DataFrame:
    """Add ``out`` = the lowercased host[:port] of ``col`` ('' when the
    value is not an absolute URL) — the grouping key of per-domain
    corpus analytics (``pipeline.domain_stats`` uses the same shape)."""
    return df.withColumn(
        out, F.lower(F.regexp_extract(F.trim(F.col(col)), _HOSTPORT_RE, 1))
    )


def dedup_by_canonical(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    drop_params: tuple[str, ...] = DEFAULT_DROP_PARAMS,
) -> DataFrame:
    """Collapse mirrored/parameter-variant pages onto their declared
    ``<link rel=canonical>`` target: pages sharing a canonical URL (or,
    with none declared, the same normalized url) keep ONE survivor.

    The winner is the page whose url IS the canonical target when the
    group contains it (the authoritative copy), else the md5-rank
    minimum (the ops.sample determinism convention: identical at any
    parallelism, replayable in SQL).  Key rule:
    ``coalesce(normalize(canonical), normalize(url))`` — canonical
    extraction is the pure-JVM head scan of
    :func:`rdf_spark.ops.html.canonical_col` (a projection, not a
    join).

    Scale shape: one narrow projection + ONE shuffle on the canonical
    key into a map-side WindowGroupLimit (``row_number() <= 1`` —
    oversized mirror farms truncate before crossing the wire, the same
    skew guard as the LSH bucket pre-cap).  Output keeps the input
    columns.
    """
    from pyspark.sql import Window

    from rdf_spark.ops.html import canonical_col

    # canonical extraction is a pure projection (no meta-table join —
    # duplicate input urls cannot blow up, and the stage stays narrow)
    keyed = pages.withColumn(
        "_ckey",
        F.coalesce(
            normalize_url_col(
                canonical_col(pages, html_col, url_col), drop_params
            ),
            normalize_url_col(F.col(url_col), drop_params),
        ),
    )
    # authoritative-copy-first, then md5 rank: a (bool, hash) struct min
    rank = F.struct(
        (normalize_url_col(F.col(url_col), drop_params) != F.col("_ckey"))
        .cast("int").alias("not_self"),
        F.md5(F.col(url_col)).alias("h"),
    )
    w = Window.partitionBy("_ckey").orderBy(rank.asc())
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_ckey")
    )


def surt_col(col: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key expression —
    the canonical crawl-index key (Internet Archive / Common Crawl CDX
    convention): ``com,example)/path?a=1&b=2``.

    Subset implemented (documented, IA-compatible for the common case):
    scheme dropped; host lowercased, leading ``www.`` label dropped
    (when ≥3 labels remain without it), default ports dropped
    (non-default kept as ``:port`` after the reversed host); host labels
    REVERSED and comma-joined — the property that makes the key useful:
    one host's (and one domain's) pages become one contiguous key range,
    so a sorted/bucketed 100 TB index answers host- and domain-prefix
    queries with partition pruning instead of a scan; fragment dropped;
    empty path → ``/``; query parameters sorted (everything lowercased,
    IA default).  Non-absolute inputs → NULL (a SURT of a relative URL
    is undefined).  Pure JVM expressions — zero shuffle, codegen-wide.
    """
    u0 = F.lower(F.trim(col))
    u = F.regexp_replace(u0, r"#.*$", "")
    has_scheme = u.rlike(_SCHEME_RE)
    scheme = F.regexp_extract(u, _SCHEME_RE, 1)
    hostport = F.regexp_extract(u, _HOSTPORT_RE, 1)
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r"(:[0-9]+)$", 1)
    labels = F.split(host, r"\.")
    labels = F.when(
        (F.element_at(labels, 1) == "www") & (F.size(labels) >= 3),
        F.slice(labels, 2, F.size(labels) - 1),
    ).otherwise(labels)
    rev_host = F.array_join(F.reverse(labels), ",")
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    qn = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda x: x != "")), "&"
    )
    key = F.concat(
        rev_host,
        port,
        F.lit(")"),
        path,
        F.when(qn != "", F.concat(F.lit("?"), qn)).otherwise(F.lit("")),
    )
    return F.when(has_scheme, key).otherwise(F.lit(None))


def surt(df: DataFrame, col: str = "url", out: str = "surt_key") -> DataFrame:
    """Append the SURT key column (see :func:`surt_col`)."""
    return df.withColumn(out, surt_col(F.col(col)))
