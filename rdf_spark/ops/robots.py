"""robots.txt politeness gate (RFC 9309 Robots Exclusion Protocol).

A crawl→KG pipeline must not process pages the publisher excluded:
``robots_filter`` tags every page with ``crawl_allowed`` by evaluating
the page's host's robots.txt rules — RFC 9309 semantics: most-specific
user-agent group selection, longest-match rule precedence (the
PATTERN's literal length, wildcards counted as written), Allow wins
ties, ``*`` and end-anchor ``$`` wildcards, no matching rule (or no
robots.txt at all) → allowed.

Scale shape: robots bodies are parsed once into per-host rule rows
(Arrow-batched ``mapInPandas`` — a robots.txt is one small text per
host).  Pages join rules on host — at web scale both sides are large
but the join key (host) is exactly the crawl's natural partitioning,
and rules-per-host is small (~10), so the joined pair stream is O(10×)
pages rows of (path, pattern) — map-side after AQE picks its strategy.
Pattern matching is a vectorized Pandas UDF with a per-batch compiled-
regex cache (patterns repeat massively within a host); the
longest-match/allow-wins-ties decision is a pure JVM
``max(struct(match_len, allow))`` aggregation — no driver state, no
collect, no broadcast of the (potentially 10^7-host) rule table.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^#]*)"


def parse_robots_body(body: str, agent: str = "*") -> list[tuple[bool, str]]:
    """(allow, pattern) rules of the most specific user-agent group.

    RFC 9309 group selection: the group whose ``User-agent`` token is
    the LONGEST case-insensitive prefix of ``agent`` wins; the ``*``
    group is the fallback.  Stacked ``User-agent`` lines share the
    following rule block.  Unknown directives are ignored; an empty
    ``Disallow:`` is a no-op (allow all).
    """
    agent = agent.lower()
    groups: dict[str, list[tuple[bool, str]]] = {}
    cur_tokens: list[str] = []
    last_was_agent = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not last_was_agent:
                cur_tokens = []
            tok = val.lower()
            cur_tokens.append(tok)
            groups.setdefault(tok, [])
            last_was_agent = True
        elif key in ("allow", "disallow"):
            last_was_agent = False
            if not val:
                continue
            for tok in cur_tokens:
                groups.setdefault(tok, []).append((key == "allow", val))
        else:
            last_was_agent = False
    best = None
    for tok in groups:
        if tok != "*" and agent.startswith(tok):
            if best is None or len(tok) > len(best):
                best = tok
    if best is not None:
        return groups[best]
    return groups.get("*", [])


def robots_crawl_delays(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """``(host, crawl_delay)`` seconds for ``agent`` — the politeness
    budget a fetch scheduler joins against its frontier.  Group
    selection follows :func:`parse_robots_body`; hosts without a
    Crawl-delay emit nothing (scheduler default applies)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hosts, delays = [], []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                if body is None:
                    continue
                if isinstance(body, (bytes, bytearray, memoryview)):
                    body = bytes(body).decode("utf-8", errors="replace")
                d = _crawl_delay(str(body), agent)
                if d is not None:
                    hosts.append("" if host is None else str(host).lower())
                    delays.append(d)
            yield pd.DataFrame({"host": hosts, "crawl_delay": delays})

    return robots.mapInPandas(run, "host string, crawl_delay double")


def _crawl_delay(body: str, agent: str) -> float | None:
    agent = agent.lower()
    groups: dict[str, float] = {}
    cur_tokens: list[str] = []
    last_was_agent = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not last_was_agent:
                cur_tokens = []
            cur_tokens.append(val.lower())
            last_was_agent = True
        else:
            last_was_agent = False
            if key == "crawl-delay":
                try:
                    d = float(val)
                except ValueError:
                    continue
                for tok in cur_tokens:
                    groups.setdefault(tok, d)
    best = None
    for tok in groups:
        if tok != "*" and agent.startswith(tok):
            if best is None or len(tok) > len(best):
                best = tok
    if best is not None:
        return groups[best]
    return groups.get("*")


def robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """``(host, sitemap_url)`` per ``Sitemap:`` line (RFC 9309 §2.3 —
    group-independent, so no agent parameter).  Feed the urls to
    :func:`rdf_spark.sitemap.parse_sitemaps` to seed the frontier."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hosts, urls = [], []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                if body is None:
                    continue
                if isinstance(body, (bytes, bytearray, memoryview)):
                    body = bytes(body).decode("utf-8", errors="replace")
                for raw in str(body).splitlines():
                    line = raw.split("#", 1)[0].strip()
                    key, _, val = line.partition(":")
                    if key.strip().lower() == "sitemap" and val.strip():
                        hosts.append("" if host is None else str(host).lower())
                        urls.append(val.strip())
            yield pd.DataFrame({"host": hosts, "sitemap_url": urls})

    return robots.mapInPandas(run, "host string, sitemap_url string")


def _pattern_re(pattern: str) -> re.Pattern:
    anchored_end = pattern.endswith("$")
    if anchored_end:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    return re.compile("^" + ".*".join(parts) + ("$" if anchored_end else ""))


def robots_rules(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """One row per applicable rule: ``(host, allow, pattern)``.

    Hosts whose robots.txt yields no rules for ``agent`` emit nothing —
    the page join-miss then means "allowed", which is also the correct
    default for hosts with no robots.txt at all.
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hosts, allows, pats = [], [], []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                if body is None:
                    continue
                if isinstance(body, (bytes, bytearray, memoryview)):
                    body = bytes(body).decode("utf-8", errors="replace")
                for allow, pattern in parse_robots_body(str(body), agent):
                    hosts.append("" if host is None else str(host).lower())
                    allows.append(allow)
                    pats.append(pattern)
            yield pd.DataFrame({"host": hosts, "allow": allows, "pattern": pats})

    return robots.mapInPandas(run, "host string, allow boolean, pattern string")


def _match_len_fn(pattern: pd.Series, path: pd.Series) -> pd.Series:
    """Per batch: group rows by rule pattern (a handful of distinct
    patterns per batch) and run each compiled regex once over the whole
    group via pandas' vectorized str.match, instead of a per-row Python
    loop."""
    import numpy as np

    n = len(pattern)
    out = np.full(n, -1, dtype="int32")
    if n:
        pats = pattern.to_numpy(dtype=object)
        paths = path.to_numpy(dtype=object)
        base = np.array([
            i for i in range(n) if pats[i] is not None and paths[i] is not None
        ], dtype="int64")
        if len(base):
            sub = pd.Series(paths[base])
            for pat, idx in sub.groupby(pats[base], sort=False).indices.items():
                hit = (
                    sub.iloc[idx].str.match(_pattern_re(pat))
                    .to_numpy(dtype=bool)
                )
                out[base[idx][hit]] = len(pat)
    return pd.Series(out, dtype="int32")


def robots_filter(
    pages: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    keep_denied: bool = True,
) -> DataFrame:
    """``pages`` + a ``crawl_allowed`` boolean (RFC 9309 decision for
    ``agent``); with ``keep_denied=False`` denied rows are dropped.

    ``robots`` is ``(host, body)`` — one robots.txt per host (missing
    hosts default to allowed).  The decision is computed per distinct
    (host, path) pattern-match and joined back on the url, so page
    payload columns never ride through the rule join.
    """
    from pyspark.sql.types import IntegerType

    _match_len = pandas_udf(_match_len_fn, IntegerType())
    rules = robots_rules(robots, agent)
    url = F.col(url_col)
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    keyed = pages.select(url.alias("_rurl"), host.alias("_rhost"), path.alias("_rpath")).distinct()
    joined = keyed.join(rules, keyed["_rhost"] == rules["host"], "left")
    scored = joined.select(
        "_rurl",
        F.struct(
            _match_len(F.col("pattern"), F.col("_rpath")).alias("mlen"),
            F.col("allow").cast("int").alias("allow"),
        ).alias("m"),
    )
    decision = scored.groupBy("_rurl").agg(F.max("m").alias("best"))
    decision = decision.select(
        "_rurl",
        (
            F.col("best").isNull()
            | (F.col("best.mlen") < 0)
            | (F.col("best.allow") == 1)
        ).alias("crawl_allowed"),
    )
    out = pages.join(
        decision, pages[url_col] == decision["_rurl"], "left"
    ).drop("_rurl")
    out = out.withColumn(
        "crawl_allowed", F.coalesce(F.col("crawl_allowed"), F.lit(True))
    )
    if not keep_denied:
        out = out.filter(F.col("crawl_allowed")).drop("crawl_allowed")
    return out
