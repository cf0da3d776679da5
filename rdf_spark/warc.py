"""WARC (Web ARChive, ISO 28500) source reader.

The reference engine has no WARC support (its sources are RDF syntaxes,
/root/reference/nt.go, ttl.go); this module is one of the beyond-parity
web-corpus sources a crawl→KG pipeline needs — crawl snapshots ship as
WARC segments, and the response payloads are exactly the ``pages(url,
html)`` input the extraction pipeline (rdf_spark.extraction) consumes.

Spark-first design, sized for a 100 TB crawl:

* WARC files are NOT splittable — records are CRLF-framed with a
  byte-exact ``Content-Length``, and ``.warc.gz`` files are a stream of
  per-record gzip members.  The unit of parallelism is therefore the
  FILE: ``spark.read.format("binaryFile")`` yields one (path, content)
  row per file and :func:`parse_warc` explodes each into records inside
  ``mapInPandas``.  Real crawls ship as ~1 GB segments, so a 100 TB
  snapshot is ~10^5 files — ample parallelism with zero shuffle; the
  whole read is a narrow stage.
* Record parsing is pure byte arithmetic (find header terminator, slurp
  ``Content-Length`` bytes) — no regex over payloads, no copy of the
  payload until the final slice.
* ``errors="quarantine"`` keeps an ``err`` column per FILE (null on
  success) so one truncated segment cannot kill the job, matching the
  sources.py convention; ``errors="strict"`` raises.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class WarcError(ValueError):
    """Malformed WARC input (bad version line, truncated record, ...)."""


_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream — .warc.gz files
    are one gzip member per record, which ``gzip.GzipFile`` over a
    BytesIO reads end-to-end."""
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as fh:
        try:
            return fh.read()
        except (EOFError, OSError) as e:
            raise WarcError(f"bad gzip stream: {e}") from e


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield ``(headers, payload)`` per record from raw WARC bytes.

    ``headers`` maps lower-cased field names to values, with the WARC
    version kept under ``"warc-version"``.  Header line folding
    (continuation lines starting with space/tab, ISO 28500 §4) is
    unfolded.  Gzip input (single- or multi-member) is transparently
    decompressed.  Raises :class:`WarcError` on structural damage.
    """
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data)
    pos, n = 0, len(data)
    while pos < n:
        while data[pos : pos + 2] == b"\r\n":  # inter-record CRLFs
            pos += 2
        if pos >= n:
            return
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise WarcError(f"truncated record header at byte {pos}")
        lines = data[pos:hdr_end].decode("utf-8", errors="replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise WarcError(f"bad version line {lines[0][:40]!r} at byte {pos}")
        headers: dict[str, str] = {"warc-version": lines[0][5:]}
        last_key = ""
        for ln in lines[1:]:
            if ln[:1] in (" ", "\t") and last_key:  # obs-fold continuation
                headers[last_key] += " " + ln.strip()
                continue
            key, sep, val = ln.partition(":")
            if not sep:
                raise WarcError(f"bad header line {ln[:40]!r} at byte {pos}")
            last_key = key.strip().lower()
            headers[last_key] = val.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise WarcError(f"bad Content-Length at byte {pos}: {e}") from e
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) < length:
            raise WarcError(
                f"truncated payload at byte {body_start}: "
                f"want {length}, have {len(payload)}"
            )
        yield headers, payload
        pos = body_start + length


def split_http_payload(
    payload: bytes,
) -> tuple[int | None, dict[str, str], bytes]:
    """Split an ``application/http`` record payload into ``(status,
    http_headers, body)``.  Non-HTTP payloads come back as
    ``(None, {}, payload)`` untouched."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, {}, payload
    lines = payload[:sep].decode("iso-8859-1").split("\r\n")
    parts = lines[0].split(None, 2)
    status: int | None = None
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    headers: dict[str, str] = {}
    last_key = ""
    for ln in lines[1:]:
        if ln[:1] in (" ", "\t") and last_key:
            headers[last_key] += " " + ln.strip()
            continue
        key, sep2, val = ln.partition(":")
        if sep2:
            last_key = key.strip().lower()
            headers[last_key] = val.strip()
    return status, headers, payload[sep + 4 :]


def _charset_of(content_type: str | None) -> str:
    if content_type:
        for part in content_type.split(";")[1:]:
            k, _, v = part.partition("=")
            if k.strip().lower() == "charset":
                return v.strip().strip('"').strip("'") or "utf-8"
    return "utf-8"


def decode_payload_text(body: bytes, content_type: str | None) -> str:
    """Decode a response body to text using the Content-Type charset
    (default utf-8), never raising — undecodable bytes become U+FFFD,
    unknown charset names fall back to utf-8."""
    charset = _charset_of(content_type)
    try:
        return body.decode(charset, errors="replace")
    except LookupError:
        return body.decode("utf-8", errors="replace")


WARC_DDL = (
    "path string, record_id string, warc_type string, warc_date string, "
    "target_uri string, content_type string, http_status int, "
    "http_content_type string, content binary, text string, err string"
)
_WARC_COLS = [f.split()[0] for f in WARC_DDL.split(", ")]


def _warc_parser(content_col: str, path_col: str, types: tuple[str, ...] | None,
                 strict: bool, want_text: bool):
    type_set = frozenset(t.lower() for t in types) if types else None

    def parse_files(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            recs: list[tuple] = []
            for path, blob in zip(pdf[path_col].astype(str), pdf[content_col]):
                if blob is None:
                    continue
                try:
                    for hdrs, payload in iter_warc_records(bytes(blob)):
                        wtype = hdrs.get("warc-type", "").lower()
                        if type_set is not None and wtype not in type_set:
                            continue
                        status, http_hdrs, body = split_http_payload(payload)
                        http_ct = http_hdrs.get("content-type")
                        text = (
                            decode_payload_text(body, http_ct)
                            if want_text else None
                        )
                        recs.append((
                            path,
                            hdrs.get("warc-record-id"),
                            wtype or None,
                            hdrs.get("warc-date"),
                            hdrs.get("warc-target-uri"),
                            hdrs.get("content-type"),
                            status,
                            http_ct,
                            body,
                            text,
                            None,
                        ))
                except WarcError as e:
                    if strict:
                        raise
                    recs.append((path,) + (None,) * 9 + (str(e),))
            yield pd.DataFrame(recs, columns=_WARC_COLS)

    return parse_files


def parse_warc(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    types: tuple[str, ...] | None = ("response",),
    errors: str = "quarantine",
    want_text: bool = True,
) -> DataFrame:
    """Explode a DataFrame of whole WARC files (``content`` binary
    column) into one row per record (schema :data:`WARC_DDL`).  Narrow —
    no shuffle; type filtering happens inside the parser so skipped
    records (request/metadata/warcinfo) never materialize."""
    return df.mapInPandas(
        _warc_parser(content_col, path_col, types, errors == "strict", want_text),
        WARC_DDL,
    )


def read_warc(
    spark: SparkSession,
    path: str,
    types: tuple[str, ...] | None = ("response",),
    errors: str = "quarantine",
    want_text: bool = True,
) -> DataFrame:
    """Read ``.warc`` / ``.warc.gz`` file(s) into one row per record.

    One task per file (``binaryFile`` source — WARC is unsplittable, see
    module docstring); partition count tracks file count, which is the
    natural crawl-segment granularity."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return parse_warc(files, types=types, errors=errors, want_text=want_text)


def read_wet(
    spark: SparkSession,
    path: str,
    errors: str = "quarantine",
) -> DataFrame:
    """Read WET file(s) — Common Crawl's extracted-text sidecar format:
    a WARC stream whose content records are ``WARC-Type: conversion``
    with a ``text/plain`` payload (the page text, no HTTP envelope, no
    markup).  Same one-task-per-file narrow plan as :func:`read_warc`;
    the type filter drops the leading warcinfo record inside the
    parser.  BASELINE.json's throughput metric is defined over exactly
    this input ("a Common-Crawl WET shard")."""
    return read_warc(spark, path, types=("conversion",), errors=errors)


def pages_from_wet(records: DataFrame) -> DataFrame:
    """Adapt :func:`read_wet` output to the pipeline's ``pages(url,
    warc_ts, html, text, lang)`` contract: WET payloads ARE the
    extracted text, so ``text`` is filled and ``html`` is null — the
    extraction stage (rdf_spark.extraction) passes such rows' ``text``
    through verbatim and the byte-identical invariant holds trivially.
    Narrow — no shuffle."""
    return records.filter(
        F.col("err").isNull() & F.col("target_uri").isNotNull()
    ).select(
        F.col("target_uri").alias("url"),
        F.try_to_timestamp(F.col("warc_date")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def pages_from_warc(records: DataFrame) -> DataFrame:
    """Adapt :func:`parse_warc` / :func:`read_warc` output to the KG
    pipeline's ``pages(url, warc_ts, html, text, lang)`` contract
    (rdf_spark.pipeline.run_pipeline), so a crawl snapshot feeds the
    extraction stage directly: ``run_pipeline(spark,
    pages_from_warc(read_warc(spark, segs)), aliases, out)``.

    Quarantined files and records without a target URI are dropped here
    (they carry no page).  ``text`` and ``lang`` are left null: the
    pages contract's ``text`` is a REFERENCE extraction (the pipeline's
    byte-identical invariant checks it against its own extractor when
    present), and a crawl ships raw HTML only — the extractor and the
    lang-ID operator (ops.text.lang_id) fill both downstream.  Narrow —
    no shuffle."""
    return records.filter(
        F.col("err").isNull() & F.col("target_uri").isNotNull()
    ).select(
        F.col("target_uri").alias("url"),
        F.try_to_timestamp(F.col("warc_date")).alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def encode_warc_record(
    headers: dict[str, str],
    payload: bytes,
    version: str = "1.0",
) -> bytes:
    """Serialize one WARC record (deterministic header order: WARC-Type,
    WARC-Record-ID, WARC-Date, WARC-Target-URI, Content-Type first, then
    the rest sorted).  Content-Length is computed, never trusted."""
    first = ("WARC-Type", "WARC-Record-ID", "WARC-Date", "WARC-Target-URI",
             "Content-Type")
    by_lower = {k.lower(): (k, v) for k, v in headers.items()}
    by_lower.pop("content-length", None)
    out = [f"WARC/{version}".encode()]
    for name in first:
        kv = by_lower.pop(name.lower(), None)
        if kv is not None:
            out.append(f"{name}: {kv[1]}".encode())
    for k in sorted(by_lower):
        name, val = by_lower[k]
        out.append(f"{name}: {val}".encode())
    out.append(f"Content-Length: {len(payload)}".encode())
    return b"\r\n".join(out) + b"\r\n\r\n" + payload + b"\r\n\r\n"


# ---------------------------------------------------------------------------
# WAT — Common Crawl's metadata sidecar (WARC-Type: metadata records
# whose payload is one JSON "Envelope" per crawled page)
# ---------------------------------------------------------------------------

# targeted read schema: from_json prunes everything else at parse time,
# so the JVM never materializes the (large) header/metrics sub-objects
WAT_ENVELOPE_DDL = (
    "Envelope STRUCT<`Payload-Metadata`: STRUCT<"
    "`HTTP-Response-Metadata`: STRUCT<`HTML-Metadata`: STRUCT<"
    "Links: ARRAY<STRUCT<path: STRING, url: STRING, text: STRING>>, "
    "Head: STRUCT<Title: STRING>>>>>"
)


def read_wat(
    spark: SparkSession,
    path: str,
    errors: str = "quarantine",
) -> DataFrame:
    """Read WAT file(s) — Common Crawl's per-page metadata sidecar: a
    WARC stream of ``WARC-Type: metadata`` records whose payload is a
    JSON envelope (links, head metadata, HTTP metrics) for one crawled
    page.  Same one-task-per-file narrow plan as :func:`read_warc`."""
    return read_warc(spark, path, types=("metadata",), errors=errors)


def wat_links(
    records: DataFrame,
    url_col: str = "target_uri",
    json_col: str = "text",
    resolve: bool = True,
) -> DataFrame:
    """Outlinks from WAT envelopes: one row per ``HTML-Metadata.Links``
    entry — ``(url, href, anchor, link_path)``.

    This is how the real Common-Crawl host/page link graphs are built:
    the WAT sidecar already carries every page's outlinks, so the
    100 TB *response* corpus never has to be re-parsed.  JVM-side
    ``from_json`` with a pruned schema (no Python in the loop), then
    ``explode`` — records whose JSON is malformed or that carry no
    links produce no rows (``explode`` drops null/empty arrays), which
    is the right default for graph building; count them upstream via
    the reader's ``err`` column if auditing.

    With ``resolve=True`` hrefs are resolved against the page URL by
    the same RFC-3986-lite rules as ops.html.extract_links and
    non-http(s) results dropped.  Feed the result straight to
    ops.html.host_link_graph / ops.graph.pagerank.  Zero shuffle.
    """
    from rdf_spark.ops.html import _resolve_bare

    env = F.from_json(F.col(json_col), WAT_ENVELOPE_DDL)
    links = (env["Envelope"]["Payload-Metadata"]
             ["HTTP-Response-Metadata"]["HTML-Metadata"]["Links"])
    out = (
        records.filter(F.col(url_col).isNotNull()
                       & F.col("err").isNull())
        .select(F.col(url_col).alias("url"), F.explode(links).alias("l"))
        .select("url", F.col("l.url").alias("href"),
                F.col("l.text").alias("anchor"),
                F.col("l.path").alias("link_path"))
        .filter(F.col("href").isNotNull())
    )
    if not resolve:
        return out
    bare = out.select(
        "url", "anchor", "link_path",
        F.regexp_replace("href", r"#.*$", "").alias("_bare"))
    return (
        bare.select(
            "url",
            _resolve_bare(F.col("url"), F.col("_bare")).alias("href"),
            "anchor", "link_path")
        .filter(F.col("href").rlike("^https?://"))
    )


def wat_page_titles(
    records: DataFrame,
    url_col: str = "target_uri",
    json_col: str = "text",
) -> DataFrame:
    """``(url, title)`` from WAT ``HTML-Metadata.Head.Title`` — the
    cheap page-metadata join key for anchor/title entity priors without
    touching the response corpus.  Pages without a parsed title are
    dropped.  Zero shuffle."""
    env = F.from_json(F.col(json_col), WAT_ENVELOPE_DDL)
    title = (env["Envelope"]["Payload-Metadata"]
             ["HTTP-Response-Metadata"]["HTML-Metadata"]["Head"]["Title"])
    return (
        records.filter(F.col(url_col).isNotNull()
                       & F.col("err").isNull())
        .select(F.col(url_col).alias("url"), title.alias("title"))
        .filter(F.col("title").isNotNull())
    )
