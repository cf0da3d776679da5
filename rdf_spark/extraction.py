"""Extraction stages: html → text (byte-identical invariant), embedded-RDF
block extraction, mention detection, entity-link scoring (SURVEY.md §2.6).

All text work is vectorized pandas string ops inside ``mapInPandas`` /
JVM regex columns — no per-row Python (BASELINE.json input_hint mandate).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCRIPT_RE = re.compile(r"<script\b[^>]*>.*?</script>", re.S | re.I)
_STYLE_RE = re.compile(r"<style\b[^>]*>.*?</style>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_TTL_BLOCK_RE = re.compile(
    r'<script\s+type="text/turtle"\s*>(.*?)</script>', re.S | re.I
)


def extract_text(html: bytes | str) -> str:
    """THE reference text extractor: drop script/style blocks, strip tags,
    collapse whitespace, trim.  Deterministic and pure — the per-url
    byte-identical invariant (BASELINE.json:15) is against this function.
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", html)
    s = _STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    return _WS_RE.sub(" ", s).strip()


def extract_turtle_blocks(html: bytes | str) -> str:
    """Concatenate all embedded ``<script type="text/turtle">`` blocks."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    return "\n".join(m.group(1) for m in _TTL_BLOCK_RE.finditer(html))


def extract_stage(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) → + extracted_text, rdf_text columns.

    Narrow stage (no shuffle); vectorized via pandas ``str`` ops over
    Arrow batches.
    """
    out_ddl = "url string, extracted_text string, rdf_text string"

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            html = pdf["html"].map(
                lambda b: bytes(b).decode("utf-8", errors="replace") if b is not None else ""
            )
            no_script = html.str.replace(_SCRIPT_RE, " ", regex=True)
            no_style = no_script.str.replace(_STYLE_RE, " ", regex=True)
            no_tags = no_style.str.replace(_TAG_RE, " ", regex=True)
            text = no_tags.str.replace(_WS_RE, " ", regex=True).str.strip()
            rdf = html.str.extractall(_TTL_BLOCK_RE)[0].groupby(level=0).agg("\n".join)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "extracted_text": text,
                    "rdf_text": rdf.reindex(pdf.index).fillna(""),
                }
            )

    return pages.mapInPandas(run, out_ddl)


def detect_mentions(text_df: DataFrame, aliases: DataFrame,
                    text_col: str = "extracted_text") -> DataFrame:
    """Candidate mention detection: count occurrences of every gazetteer
    surface per document → (url, surface, n_hits).

    The gazetteer is broadcast into the UDF closure once per executor; the
    scan is one compiled alternation regex over the batch (vectorized
    ``str.extractall``), not a per-surface loop.
    """
    surfaces = [r.surface for r in aliases.select("surface").distinct().collect()]
    # longest-first alternation so overlapping surfaces prefer the longest match
    surfaces.sort(key=len, reverse=True)
    pattern = re.compile("(" + "|".join(re.escape(s) for s in surfaces) + ")")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hits = pdf[text_col].str.extractall(pattern)
            if len(hits) == 0:
                yield pd.DataFrame({"url": [], "surface": [], "n_hits": []})
                continue
            hits = hits.rename(columns={0: "surface"}).reset_index(level=1, drop=True)
            hits["url"] = pdf["url"].reindex(hits.index)
            agg = hits.groupby(["url", "surface"], sort=False).size().reset_index(name="n_hits")
            yield agg[["url", "surface", "n_hits"]]

    return text_df.mapInPandas(run, "url string, surface string, n_hits long")


def link_entities(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """Entity-link scoring: mention × candidate → best entity per
    (url, surface).

    Broadcast hash join (alias dictionaries are small — SURVEY.md §2.5
    joins row); score = prior * log1p(hits); deterministic top-1 via a
    window ordered by (score desc, entity_iri) so ties break stably.
    """
    scored = mentions.join(F.broadcast(aliases), "surface").withColumn(
        "score", F.col("prior") * F.log1p(F.col("n_hits"))
    )
    w = Window.partitionBy("url", "surface").orderBy(
        F.desc("score"), F.asc("entity_iri")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .drop("rank")
    )


def emit_link_triples(links: DataFrame,
                      predicate: str = "http://kg.example/vocab#mentions") -> DataFrame:
    """Linked entities → canonical triple rows (pure projection)."""
    return links.select(
        F.col("url").alias("s"),
        F.lit(1).cast("tinyint").alias("s_kind"),
        F.lit(predicate).alias("p"),
        F.col("entity_iri").alias("o"),
        F.lit(1).cast("tinyint").alias("o_kind"),
        F.lit(None).cast("string").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.col("url"),
    )
