"""Hearst-pattern hyponymy extraction from raw text (graft addition —
no reference analogue; /root/reference parses serialized RDF only,
rdf.go:14-22, while a webtext KG pipeline must also PROPOSE taxonomy
triples from prose).  Implements the classic lexico-syntactic patterns
of Hearst, "Automatic Acquisition of Hyponyms from Large Text
Corpora", COLING 1992:

    NP such as NP, NP and NP        →  each listed NP isa leading NP
    such NP as NP, ...              →  each listed NP isa inner NP
    NP, NP and|or other NP          →  each listed NP isa trailing NP
    NP including NP, ...            →  each listed NP isa leading NP
    NP, especially NP, ...          →  each listed NP isa leading NP

Noun phrases are approximated by single capitalized tokens
(``[A-Z][a-z0-9]*``) — the honest no-dependency heuristic; a real
deployment swaps in an NP chunker upstream and feeds pre-tagged spans
through the same pattern logic.  The output is CANDIDATE pairs for a
downstream fusion/confidence stage (ops/fusion.py), not asserted fact.

Scale shape: the whole extraction is JVM-side ``regexp_extract_all``
projections (one narrow stage, whole-stage codegen, zero Python, zero
shuffle) — the per-pattern hypernym and list captures are aligned by
index (two same-pattern extract_alls zipped, the extract_anchor_texts
trick, ops/html.py) and exploded.  Every regex uses the Java/RE2
common subset (no backreferences, no lookaround) so a SQL oracle can
replay it verbatim if needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: single capitalized token — the NP approximation
_NP = r"[A-Z][a-z0-9]*"
#: comma list of NPs with an optional Oxford-free and/or tail
_LIST = rf"{_NP}(?:, {_NP})*(?:,? (?:and|or) {_NP})?"

#: (pattern_id, regex, hypernym group, hyponym-list group)
HEARST_PATTERNS: tuple[tuple[str, str, int, int], ...] = (
    ("such_as", rf"({_NP}) such as ({_LIST})", 1, 2),
    ("such_np_as", rf"[Ss]uch ({_NP}) as ({_LIST})", 1, 2),
    ("and_other", rf"({_LIST}),? (?:and|or) other ({_NP})", 2, 1),
    ("including", rf"({_NP}),? including ({_LIST})", 1, 2),
    ("especially", rf"({_NP}),? especially ({_LIST})", 1, 2),
)

#: splitter turning a matched NP list into its members
_LIST_SEP = r",? (?:and|or) |, "


def _pattern_matches(text: Column, name: str, pat: str,
                     hyper_grp: int, list_grp: int) -> Column:
    """Array of (pattern, hypernym, hypo_list) structs for one pattern.

    Java regex group extraction is deterministic left-to-right and
    non-overlapping, so extracting group ``hyper_grp`` and group
    ``list_grp`` in two passes yields index-aligned arrays."""
    hypers = F.regexp_extract_all(text, F.lit(pat), F.lit(hyper_grp))
    lists_ = F.regexp_extract_all(text, F.lit(pat), F.lit(list_grp))
    return F.zip_with(
        hypers,
        lists_,
        lambda h, l: F.struct(
            F.lit(name).alias("pattern"),
            h.alias("hypernym"),
            l.alias("hypo_list"),
        ),
    )


def hearst_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate hyponymy pairs: ``(doc_id, hyponym, hypernym,
    pattern)`` — one row per listed NP per pattern occurrence (bag
    semantics; a pair seen twice IS evidence twice — downstream fusion
    aggregates it).

    One narrow projection stage: all five patterns are evaluated into
    per-pattern struct arrays in a single select, concatenated, and
    exploded — documents without any match never leave the scan.
    """
    text = F.col(text_col)
    matches = F.concat(*[
        _pattern_matches(text, name, pat, hg, lg)
        for name, pat, hg, lg in HEARST_PATTERNS
    ])
    exploded = (
        docs.select(F.col(id_col).alias("doc_id"), matches.alias("_m"))
        .select("doc_id", F.explode("_m").alias("m"))
    )
    return (
        exploded.select(
            "doc_id",
            F.col("m.pattern").alias("pattern"),
            F.col("m.hypernym").alias("hypernym"),
            F.explode(
                F.split(F.col("m.hypo_list"), _LIST_SEP)
            ).alias("hyponym"),
        )
        .filter(F.col("hyponym") != "")
        .select("doc_id", "hyponym", "hypernym", "pattern")
    )


def hyponymy_triples(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    class_base: str = "urn:hearst:",
    min_support: int = 1,
) -> DataFrame:
    """Aggregated taxonomy candidates as canonical triple rows:
    ``(s, s_kind, p, o, o_kind, o_datatype, o_lang, support)`` with
    ``s/o`` minted under ``class_base`` and ``p`` =
    ``rdfs:subClassOf``, keeping pairs seen at least ``min_support``
    times across the corpus.  One hash aggregation over the extraction
    projection (map-side combinable — the hot pair reduces before the
    shuffle)."""
    from rdf_spark.terms import KIND_IRI
    from rdf_spark.ops.reasoning import RDFS_SUBCLASSOF

    pairs = hearst_candidates(docs, text_col=text_col, id_col=id_col)
    agg = (
        pairs.groupBy("hyponym", "hypernym")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= int(min_support))
    )
    return agg.select(
        F.concat(F.lit(class_base), F.col("hyponym")).alias("s"),
        F.lit(KIND_IRI).cast("tinyint").alias("s_kind"),
        F.lit(RDFS_SUBCLASSOF).alias("p"),
        F.concat(F.lit(class_base), F.col("hypernym")).alias("o"),
        F.lit(KIND_IRI).cast("tinyint").alias("o_kind"),
        F.lit(None).cast("string").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
        "support",
    )
