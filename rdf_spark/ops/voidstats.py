"""VoID dataset statistics (https://www.w3.org/TR/void/) over the
canonical triple schema (graft addition — no reference analogue; the
reference stops at parse/serialize, but any published KG ships a VoID
description: void:triples, void:distinctSubjects, void:properties,
void:classPartition, void:propertyPartition).

Scale notes (100 TB):

- ``void_summary`` computes each distinct-count as its OWN two-phase
  HashAggregate (partial distinct map-side, final reduce) and combines
  the 1-row results with trivial cross joins — deliberately NOT one
  ``agg(countDistinct(a), countDistinct(b), ...)``, which Catalyst
  compiles to a single Expand that multiplies the scan ×k.  Each pass
  is scan-narrow (one column family) and map-side combinable.
- ``property_partition`` / ``class_partition`` pre-aggregate per key
  before any join; the per-predicate join inputs are already reduced to
  |distinct predicates| rows, so skew in triple counts per predicate
  never reaches a shuffle unreduced (the heavy lifting happens in the
  partial aggregates).
- At extreme cardinalities swap the exact distincts for
  ``approx_count_distinct`` (HLL) — same plan shape, bounded state;
  kept exact here because the oracle demands exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import terms

RDF_TYPE = terms.RDF_TYPE


def _one_count(df: DataFrame, alias: str) -> DataFrame:
    return df.agg(F.count(F.lit(1)).cast("long").alias(alias))


def void_summary(triples: DataFrame) -> DataFrame:
    """One-row VoID summary: triples, distinctSubjects, properties,
    distinctObjects, classes, entities (distinct IRIs in s or o
    position), literals.

    Input: canonical triple columns (s, s_kind, p, o, o_kind,
    o_datatype, o_lang); rows with a non-null ``err`` column should be
    filtered by the caller.
    """
    t = triples.select("s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang")
    n_triples = _one_count(t, "n_triples")
    d_subj = _one_count(t.select("s", "s_kind").distinct(), "distinct_subjects")
    d_pred = _one_count(t.select("p").distinct(), "properties")
    d_obj = _one_count(
        t.select("o", "o_kind", "o_datatype", "o_lang").distinct(),
        "distinct_objects",
    )
    classes = _one_count(
        t.filter((F.col("p") == RDF_TYPE) & (F.col("o_kind") == terms.KIND_IRI))
        .select("o").distinct(),
        "classes",
    )
    iri_s = t.filter(F.col("s_kind") == terms.KIND_IRI).select(F.col("s").alias("iri"))
    iri_o = t.filter(F.col("o_kind") == terms.KIND_IRI).select(F.col("o").alias("iri"))
    entities = _one_count(iri_s.union(iri_o).distinct(), "entities")
    literals = _one_count(
        t.filter(F.col("o_kind") == terms.KIND_LITERAL), "literals"
    )
    out = n_triples
    for part in (d_subj, d_pred, d_obj, classes, entities, literals):
        out = out.crossJoin(part)
    return out


def property_partition(triples: DataFrame) -> DataFrame:
    """void:propertyPartition — per predicate: triple count, distinct
    subjects, distinct objects.  Three independent pre-aggregations
    joined on the (already tiny) predicate key.
    """
    t = triples.select("s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang")
    n = t.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("triples"))
    ds = (
        t.select("p", "s", "s_kind").distinct()
        .groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("distinct_subjects"))
    )
    do = (
        t.select("p", "o", "o_kind", "o_datatype", "o_lang").distinct()
        .groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("distinct_objects"))
    )
    return n.join(ds, "p").join(do, "p")


def class_partition(triples: DataFrame) -> DataFrame:
    """void:classPartition — per class IRI: distinct typed entities."""
    typed = triples.filter(
        (F.col("p") == RDF_TYPE) & (F.col("o_kind") == terms.KIND_IRI)
    )
    return (
        typed.select(F.col("o").alias("class_iri"), "s", "s_kind").distinct()
        .groupBy("class_iri")
        .agg(F.count(F.lit(1)).cast("long").alias("entities"))
    )
