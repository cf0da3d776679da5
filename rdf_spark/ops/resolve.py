"""Entity resolution: blocked string-similarity matching of mention
surfaces against an entity catalog.

EXCEEDS reference parity (/root/reference stops at RDF syntax; its KG
pipeline counterpart is the gazetteer EXACT matcher in extraction.py) —
real mention streams carry typos, truncations and OCR noise, and the
standard production shape is: block → bounded candidate join → edit
similarity → per-surface top-k.  Everything here is JVM-side:

- **blocking**: equi-join on a cheap deterministic key (lowercased
  name prefix).  This is what makes the operator exist at 100 TB —
  the all-pairs comparison never happens; each block is a partition-
  local join.  Hot blocks are bounded by the length-band prune below.
- **length-band prune inside the join condition**: levenshtein(a,b) ≥
  |len(a)−len(b)|, so sim ≥ t implies |len(a)−len(b)| ≤ (1−t)·max(len).
  The band is part of the join predicate, so Catalyst evaluates it
  before the (expensive) edit-distance ever runs and the per-block
  fanout shrinks quadratically.
- **similarity**: 1 − levenshtein/greatest(len) over lowercased
  strings — Spark's built-in `levenshtein` (whole-stage codegen), and
  byte-for-byte the same formula DuckDB computes in the oracle.
- **top-k**: ROW_NUMBER over (surface) ordered by (sim DESC, id ASC) —
  deterministic, and Spark 4 compiles the rank filter to a map-side
  WindowGroupLimit so losing candidates never cross the shuffle.

Resolution is computed per DISTINCT surface (same surface ⇒ same
candidate set), so a skewed mention stream (the same hot surface 10^6
times) costs one resolution, not 10^6 — join the result back to the
mention stream on the surface column.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resolve_entities(
    surfaces: DataFrame,
    catalog: DataFrame,
    surface_col: str = "surface",
    name_col: str = "name",
    id_col: str = "entity_iri",
    block_len: int = 2,
    threshold: float = 0.75,
    topk: int = 1,
) -> DataFrame:
    """Resolve each distinct surface to its best catalog entities →
    ``(surface, entity_iri, matched_name, sim, rank)``.

    Candidates come only from the surface's block (shared lowercased
    ``block_len``-prefix) — the recall/IO tradeoff every blocking
    resolver makes; callers needing prefix-insensitive recall can union
    several block keys.  ``sim`` is rounded to 6 dp so cross-engine
    comparison is exact.
    """
    s = (
        surfaces.select(F.col(surface_col).alias("surface"))
        .filter(F.col("surface").isNotNull() & (F.col("surface") != ""))
        .distinct()
        .withColumn("_s_lc", F.lower(F.col("surface")))
        .withColumn("_s_blk", F.substring(F.col("_s_lc"), 1, block_len))
        .withColumn("_s_len", F.length("_s_lc"))
    )
    c = (
        catalog.select(
            F.col(id_col).alias("entity_iri"),
            F.col(name_col).alias("matched_name"),
        )
        .filter(F.col("matched_name").isNotNull() & (F.col("matched_name") != ""))
        .withColumn("_c_lc", F.lower(F.col("matched_name")))
        .withColumn("_c_blk", F.substring(F.col("_c_lc"), 1, block_len))
        .withColumn("_c_len", F.length("_c_lc"))
    )
    band = F.abs(F.col("_s_len") - F.col("_c_len")) <= (
        (1.0 - threshold) * F.greatest("_s_len", "_c_len")
    )
    joined = s.join(c, (F.col("_s_blk") == F.col("_c_blk")) & band)
    sim = F.round(
        F.lit(1.0)
        - F.levenshtein("_s_lc", "_c_lc")
        / F.greatest("_s_len", "_c_len"),
        6,
    )
    scored = joined.withColumn("sim", sim).filter(F.col("sim") >= threshold)
    w = Window.partitionBy("surface").orderBy(
        F.col("sim").desc(), F.col("entity_iri").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("surface", "entity_iri", "matched_name", "sim", "rank")
    )
