"""Graph accessors over the canonical triple store.

The reference stops at parse/serialize; a usable KG store needs the basic
read patterns, expressed as plain Catalyst plans so pruning/broadcast
apply:

* ``type_histogram``   — entity counts per rdf:type (one hash agg)
* ``property_table``   — subject × chosen predicates pivot (conditional
  aggregation, no Python)
* ``k_hop_neighbors``  — BFS frontier expansion via iterative self-join
  (frontier broadcast when small)
* ``describe``         — all triples where the IRI is subject or object
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_spark.terms import RDF_TYPE


def type_histogram(triples: DataFrame) -> DataFrame:
    return (
        triples.filter(F.col("p") == RDF_TYPE)
        .groupBy(F.col("o").alias("type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def property_table(triples: DataFrame, predicates: dict[str, str]) -> DataFrame:
    """Pivot selected predicates into columns: one row per subject.

    ``predicates`` maps output column name → predicate IRI.  Compiles to a
    single partial+final hash aggregate (max of conditional projections);
    multi-valued predicates keep the max lexical value — use
    ``F.collect_set`` variants for set semantics.
    """
    wanted = list(predicates.items())
    aggs = [
        F.max(F.when(F.col("p") == iri, F.col("o"))).alias(name)
        for name, iri in wanted
    ]
    return (
        triples.filter(F.col("p").isin([iri for _, iri in wanted]))
        .groupBy("s")
        .agg(*aggs)
    )


def k_hop_neighbors(triples: DataFrame, start_iris: list[str], k: int = 2) -> DataFrame:
    """IRIs/blanks reachable from ``start_iris`` in ≤ k forward hops.

    Iterative frontier expansion: each hop is one equi-join of the edge
    set against the (small, broadcast) frontier; visited set accumulates
    driver-side per hop — the pattern scales while frontiers stay
    broadcastable (use GraphFrames-style iterate-to-fixpoint otherwise).
    """
    edges = triples.filter(F.col("o_kind") != 2).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    spark = triples.sparkSession
    frontier = spark.createDataFrame([(i,) for i in start_iris], "node string")
    visited = frontier
    for _ in range(k):
        nxt = (
            edges.join(F.broadcast(frontier), edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = nxt.join(visited, "node", "left_anti")
        visited = visited.unionByName(frontier).distinct()
    return visited


def describe(triples: DataFrame, iri: str) -> DataFrame:
    return triples.filter((F.col("s") == iri) | (F.col("o") == iri))
