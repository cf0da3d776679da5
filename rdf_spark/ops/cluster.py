"""Distributed k-means over embedding columns (graft addition — no
reference analogue; the reference stops at parse/serialize,
rdf.go:14-22, while a 100 TB corpus pipeline clusters embeddings for
topic balancing, mixture weighting, and IVF coarse quantizers).

Scale shape — the textbook Spark k-means: centroids are tiny (k × dim
doubles) and live in the ASSIGNMENT EXPRESSION (k row-local distance
computations over the vector column, no explode, no join), so each
Lloyd iteration is one narrow scan plus one map-side-combinable
aggregation (posexplode → per-(cluster, dim) partial sums); only
k × dim aggregated cells ever cross the shuffle, and the new centroids
come back to the driver (k × dim values — bytes, not data).  The
existing IVF path (ops/ann.py) remains the coarse-quantizer choice for
LARGE k — the expression-based assignment here targets moderate k
(≤ ~64), where whole-stage codegen keeps it JVM-tight.

Reproducible numerics (CLAUDE.md round-3 pattern): squared per-dim
differences are computed in IEEE double (identical in every engine),
pre-rounded at 12 dp, and summed as DECIMAL(38,12) — distances are
order-independent and bit-exact, so argmin (ties → lowest cluster id)
replays verbatim in a SQL oracle; centroid updates sum pre-rounded
coordinates the same way and divide as doubles.  Initialization is the
k lowest-id vectors — deterministic and replayable (swap in k-means||
sampling upstream when statistical quality matters more than replay).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: decimal type for order-independent distance / coordinate sums
_DEC = "decimal(38,12)"


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Exact decimal squared distance of ``vec`` (float/double array) to
    a constant centroid: per-dim (x-c)^2 in IEEE double, rounded 12 dp,
    summed as decimal (the fold re-casts each step — decimal + decimal
    widens the scale and F.aggregate rejects the drift)."""
    carr = F.array(*[F.lit(float(c)).cast("double") for c in centroid])
    terms = F.zip_with(
        vec, carr,
        lambda x, c: F.round(
            (x.cast("double") - c) * (x.cast("double") - c), 12
        ).cast(_DEC),
    )
    return F.aggregate(
        terms,
        F.lit(0).cast(_DEC),
        lambda acc, t: (acc + t).cast(_DEC),
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``cluster`` column: argmin squared distance over
    ``centroids`` (ties → lowest cluster index).  Pure row-local
    JVM expression — k distance folds per row, zero shuffle."""
    if not centroids:
        raise ValueError("need at least one centroid")
    vec = F.col(vec_col)
    pairs = F.array(*[
        F.struct(
            _sq_dist(vec, c).alias("d"),
            F.lit(i).alias("cl"),
        )
        for i, c in enumerate(centroids)
    ])
    return df.withColumn("cluster", F.array_min(pairs)["cl"])


def _update_centroids(
    assigned: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
) -> list[list[float]]:
    """New centroid = per-dim mean of the cluster's vectors (pre-rounded
    decimal sums / double division).  An EMPTY cluster keeps its old
    centroid (deterministic; the oracle replicates via coalesce)."""
    dim = len(centroids[0])
    cells = (
        assigned.select(
            "cluster", F.posexplode(F.col(vec_col)).alias("pos", "x")
        )
        .groupBy("cluster", "pos")
        .agg(
            F.sum(
                F.round(F.col("x").cast("double"), 12).cast(_DEC)
            ).alias("sx"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    out = [list(c) for c in centroids]
    for r in cells:
        out[r["cluster"]][r["pos"]] = float(r["sx"]) / r["n"]
    return out


def kmeans(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd k-means: ``n_iter`` assignment/update rounds from the
    deterministic lowest-id initialization.

    Returns ``(assignments, centroids)`` — assignments is
    ``(id_col, cluster)`` under the FINAL centroids; centroids is the
    k × dim python list (bytes — feed it to :func:`assign_clusters`
    to score new data without refitting).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    base = df.filter(F.col(vec_col).isNotNull())
    seeds = base.orderBy(F.col(id_col)).limit(k).collect()
    if len(seeds) < k:
        raise ValueError(f"need >= {k} vectors, got {len(seeds)}")
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]
    for it in range(n_iter):
        assigned = assign_clusters(base, centroids, vec_col=vec_col)
        if it < n_iter - 1:
            centroids = _update_centroids(assigned, centroids, vec_col)
    return (
        assigned.select(F.col(id_col), "cluster"),
        centroids,
    )
