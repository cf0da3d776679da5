"""Approximate nearest-neighbor search over embedding columns.

* ``brute_force_topk`` — exact cosine top-k; the dot product is a pure
  JVM ``zip_with``/``aggregate`` expression (no Python), queries are
  broadcast, so the plan is scan → broadcast-join → window.  Correctness
  baseline and perfectly adequate when |queries| is small.
* ``lsh_topk`` — random-hyperplane (signed projection) LSH: signature in
  a narrow pandas stage, bucket-join candidates, exact rerank.  The scale
  path: candidate count ≈ n/2^bits per query instead of n.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def cosine_col(a, b):
    """Cosine similarity between two array<float/double> columns (JVM-side)."""
    num = _dot(a, b)
    den = F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, vec_id, sim, rank).

    ``queries(query_id, embedding)`` is broadcast; similarity is computed
    in whole-stage codegen; ties break on vec_id for determinism.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    e = embeddings.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_ev"))
    sim = F.round(cosine_col(F.col("_qv"), F.col("_ev")), 6)
    scored = e.crossJoin(F.broadcast(q)).select(
        query_id_col, id_col, sim.alias("sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_bits: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Sign-of-projection LSH signature (int bucket) per vector — one
    narrow numpy pass."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.random.RandomState(seed)
        planes = rng.randn(dim, n_bits)
        for pdf in it:
            mat = np.vstack(pdf[vec_col].map(np.asarray).to_numpy())
            bits = (mat @ planes) > 0
            buckets = bits @ (1 << np.arange(n_bits, dtype=np.int64))
            yield pd.DataFrame({id_col: pdf[id_col], "bucket": buckets})

    return df.mapInPandas(run, f"{id_col} long, bucket long")


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """LSH-bucketed ANN: only vectors sharing the query's hyperplane bucket
    are reranked exactly.  Recall < 1.0 by design; raise recall with
    multiple tables (union over seeds)."""
    e_sig = hyperplane_signatures(embeddings, dim, n_bits, id_col, vec_col, seed)
    q_sig = hyperplane_signatures(
        queries.withColumnRenamed(query_id_col, id_col), dim, n_bits, id_col, vec_col, seed
    ).withColumnRenamed(id_col, query_id_col)

    e = embeddings.join(e_sig, id_col).select(
        id_col, "bucket", F.col(vec_col).cast("array<double>").alias("_ev")
    )
    q = queries.join(q_sig, query_id_col).select(
        query_id_col, "bucket", F.col(vec_col).cast("array<double>").alias("_qv")
    )
    sim = F.round(cosine_col(F.col("_qv"), F.col("_ev")), 6)
    scored = e.join(F.broadcast(q), "bucket").select(query_id_col, id_col, sim.alias("sim"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_duplicates(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_bits: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via shared LSH bucket + exact verify."""
    sig = hyperplane_signatures(embeddings, dim, n_bits, id_col, vec_col, seed)
    e = embeddings.join(sig, id_col).select(
        F.col(id_col), "bucket", F.col(vec_col).cast("array<double>").alias("_v")
    )
    a = e.select(F.col(id_col).alias("a"), "bucket", F.col("_v").alias("_va"))
    b = e.select(F.col(id_col).alias("b"), "bucket", F.col("_v").alias("_vb"))
    pairs = a.join(b, "bucket").filter(F.col("a") < F.col("b"))
    sim = F.round(cosine_col(F.col("_va"), F.col("_vb")), 6)
    return (
        pairs.select("a", "b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
        .dropDuplicates(["a", "b"])
    )
