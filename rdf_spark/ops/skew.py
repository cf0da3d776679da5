"""Skew-handling primitives (north_rule: domain-skewed URL partitions).

Spark's partial aggregation already collapses hot keys map-side for
algebraic aggregates; explicit salting is for the cases it can't help:
high-cardinality state per key (collect-like, exact distinct) and skewed
shuffle joins when one side can't be broadcast.  AQE skew-join splitting
is enabled session-wide (rdf_spark.session).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "part_salt") -> DataFrame:
    """Deterministic salt derived from the whole row's hash (not rand(),
    so retries/resume stay idempotent)."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_distinct_count(df: DataFrame, key: str, value: str, n_salts: int = 32) -> DataFrame:
    """Exact COUNT(DISTINCT value) GROUP BY key for skewed keys, two-phase:
    phase 1 dedups (key, value) within (key, salt) buckets, phase 2 merges.
    The hot key's state is spread over ``n_salts`` reducers instead of one.
    """
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)))
    phase1 = salted.groupBy(key, "_salt").agg(
        F.count_distinct(F.col(value)).alias("_partial")
    )
    return phase1.groupBy(key).agg(F.sum("_partial").alias("n_distinct"))


def skew_join(big: DataFrame, small: DataFrame, on: str, how: str = "inner") -> DataFrame:
    """Join with the small side broadcast when possible; callers with two
    big skewed sides rely on AQE skew-join splitting (enabled in session)
    plus an explicit repartition hint."""
    return big.join(F.broadcast(small), on, how)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Big×big equi-join where ``skewed`` has hot join keys and ``other``
    is too large to broadcast: the classic salt-and-replicate plan.

    Each skewed-side row gets a deterministic salt from its FULL row hash
    (identical retries land identically — resume-idempotent; note that
    byte-identical duplicate rows share a salt, so dedup first if the hot
    key is made of duplicates); the other side is replicated ``n_salts``×
    with one row per salt.  The shuffle key becomes (on, salt), spreading
    a hot key over ``n_salts`` reducers at the cost of replicating the
    other side — profitable when |other| · n_salts ≪ the hot key's row
    count.  AQE skew splitting handles moderate skew without this; reach
    for salting when single keys exceed what one task can hold.
    """
    # right/full outer are NOT salted-join-expressible: an unmatched
    # other-side row exists once per salt replica and would surface
    # n_salts times — reject instead of returning silently wrong rows
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r} "
            "(unmatched replicated rows would duplicate)"
        )
    for df, name in ((skewed, "skewed"), (other, "other")):
        if "_salt" in df.columns:
            raise ValueError(f"the {name} side already has a '_salt' column")
    salted = with_salt(skewed, n_salts, "_salt")
    replicated = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(replicated, [on, "_salt"], how).drop("_salt")
