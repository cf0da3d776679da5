"""Triple precision/recall scoring (BASELINE.md headline metric).

The reference comparison basis is component-wise triple equality
(TriplesEqual, /root/reference/rdf.go:505-508); here both sides are
canonicalized to N-Triples lines (a total representation of all seven
term columns) and compared with set semantics via joins — the §2.5
"set ops via joins" row.  Works at any scale: two distinct-aggregates
plus one equi-join on the line hash.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_spark.encoders import nt_line_col


@dataclass
class PRScore:
    true_positives: int
    got: int
    expected: int

    @property
    def precision(self) -> float:
        return self.true_positives / self.got if self.got else 0.0

    @property
    def recall(self) -> float:
        return self.true_positives / self.expected if self.expected else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if p + r else 0.0


def _lines(df: DataFrame) -> DataFrame:
    return df.select(nt_line_col().alias("line")).dropDuplicates(["line"])


def pr_score(got: DataFrame, expected: DataFrame) -> PRScore:
    """Set precision/recall of ``got`` triples vs ``expected`` triples.

    Both inputs use the canonical triple schema; dedup happens here, so
    callers can pass raw parser output.
    """
    g = _lines(got)
    e = _lines(expected)
    counts = (
        g.withColumn("_g", F.lit(1))
        .join(e.withColumn("_e", F.lit(1)), "line", "full_outer")
        .agg(
            F.count(F.lit(1)).alias("union_n"),
            F.sum(F.when(F.col("_g").isNotNull() & F.col("_e").isNotNull(), 1).otherwise(0)).alias("tp"),
            F.sum(F.when(F.col("_g").isNotNull(), 1).otherwise(0)).alias("got_n"),
            F.sum(F.when(F.col("_e").isNotNull(), 1).otherwise(0)).alias("exp_n"),
        )
        .collect()[0]
    )
    return PRScore(counts.tp or 0, counts.got_n or 0, counts.exp_n or 0)


def diff_triples(got: DataFrame, expected: DataFrame):
    """(spurious, missing) line DataFrames for debugging a P/R shortfall."""
    g = _lines(got)
    e = _lines(expected)
    return g.join(e, "line", "left_anti"), e.join(g, "line", "left_anti")
