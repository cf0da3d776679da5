"""ops/graph.shortest_paths — distributed Bellman-Ford."""
import pytest
from pyspark.sql import functions as F

from rdf_spark.ops.graph import shortest_paths


def _edges(spark, triples):
    return spark.createDataFrame(
        triples, "src string, dst string, w long")


def _src(spark, *nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node string")


class TestShortestPaths:
    def test_weighted_beats_hop_count(self, spark):
        e = _edges(spark, [
            ("a", "b", 10), ("a", "c", 1), ("c", "b", 1), ("b", "d", 1),
        ])
        got = {r.node: r.dist for r in
               shortest_paths(e, _src(spark, "a"), weight_col="w").collect()}
        assert got == {"a": 0, "b": 2, "c": 1, "d": 3}

    def test_unit_weights_are_hops(self, spark):
        e = _edges(spark, [("a", "b", 99), ("b", "c", 99)])
        got = {r.node: r.dist for r in
               shortest_paths(e, _src(spark, "a")).collect()}
        assert got == {"a": 0, "b": 1, "c": 2}

    def test_unreachable_absent(self, spark):
        e = _edges(spark, [("a", "b", 1), ("x", "y", 1)])
        got = {r.node for r in
               shortest_paths(e, _src(spark, "a"), weight_col="w").collect()}
        assert got == {"a", "b"}

    def test_multi_source(self, spark):
        e = _edges(spark, [("a", "m", 5), ("b", "m", 2)])
        got = {r.node: r.dist for r in shortest_paths(
            e, _src(spark, "a", "b"), weight_col="w").collect()}
        assert got == {"a": 0, "b": 0, "m": 2}

    def test_cycle_converges(self, spark):
        e = _edges(spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)])
        got = {r.node: r.dist for r in
               shortest_paths(e, _src(spark, "a"), weight_col="w").collect()}
        assert got == {"a": 0, "b": 1, "c": 2}

    def test_negative_weight_rejected(self, spark):
        e = _edges(spark, [("a", "b", -1)])
        with pytest.raises(ValueError, match="negative"):
            shortest_paths(e, _src(spark, "a"), weight_col="w")

    def test_max_iter_raises_not_truncates(self, spark):
        e = _edges(spark, [(f"v{i}", f"v{i+1}", 1) for i in range(6)])
        with pytest.raises(ValueError, match="converge"):
            shortest_paths(
                e, _src(spark, "v0"), weight_col="w", max_iter=3)

    def test_zero_weight_edges(self, spark):
        e = _edges(spark, [("a", "b", 0), ("b", "c", 4)])
        got = {r.node: r.dist for r in
               shortest_paths(e, _src(spark, "a"), weight_col="w").collect()}
        assert got == {"a": 0, "b": 0, "c": 4}


def test_null_weight_rejected(spark):
    e = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", None)], "src string, dst string, w long")
    s = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError, match="non-null"):
        shortest_paths(e, s, weight_col="w")


def test_non_numeric_weight_rejected(spark):
    e = spark.createDataFrame(
        [("a", "b", "heavy")], "src string, dst string, w string")
    s = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError, match="non-null"):
        shortest_paths(e, s, weight_col="w")


def test_fractional_double_weight_rejected(spark):
    """Round-6 ADVICE fix: a fractional double weight used to be
    silently FLOORED by the bigint cast (0.5 -> 0) — now rejected."""
    e = spark.createDataFrame(
        [("a", "b", 0.5)], "src string, dst string, w double")
    with pytest.raises(ValueError, match="integral"):
        shortest_paths(e, _src(spark, "a"), weight_col="w")


def test_integral_double_weight_accepted(spark):
    e = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "c", 3.0)],
        "src string, dst string, w double")
    got = {r.node: r.dist for r in
           shortest_paths(e, _src(spark, "a"), weight_col="w").collect()}
    assert got == {"a": 0, "b": 2, "c": 5}


def test_decimal_weights_exact(spark):
    """Decimal-typed fractional weights sum exactly (the docstring's
    'fractional ones must be decimal-typed by the caller' promise)."""
    from decimal import Decimal

    e = spark.createDataFrame(
        [("a", "b", Decimal("0.50")), ("b", "c", Decimal("1.90")),
         ("a", "c", Decimal("2.50"))],
        "src string, dst string, w decimal(10,2)")
    out = shortest_paths(e, _src(spark, "a"), weight_col="w")
    got = {r.node: r.dist for r in out.collect()}
    assert got == {"a": Decimal("0.00"), "b": Decimal("0.50"),
                   "c": Decimal("2.40")}
