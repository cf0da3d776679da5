"""Binned interval-containment join (ops/temporal.py::range_join)."""
import pytest

from rdf_spark.ops.temporal import range_join


def _points(spark, rows):
    return spark.createDataFrame(rows, "k string, x double, pv string")


def _ivs(spark, rows):
    return spark.createDataFrame(rows, "k string, lo double, hi double, iv string")


def _got(df):
    return {(r.pv, r.iv) for r in df.collect()}


def _naive(prows, irows, keyed=True):
    out = set()
    for pk, x, pv in prows:
        if x is None:
            continue
        for ik, lo, hi, iv in irows:
            if lo is None or hi is None:
                continue
            if keyed and pk != ik:
                continue
            if lo <= x <= hi:
                out.add((pv, iv))
    return out


class TestRangeJoin:
    def test_basic_and_closed_bounds(self, spark):
        p = _points(spark, [("a", 5.0, "p1"), ("a", 10.0, "p2"),
                            ("a", 20.0, "p3"), ("b", 5.0, "p4")])
        i = _ivs(spark, [("a", 5.0, 10.0, "i1"), ("a", 9.0, 30.0, "i2"),
                         ("b", 6.0, 7.0, "i3")])
        got = _got(range_join(p, i, "x", "lo", "hi", on="k", bin_width=4.0))
        assert got == {("p1", "i1"), ("p2", "i1"), ("p2", "i2"),
                       ("p3", "i2")}

    def test_interval_spanning_many_bins(self, spark):
        p = _points(spark, [("a", 99.0, "p")])
        i = _ivs(spark, [("a", 1.0, 100.0, "wide")])
        got = _got(range_join(p, i, "x", "lo", "hi", on="k", bin_width=3.0))
        assert got == {("p", "wide")}

    def test_unkeyed(self, spark):
        p = _points(spark, [("a", 5.0, "p1"), ("b", 50.0, "p2")])
        i = _ivs(spark, [("zzz", 0.0, 10.0, "i1")])
        got = _got(range_join(p, i, "x", "lo", "hi", bin_width=8.0))
        assert got == {("p1", "i1")}

    def test_degenerate_and_null_rows(self, spark):
        p = _points(spark, [("a", 5.0, "p1"), ("a", None, "pnull")])
        i = _ivs(spark, [("a", 9.0, 2.0, "backwards"),
                         ("a", None, 9.0, "nulllo"),
                         ("a", 5.0, 5.0, "pointiv")])
        got = _got(range_join(p, i, "x", "lo", "hi", on="k", bin_width=2.0))
        assert got == {("p1", "pointiv")}

    def test_validates(self, spark):
        p = _points(spark, [("a", 1.0, "p")])
        i = _ivs(spark, [("a", 0.0, 2.0, "i")])
        with pytest.raises(ValueError):
            range_join(p, i, "x", "lo", "hi", bin_width=0)
        with pytest.raises(ValueError):
            range_join(p, i, "x", "lo", "hi", on="missing")

    def test_collision_suffix(self, spark):
        p = spark.createDataFrame([("a", 5.0, "pv")], "k string, x double, v string")
        i = spark.createDataFrame([("a", 0.0, 9.0, "ivv")],
                                  "k string, lo double, hi double, v string")
        row = range_join(p, i, "x", "lo", "hi", on="k").collect()[0]
        assert (row.v, row.v_r, row.lo, row.hi) == ("pv", "ivv", 0.0, 9.0)

    def test_plan_is_equi_join(self, spark):
        p = _points(spark, [("a", 5.0, "p")])
        i = _ivs(spark, [("a", 0.0, 9.0, "i")])
        plan = range_join(p, i, "x", "lo", "hi", on="k") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan, plan
        assert "Cartesian" not in plan, plan
        assert "HashJoin" in plan or "SortMergeJoin" in plan, plan

    @pytest.mark.parametrize("bin_width", [0.7, 3.0, 50.0])
    def test_matches_naive_and_bin_invariant(self, spark, bin_width):
        import random

        rng = random.Random(67)
        keys = ["k0", "k1"]
        prows = [(rng.choice(keys), float(rng.randrange(0, 60)), f"p{i}")
                 for i in range(40)]
        irows = []
        for i in range(20):
            lo = float(rng.randrange(0, 55))
            irows.append((rng.choice(keys), lo,
                          lo + float(rng.randrange(0, 12)), f"i{i}"))
        got = _got(range_join(_points(spark, prows), _ivs(spark, irows),
                              "x", "lo", "hi", on="k", bin_width=bin_width))
        assert got == _naive(prows, irows)
