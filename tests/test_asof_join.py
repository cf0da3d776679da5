"""Distributed as-of join (ops/temporal.py) vs pandas.merge_asof."""
import pandas as pd
import pytest

from rdf_spark.ops.temporal import asof_join


def _left(spark, rows):
    return spark.createDataFrame(rows, "k string, ts double, lv string")


def _right(spark, rows):
    return spark.createDataFrame(rows, "k string, ts double, rv string")


def _got(df):
    return {
        (r.k, r.ts, r.lv): (r.ts_r, r.rv)
        for r in df.collect()
    }


class TestAsofJoin:
    def test_backward_basic(self, spark):
        l = _left(spark, [("a", 1.0, "x"), ("a", 5.0, "y"), ("a", 0.5, "z"),
                          ("b", 3.0, "w")])
        r = _right(spark, [("a", 1.0, "r1"), ("a", 4.0, "r2"),
                           ("b", 9.0, "r3")])
        assert _got(asof_join(l, r, on="k")) == {
            ("a", 1.0, "x"): (1.0, "r1"),       # exact match allowed
            ("a", 5.0, "y"): (4.0, "r2"),
            ("a", 0.5, "z"): (None, None),      # before any snapshot
            ("b", 3.0, "w"): (None, None),      # snapshot only later
        }

    def test_forward(self, spark):
        l = _left(spark, [("a", 1.0, "x"), ("a", 5.0, "y")])
        r = _right(spark, [("a", 4.0, "r2"), ("a", 0.0, "r0")])
        assert _got(asof_join(l, r, on="k", direction="forward")) == {
            ("a", 1.0, "x"): (4.0, "r2"),
            ("a", 5.0, "y"): (None, None),
        }

    def test_allow_exact_false(self, spark):
        l = _left(spark, [("a", 1.0, "x")])
        r = _right(spark, [("a", 1.0, "r1"), ("a", 0.5, "r0")])
        got = _got(asof_join(l, r, on="k", allow_exact=False))
        assert got == {("a", 1.0, "x"): (0.5, "r0")}
        fwd = _got(asof_join(l, r, on="k", direction="forward",
                             allow_exact=False))
        assert fwd == {("a", 1.0, "x"): (None, None)}

    def test_tolerance(self, spark):
        l = _left(spark, [("a", 10.0, "x"), ("a", 11.0, "y")])
        r = _right(spark, [("a", 8.5, "r0")])
        got = _got(asof_join(l, r, on="k", tolerance=1.5))
        assert got == {("a", 10.0, "x"): (8.5, "r0"),
                       ("a", 11.0, "y"): (None, None)}

    def test_null_ts_rows(self, spark):
        l = _left(spark, [("a", None, "x"), ("a", 5.0, "y")])
        r = _right(spark, [("a", 1.0, "r1"), ("a", None, "r-null")])
        for direction in ("backward", "forward"):
            got = _got(asof_join(l, r, on="k", direction=direction))
            assert got[("a", None, "x")] == (None, None)
        assert _got(asof_join(l, r, on="k"))[("a", 5.0, "y")] == (1.0, "r1")

    def test_duplicate_right_ts_deterministic(self, spark):
        l = _left(spark, [("a", 2.0, "x")])
        r = _right(spark, [("a", 1.0, "r1"), ("a", 1.0, "r9"),
                           ("a", 1.0, "r5")])
        # max payload struct wins, independent of partitioning
        for n in (1, 7):
            got = _got(asof_join(l.repartition(n), r.repartition(n), on="k"))
            assert got == {("a", 2.0, "x"): (1.0, "r9")}

    def test_collision_suffix(self, spark):
        l = spark.createDataFrame([("a", 1.0, "lv")], "k string, ts double, v string")
        r = spark.createDataFrame([("a", 0.5, "rv")], "k string, ts double, v string")
        row = asof_join(l, r, on="k").collect()[0]
        assert (row.v, row.v_r, row.ts, row.ts_r) == ("lv", "rv", 1.0, 0.5)

    def test_validates(self, spark):
        l = _left(spark, [("a", 1.0, "x")])
        r = _right(spark, [("a", 1.0, "r")])
        with pytest.raises(ValueError):
            asof_join(l, r, on="k", direction="nearest")
        with pytest.raises(ValueError):
            asof_join(l, r, on="missing")
        with pytest.raises(ValueError):
            asof_join(l, r.select("k", "ts"), on="k")

    def test_plan_single_shuffle(self, spark):
        l = _left(spark, [("a", 1.0, "x")])
        r = _right(spark, [("a", 0.5, "r")])
        plan = asof_join(l, r, on="k")._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan.count("Exchange") == 1, plan

    @pytest.mark.parametrize("direction", ["backward", "forward"])
    @pytest.mark.parametrize("allow_exact", [True, False])
    @pytest.mark.parametrize("tolerance", [None, 3.0])
    def test_matches_pandas_merge_asof(self, spark, direction, allow_exact,
                                       tolerance):
        import random

        rng = random.Random(41)
        keys = ["k0", "k1", "k2"]
        lrows = [(rng.choice(keys), float(rng.randrange(0, 40)), f"l{i}")
                 for i in range(60)]
        # unique (key, ts) on the right: pandas picks positional-last
        # among duplicates, we pick max-payload — align by avoiding them
        rts = rng.sample(range(0, 40), 25)
        rrows = [(keys[i % 3], float(t), f"r{i}") for i, t in enumerate(rts)]

        lp = pd.DataFrame(lrows, columns=["k", "ts", "lv"]).sort_values("ts")
        rp = pd.DataFrame(rrows, columns=["k", "ts", "rv"]).sort_values("ts")
        want_df = pd.merge_asof(
            lp, rp, on="ts", by="k", direction=direction,
            allow_exact_matches=allow_exact, tolerance=tolerance,
            suffixes=("", "_r"),
        )
        want = {
            (r.k, r.ts, r.lv): r.rv if isinstance(r.rv, str) else None
            for r in want_df.itertuples()
        }
        got = {
            key: rv
            for key, (_, rv) in _got(asof_join(
                _left(spark, lrows), _right(spark, rrows), on="k",
                direction=direction, allow_exact=allow_exact,
                tolerance=tolerance,
            )).items()
        }
        assert got == want
