"""ops/cluster.py — distributed Lloyd k-means."""
import pytest
from pyspark.sql import functions as F

from rdf_spark.ops.cluster import assign_clusters, kmeans


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


class TestKMeans:
    def test_separates_planted_clusters(self, spark):
        rows = [
            (i, [10.0 + (i % 5) * 0.1, 10.0]) if i % 2 == 0
            else (i, [-10.0, -10.0 - (i % 5) * 0.1])
            for i in range(40)
        ]
        a, cents = kmeans(_df(spark, rows), k=2, n_iter=3)
        got = {r.vec_id: r.cluster for r in a.collect()}
        evens = {got[i] for i in range(0, 40, 2)}
        odds = {got[i] for i in range(1, 40, 2)}
        assert len(evens) == 1 and len(odds) == 1 and evens != odds
        # converged centroids sit near the planted means
        cx = sorted(c[0] for c in cents)
        assert cx[0] == pytest.approx(-10.0, abs=0.5)
        assert cx[1] == pytest.approx(10.0, abs=0.5)

    def test_deterministic_across_partitionings(self, spark):
        rows = [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(50)]
        df1 = _df(spark, rows).repartition(1)
        df8 = _df(spark, rows).repartition(8)
        a1, c1 = kmeans(df1, k=3, n_iter=2)
        a8, c8 = kmeans(df8, k=3, n_iter=2)
        assert c1 == c8  # decimal sums are order-independent
        assert sorted(map(tuple, a1.collect())) == \
            sorted(map(tuple, a8.collect()))

    def test_empty_cluster_keeps_seed(self, spark):
        # seeds 0 and 1 are IDENTICAL vectors → every tie resolves to
        # cluster 0, cluster 1 is empty from round 1 and must keep its
        # seed centroid through the update
        rows = [(0, [0.0]), (1, [0.0]), (2, [5.0]), (3, [5.0])]
        a, cents = kmeans(_df(spark, rows), k=3, n_iter=2)
        got = {r.vec_id: r.cluster for r in a.collect()}
        assert got == {0: 0, 1: 0, 2: 2, 3: 2}
        assert cents == [[0.0], [0.0], [5.0]]  # c1 = kept seed

    def test_tie_breaks_to_lowest_cluster(self, spark):
        df = _df(spark, [(0, [0.0]), (1, [2.0]), (2, [1.0])])
        out = assign_clusters(df, [[0.0], [2.0]])
        got = {r.vec_id: r.cluster for r in out.collect()}
        assert got == {0: 0, 1: 1, 2: 0}  # 1.0 equidistant → cluster 0

    def test_null_vectors_ignored(self, spark):
        df = spark.createDataFrame(
            [(0, [0.0]), (1, None), (2, [4.0])],
            "vec_id long, embedding array<float>")
        a, _ = kmeans(df, k=2, n_iter=1)
        assert sorted(r.vec_id for r in a.collect()) == [0, 2]

    def test_validation(self, spark):
        df = _df(spark, [(0, [0.0])])
        with pytest.raises(ValueError):
            kmeans(df, k=0)
        with pytest.raises(ValueError):
            kmeans(df, k=2)  # only one vector
        with pytest.raises(ValueError):
            kmeans(df, k=1, n_iter=0)
        with pytest.raises(ValueError):
            assign_clusters(df, [])

    def test_assignment_plan_has_no_shuffle(self, spark):
        df = _df(spark, [(i, [float(i)]) for i in range(10)])
        plan = assign_clusters(
            df, [[0.0], [5.0]]
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan