"""Degree-ordered triangle counting (ops/graph.py::triangle_count)."""
from rdf_spark.ops.graph import triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a string, b string")


def _counts(df):
    return {r.node: r.triangles for r in df.collect()}


class TestTriangleCount:
    def test_k4_every_node_in_three(self, spark):
        nodes = ["a", "b", "c", "d"]
        pairs = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
        got = _counts(triangle_count(_edges(spark, pairs)))
        assert got == {"a": 3, "b": 3, "c": 3, "d": 3}

    def test_path_has_zero(self, spark):
        got = _counts(triangle_count(_edges(spark, [("a", "b"), ("b", "c")])))
        assert got == {"a": 0, "b": 0, "c": 0}

    def test_duplicates_reversals_selfloops_ignored(self, spark):
        pairs = [
            ("a", "b"), ("b", "a"), ("a", "b"),
            ("b", "c"), ("a", "c"), ("c", "c"),
        ]
        got = _counts(triangle_count(_edges(spark, pairs)))
        assert got == {"a": 1, "b": 1, "c": 1}

    def test_star_hub_zero(self, spark):
        pairs = [("hub", f"n{i}") for i in range(10)]
        got = _counts(triangle_count(_edges(spark, pairs)))
        assert got["hub"] == 0 and all(v == 0 for v in got.values())

    def test_two_sharing_an_edge(self, spark):
        # triangles abc and abd share edge ab
        pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")]
        got = _counts(triangle_count(_edges(spark, pairs)))
        assert got == {"a": 2, "b": 2, "c": 1, "d": 1}

    def test_matches_bruteforce_on_random_graph(self, spark):
        import itertools
        import random

        rng = random.Random(7)
        nodes = [f"n{i}" for i in range(18)]
        pairs = [
            (u, v)
            for u, v in itertools.combinations(nodes, 2)
            if rng.random() < 0.3
        ]
        adj = {n: set() for n in nodes}
        for u, v in pairs:
            adj[u].add(v)
            adj[v].add(u)
        expect = {}
        for n in nodes:
            if not adj[n]:
                continue
            t = 0
            for u, v in itertools.combinations(sorted(adj[n]), 2):
                if v in adj[u]:
                    t += 1
            expect[n] = t
        got = _counts(triangle_count(_edges(spark, pairs)))
        assert got == expect
