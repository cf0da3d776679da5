"""k-core peeling (ops/graph.py::k_core)."""
import pytest

from rdf_spark.ops.graph import k_core


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a string, b string")


def _nodes(df):
    return {r.node for r in df.collect()}


class TestKCore:
    def test_clique_survives_pendants_peel(self, spark):
        nodes = ["c0", "c1", "c2", "c3"]
        clique = [
            (x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]
        ]
        pendant = [("c0", "p"), ("p", "q")]  # chain peels over 2 rounds
        got = _nodes(k_core(_edges(spark, clique + pendant), k=3))
        assert got == set(nodes)

    def test_cycle_is_its_own_2core(self, spark):
        cyc = [(f"n{i}", f"n{(i + 1) % 6}") for i in range(6)]
        assert _nodes(k_core(_edges(spark, cyc), k=2)) == {
            f"n{i}" for i in range(6)
        }
        assert _nodes(k_core(_edges(spark, cyc), k=3)) == set()

    def test_cascading_unravel(self, spark):
        # triangle ladder: 3-core unravels completely from the ends
        pairs = []
        for i in range(8):
            pairs += [(f"n{i}", f"n{i + 1}"), (f"n{i}", f"n{i + 2}")]
        assert _nodes(k_core(_edges(spark, pairs), k=3)) == set()

    def test_duplicates_and_selfloops_ignored(self, spark):
        tri = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a")]
        assert _nodes(k_core(_edges(spark, tri), k=2)) == {"a", "b", "c"}

    def test_k_validation(self, spark):
        with pytest.raises(ValueError):
            k_core(_edges(spark, [("a", "b")]), k=0)

    def test_matches_networkx_free_bruteforce(self, spark):
        import itertools
        import random

        rng = random.Random(13)
        nodes = [f"n{i}" for i in range(16)]
        pairs = [
            (u, v)
            for u, v in itertools.combinations(nodes, 2)
            if rng.random() < 0.25
        ]
        # reference peeling in plain python
        adj = {n: set() for n in nodes}
        for u, v in pairs:
            adj[u].add(v)
            adj[v].add(u)
        k = 3
        alive = {n for n in nodes if adj[n]}
        changed = True
        while changed:
            changed = False
            for n in list(alive):
                deg = len(adj[n] & alive)
                if deg < k:
                    alive.discard(n)
                    changed = True
        got = _nodes(k_core(_edges(spark, pairs), k=k))
        assert got == alive
