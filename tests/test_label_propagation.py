"""Label propagation communities (ops/graph.py::label_propagation)."""
import random

import pytest

from rdf_spark.ops.graph import label_propagation


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a string, b string")


def _labels(df):
    return {r.node: r.label for r in df.collect()}


def _naive_lpa(pairs, n_iter):
    """Reference replay of the exact documented schedule."""
    adj = {}
    und = set()
    for a, b in pairs:
        if a == b:
            continue
        und.add((min(a, b), max(a, b)))
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {n: n for n in adj}
    for _ in range(n_iter):
        new = {}
        for n, nbrs in adj.items():
            votes = {}
            for m in nbrs:
                votes[labels[m]] = votes.get(labels[m], 0) + 1
            votes[labels[n]] = votes.get(labels[n], 0) + 1  # self-vote
            best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
            new[n] = best[0]
        labels = new
    return labels


class TestLPA:
    def test_two_triangles(self, spark):
        tri1 = [("a1", "a2"), ("a2", "a3"), ("a3", "a1")]
        tri2 = [("b1", "b2"), ("b2", "b3"), ("b3", "b1")]
        got = _labels(label_propagation(_edges(spark, tri1 + tri2), n_iter=3))
        assert {got[n] for n in ("a1", "a2", "a3")} == {"a1"}
        assert {got[n] for n in ("b1", "b2", "b3")} == {"b1"}

    def test_barbell_keeps_two_communities(self, spark):
        c1 = [(f"a{i}", f"a{j}") for i in range(4) for j in range(i + 1, 4)]
        c2 = [(f"b{i}", f"b{j}") for i in range(4) for j in range(i + 1, 4)]
        bridge = [("a0", "b0")]
        got = _labels(
            label_propagation(_edges(spark, c1 + c2 + bridge), n_iter=4)
        )
        assert {got[f"a{i}"] for i in range(4)} == {"a0"}
        assert {got[f"b{i}"] for i in range(4)} == {"b0"}

    def test_star_adopts_min_hub(self, spark):
        star = [("a0", f"z{i}") for i in range(5)]
        got = _labels(label_propagation(_edges(spark, star), n_iter=2))
        assert set(got.values()) == {"a0"}

    def test_matches_naive_replay(self, spark):
        rng = random.Random(42)
        for trial in range(5):
            nodes = [f"n{i:02d}" for i in range(14)]
            pairs = [
                (rng.choice(nodes), rng.choice(nodes)) for _ in range(25)
            ]
            pairs = [(a, b) for a, b in pairs]
            got = _labels(label_propagation(_edges(spark, pairs), n_iter=3))
            assert got == _naive_lpa(pairs, 3), f"trial {trial}"

    def test_partitioning_invariant(self, spark):
        pairs = [(f"n{i}", f"n{(i * 3 + 1) % 11}") for i in range(11)]
        df = _edges(spark, pairs)
        a = _labels(label_propagation(df.repartition(1), n_iter=3))
        b = _labels(label_propagation(df.repartition(7), n_iter=3))
        assert a == b

    def test_n_iter_validates(self, spark):
        with pytest.raises(ValueError):
            label_propagation(_edges(spark, [("a", "b")]), n_iter=0)
