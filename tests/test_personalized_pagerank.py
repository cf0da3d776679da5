"""Personalized PageRank (ops/graph.py::personalized_pagerank)."""
from decimal import Decimal

import pytest

from rdf_spark.ops.graph import pagerank, personalized_pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _naive(pairs, seeds, n_iter, damping=0.85, round_to=12):
    nodes = sorted({n for e in pairs for n in e} | set(seeds))
    od = {}
    for s, _ in pairs:
        od[s] = od.get(s, 0) + 1
    restart = 1.0 / len(seeds)
    base = (1.0 - damping) / len(seeds)
    ranks = {n: (restart if n in seeds else 0.0) for n in nodes}
    for _ in range(n_iter):
        sums = {n: Decimal(0) for n in nodes}
        for s, d in pairs:
            sums[d] += Decimal(str(round(ranks[s] / od[s], 14)))
        ranks = {
            n: round(
                (base if n in seeds else 0.0)
                + damping * float(sums[n]),
                round_to,
            )
            for n in nodes
        }
    return ranks


def _got(df):
    return {r.node: r.rank for r in df.collect()}


class TestPersonalizedPagerank:
    def test_matches_naive_replay(self, spark):
        import random

        rng = random.Random(31)
        nodes = [f"n{i}" for i in range(12)]
        pairs = list({(rng.choice(nodes), rng.choice(nodes))
                      for _ in range(30)})
        seeds = {"n0", "n5"}
        got = _got(personalized_pagerank(_edges(spark, pairs), seeds,
                                         n_iter=4))
        assert got == _naive(pairs, seeds, 4)

    def test_rank_decays_with_distance_from_seed(self, spark):
        chain = [(f"c{i}", f"c{i+1}") for i in range(6)]
        got = _got(personalized_pagerank(_edges(spark, chain), ["c0"],
                                         n_iter=8))
        assert got["c0"] > got["c1"] > got["c2"] > got["c3"]

    def test_isolated_seed_keeps_restart_mass(self, spark):
        got = _got(personalized_pagerank(
            _edges(spark, [("a", "b")]), ["zzz"], n_iter=3))
        assert got["zzz"] == pytest.approx(0.15, abs=1e-9)
        assert got["a"] == 0.0

    def test_uniform_seed_set_reduces_to_pagerank(self, spark):
        pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
        nodes = ["a", "b", "c"]
        pr = _got(pagerank(_edges(spark, pairs), n_iter=5))
        ppr = _got(personalized_pagerank(_edges(spark, pairs), nodes,
                                         n_iter=5))
        for n in nodes:
            assert ppr[n] == pytest.approx(pr[n], abs=1e-9)

    def test_validates(self, spark):
        with pytest.raises(ValueError):
            personalized_pagerank(_edges(spark, [("a", "b")]), [])
