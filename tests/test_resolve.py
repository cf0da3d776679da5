"""Blocked levenshtein entity resolution (ops/resolve.py)."""
from pyspark.sql import functions as F

from rdf_spark.ops.resolve import resolve_entities


def _catalog(spark):
    return spark.createDataFrame(
        [
            ("u:e1", "Albert Einstein"),
            ("u:e2", "Alfred Nobel"),
            ("u:e3", "Marie Curie"),
            ("u:e4", "Maria Curie-Sklodowska"),
        ],
        "entity_iri string, name string",
    )


def _surfaces(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "surface string")


class TestResolveEntities:
    def test_typo_resolves_to_nearest(self, spark):
        out = resolve_entities(
            _surfaces(spark, ["Albert Einstien", "Marie Curie"]),
            _catalog(spark),
        ).collect()
        got = {r.surface: (r.entity_iri, r.sim) for r in out}
        assert got["Albert Einstien"][0] == "u:e1"
        assert got["Marie Curie"] == ("u:e3", 1.0)

    def test_blocking_limits_candidates(self, spark):
        # 'Xlbert Einstein' is 1 edit from e1 but lands in block 'xl' —
        # the documented recall tradeoff: no match
        out = resolve_entities(
            _surfaces(spark, ["Xlbert Einstein"]), _catalog(spark)
        )
        assert out.count() == 0

    def test_length_band_prunes(self, spark):
        # same block 'ma', but length gap beyond (1-t)*maxlen: pruned
        out = resolve_entities(
            _surfaces(spark, ["Ma"]), _catalog(spark), threshold=0.75
        )
        assert out.count() == 0

    def test_topk_and_deterministic_ties(self, spark):
        cat = spark.createDataFrame(
            [("u:b", "abcd"), ("u:a", "abcd"), ("u:c", "abce")],
            "entity_iri string, name string",
        )
        out = resolve_entities(
            _surfaces(spark, ["abcd"]), cat, threshold=0.5, topk=3
        ).orderBy("rank").collect()
        # equal sims tie-break on entity id ascending
        assert [r.entity_iri for r in out] == ["u:a", "u:b", "u:c"]
        assert [r.rank for r in out] == [1, 2, 3]

    def test_case_insensitive_sim(self, spark):
        out = resolve_entities(
            _surfaces(spark, ["ALBERT EINSTEIN"]), _catalog(spark)
        ).collect()
        assert out[0].sim == 1.0

    def test_duplicate_surfaces_resolved_once(self, spark):
        out = resolve_entities(
            _surfaces(spark, ["Marie Curie", "Marie Curie", "Marie Curie"]),
            _catalog(spark),
        )
        assert out.count() == 1

    def test_threshold_filters(self, spark):
        out = resolve_entities(
            _surfaces(spark, ["Albatross"]), _catalog(spark), threshold=0.9
        )
        assert out.count() == 0

    def test_null_and_empty_surfaces_dropped(self, spark):
        s = spark.createDataFrame(
            [(None,), ("",), ("Marie Curie",)], "surface string"
        )
        assert resolve_entities(s, _catalog(spark)).count() == 1

    def test_windowgrouplimit_in_plan(self, spark):
        # the rank<=k filter must compile to a map-side WindowGroupLimit
        # so losing candidates never cross the shuffle (Spark 4)
        out = resolve_entities(
            _surfaces(spark, ["Marie Curie"]), _catalog(spark), topk=1
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan
