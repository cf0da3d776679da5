"""VoID dataset statistics (ops/voidstats.py)."""
from pyspark.sql import functions as F

from rdf_spark import terms
from rdf_spark.ops.voidstats import (
    class_partition,
    property_partition,
    void_summary,
)

KI, KL, KB = terms.KIND_IRI, terms.KIND_LITERAL, terms.KIND_BLANK
SCHEMA = (
    "s string, s_kind tinyint, p string, o string, o_kind tinyint, "
    "o_datatype string, o_lang string"
)


def _triples(spark):
    x = terms.XSD_STRING
    rows = [
        # two typed entities, one class shared
        ("u:a", KI, terms.RDF_TYPE, "u:C1", KI, None, None),
        ("u:b", KI, terms.RDF_TYPE, "u:C1", KI, None, None),
        ("u:c", KI, terms.RDF_TYPE, "u:C2", KI, None, None),
        # literals: same lexical form under two datatypes → 2 objects
        ("u:a", KI, "u:p:name", "x", KL, x, None),
        ("u:b", KI, "u:p:name", "x", KL, terms.XSD_INTEGER, None),
        # IRI object that is also a subject elsewhere
        ("u:a", KI, "u:p:link", "u:b", KI, None, None),
        # blank subject: not an entity, still a distinct subject
        ("b0", KB, "u:p:link", "u:d", KI, None, None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


class TestVoidSummary:
    def test_counts(self, spark):
        row = void_summary(_triples(spark)).collect()[0]
        assert row.n_triples == 7
        # subjects: u:a u:b u:c + blank b0
        assert row.distinct_subjects == 4
        assert row.properties == 3  # rdf:type, name, link
        # objects: C1, C2, "x"^^string, "x"^^integer, u:b, u:d
        assert row.distinct_objects == 6
        assert row.classes == 2
        # IRIs anywhere: a b c (subjects) + C1 C2 b d (objects) → b dedups
        assert row.entities == 6
        assert row.literals == 2

    def test_type_with_literal_object_not_a_class(self, spark):
        t = _triples(spark).union(
            spark.createDataFrame(
                [("u:e", KI, terms.RDF_TYPE, "weird", KL,
                  terms.XSD_STRING, None)],
                SCHEMA,
            )
        )
        assert void_summary(t).collect()[0].classes == 2


class TestPartitions:
    def test_property_partition(self, spark):
        got = {
            r.p: (r.triples, r.distinct_subjects, r.distinct_objects)
            for r in property_partition(_triples(spark)).collect()
        }
        assert got == {
            terms.RDF_TYPE: (3, 3, 2),
            "u:p:name": (2, 2, 2),   # same "x", two datatypes
            "u:p:link": (2, 2, 2),
        }

    def test_class_partition(self, spark):
        got = {
            r.class_iri: r.entities
            for r in class_partition(_triples(spark)).collect()
        }
        assert got == {"u:C1": 2, "u:C2": 1}

    def test_class_partition_dedups_repeat_typing(self, spark):
        t = _triples(spark).union(
            spark.createDataFrame(
                [("u:a", KI, terms.RDF_TYPE, "u:C1", KI, None, None)],
                SCHEMA,
            )
        )
        got = {r.class_iri: r.entities for r in class_partition(t).collect()}
        assert got["u:C1"] == 2


class TestPlanShape:
    def test_summary_is_all_hashaggregate_no_expand(self, spark):
        plan = void_summary(_triples(spark))._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Expand" not in plan  # one pass per stat, never Expand ×k
