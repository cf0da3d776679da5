"""ρdf closure + owl:sameAs resolution (ops/reasoning.py)."""
import pytest
from pyspark.sql import functions as F

from rdf_spark.ops.reasoning import (
    OWL_SAMEAS,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASSOF,
    RDFS_SUBPROPERTYOF,
    rdfs_closure,
    sameas_resolve,
)
from rdf_spark.terms import KIND_IRI, KIND_LITERAL, RDF_TYPE


def _bare(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _triples(df):
    return {tuple(r) for r in df.collect()}


# ---------------------------------------------------------------- rdfs


class TestRdfsClosure:
    def test_subclass_transitivity_and_type_inheritance(self, spark):
        t = _bare(spark, [
            ("u:Dog", RDFS_SUBCLASSOF, "u:Mammal"),
            ("u:Mammal", RDFS_SUBCLASSOF, "u:Animal"),
            ("u:rex", RDF_TYPE, "u:Dog"),
        ])
        out = _triples(rdfs_closure(t))
        assert ("u:Dog", RDFS_SUBCLASSOF, "u:Animal") in out      # rdfs11
        assert ("u:rex", RDF_TYPE, "u:Mammal") in out             # rdfs9
        assert ("u:rex", RDF_TYPE, "u:Animal") in out             # rdfs9 via sc+
        # no reflexive subclass facts invented
        assert ("u:Dog", RDFS_SUBCLASSOF, "u:Dog") not in out

    def test_subproperty_then_domain_range(self, spark):
        # rdfs2/3 must fire on rdfs7-derived triples: the ρdf rule order
        t = _bare(spark, [
            ("u:hasPet", RDFS_SUBPROPERTYOF, "u:knows"),
            ("u:knows", RDFS_DOMAIN, "u:Person"),
            ("u:knows", RDFS_RANGE, "u:Agent"),
            ("u:ann", "u:hasPet", "u:rex"),
        ])
        out = _triples(rdfs_closure(t))
        assert ("u:ann", "u:knows", "u:rex") in out               # rdfs7
        assert ("u:ann", RDF_TYPE, "u:Person") in out             # rdfs2 after 7
        assert ("u:rex", RDF_TYPE, "u:Agent") in out              # rdfs3 after 7

    def test_type_inheritance_on_derived_types(self, spark):
        # rdfs9 must see types produced by rdfs2
        t = _bare(spark, [
            ("u:p", RDFS_DOMAIN, "u:B"),
            ("u:B", RDFS_SUBCLASSOF, "u:A"),
            ("u:x", "u:p", "u:y"),
        ])
        out = _triples(rdfs_closure(t))
        assert ("u:x", RDF_TYPE, "u:B") in out
        assert ("u:x", RDF_TYPE, "u:A") in out

    def test_literal_objects_never_typed_by_range(self, spark):
        t = spark.createDataFrame(
            [
                ("u:name", RDFS_RANGE, "u:Label", KIND_IRI, KIND_IRI),
                ("u:x", "u:name", "Rex", KIND_IRI, KIND_LITERAL),
            ],
            "s string, p string, o string, s_kind int, o_kind int",
        )
        out = rdfs_closure(t)
        typed = out.filter(
            (F.col("p") == RDF_TYPE) & (F.col("s") == "Rex")
        ).count()
        assert typed == 0
        # metadata carried: the inferred nothing; the inputs survive
        assert out.count() == 2

    def test_external_schema_and_idempotence(self, spark):
        inst = _bare(spark, [("u:x", "u:sub", "u:y")])
        schema = _bare(spark, [("u:sub", RDFS_SUBPROPERTYOF, "u:super")])
        once = rdfs_closure(inst, schema=schema)
        assert ("u:x", "u:super", "u:y") in _triples(once)
        # the entailed schema pairs are part of the closure output even
        # when the schema came from a separate ontology DataFrame
        assert ("u:sub", RDFS_SUBPROPERTYOF, "u:super") in _triples(once)
        twice = rdfs_closure(once, schema=schema)
        assert _triples(twice) == _triples(once)

    def test_deep_chain_closure(self, spark):
        n = 24
        rows = [
            (f"u:C{i}", RDFS_SUBCLASSOF, f"u:C{i + 1}") for i in range(n)
        ] + [("u:i", RDF_TYPE, "u:C0")]
        out = rdfs_closure(_bare(spark, rows))
        types = {
            r.o for r in out.filter(
                (F.col("p") == RDF_TYPE) & (F.col("s") == "u:i")
            ).collect()
        }
        assert types == {f"u:C{i}" for i in range(n + 1)}


# ------------------------------------------------------------- sameAs


class TestSameAsResolve:
    def test_chain_rewrites_to_min_iri(self, spark):
        t = _bare(spark, [
            ("u:a", OWL_SAMEAS, "u:b"),
            ("u:b", OWL_SAMEAS, "u:c"),
            ("u:c", "u:likes", "u:z"),
            ("u:q", "u:knows", "u:b"),
        ])
        out = _triples(sameas_resolve(t))
        assert out == {
            ("u:a", "u:likes", "u:z"),
            ("u:q", "u:knows", "u:a"),
        }

    def test_keep_links_provenance(self, spark):
        t = _bare(spark, [
            ("u:a", OWL_SAMEAS, "u:b"),
        ])
        out = _triples(sameas_resolve(t, keep_links=True))
        assert out == {("u:a", OWL_SAMEAS, "u:b")}

    def test_literal_objects_not_rewritten(self, spark):
        t = spark.createDataFrame(
            [
                ("u:a", OWL_SAMEAS, "u:b", KIND_IRI, KIND_IRI),
                # literal lexically equal to a mapped IRI must survive
                ("u:x", "u:label", "u:b", KIND_IRI, KIND_LITERAL),
            ],
            "s string, p string, o string, s_kind int, o_kind int",
        )
        out = sameas_resolve(t)
        row = out.filter(F.col("p") == "u:label").collect()[0]
        assert row.o == "u:b"

    def test_merged_duplicates_collapse(self, spark):
        t = _bare(spark, [
            ("u:a", OWL_SAMEAS, "u:b"),
            ("u:a", "u:p", "u:z"),
            ("u:b", "u:p", "u:z"),
        ])
        assert sameas_resolve(t).count() == 1

    def test_no_sameas_is_identity(self, spark):
        t = _bare(spark, [("u:a", "u:p", "u:b")])
        assert _triples(sameas_resolve(t)) == {("u:a", "u:p", "u:b")}


def test_rdfs_closure_instance_side_never_shuffles(spark):
    """Plan shape: every inference join must be a BroadcastHashJoin of
    the (checkpointed, ontology-sized) schema closure against the
    instance scan — with dedup=False the plan contains NO shuffle of
    instance data (no SortMergeJoin, no join Exchange)."""
    t = _bare(spark, [
        ("u:hasPet", RDFS_SUBPROPERTYOF, "u:knows"),
        ("u:knows", RDFS_DOMAIN, "u:Person"),
        ("u:Dog", RDFS_SUBCLASSOF, "u:Animal"),
        ("u:ann", "u:hasPet", "u:rex"),
        ("u:rex", RDF_TYPE, "u:Dog"),
    ])
    out = rdfs_closure(t, dedup=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_schema_closure_null_edges_match_distributed_semantics(spark):
    """Round-6 review fix: the driver fast path must not traverse
    through null nodes or emit null-containing pairs — SQL equality
    joins never match null and the distributed path's sub != sup
    filter drops (x, null) rows."""
    from rdf_spark.ops.reasoning import _closure_local, _schema_closure

    assert _closure_local([("a", None), (None, "b")]) == []
    assert sorted(_closure_local([("a", "b"), ("b", None), ("b", "c")])) \
        == [("a", "b"), ("a", "c"), ("b", "c")]
    edges = spark.createDataFrame(
        [("a", None), (None, "b"), ("a", "b"), ("b", "c")],
        "sub string, sup string",
    )
    got = {(r.sub, r.sup) for r in _schema_closure(edges).collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}
