"""Graph-accessor tests over a pipeline-built store."""

from pyspark.sql import functions as F

from rdf_spark import datagen, pipeline
from rdf_spark.ops import graph


def _store(spark):
    got, _ = pipeline.build_shard_triples(datagen.pages(spark, 100), datagen.aliases(spark))
    return got


def test_type_histogram(spark):
    th = {r.type: r.n for r in graph.type_histogram(_store(spark)).collect()}
    # ~1/41 of pages carry a malformed (quarantined) RDF block
    assert set(th) == {"http://kg.example/vocab#Product"}
    assert 90 <= th["http://kg.example/vocab#Product"] <= 100


def test_property_table(spark):
    EX = "http://kg.example/vocab#"
    pt = graph.property_table(
        _store(spark), {"name": EX + "name", "price": EX + "price"}
    )
    rows = pt.collect()
    assert 90 <= len(rows) <= 100
    assert all(r.name.startswith("Item ") and "." in r.price for r in rows)


def test_k_hop_and_describe(spark):
    store = _store(spark)
    start = store.filter(F.col("p").endswith("#tag")).first()
    # product --tag--> bnode --label--> literal: 1 hop reaches the bnode
    hop1 = {r.node for r in graph.k_hop_neighbors(store, [start.s], k=1).collect()}
    assert start.o in hop1
    desc = graph.describe(store, start.o)
    preds = {r.p for r in desc.collect()}
    assert "http://kg.example/vocab#label" in preds  # as subject
    assert "http://kg.example/vocab#tag" in preds  # as object
