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


def test_k_hop_fixpoint_hub_graph(spark):
    """Hub blowup: the frontier exceeds the broadcast cap, so the hop must
    run as a shuffle join (no driver/broadcast OOM path), and the BFS must
    early-exit at the fixpoint before exhausting k."""
    n_leaves = 20_000
    hub_edges = spark.range(n_leaves).select(
        F.lit("n:hub").alias("s"),
        F.lit(1).cast("tinyint").alias("s_kind"),
        F.lit("n:p").alias("p"),
        F.concat(F.lit("n:leaf"), F.col("id")).alias("o"),
        F.lit(1).cast("tinyint").alias("o_kind"),
        F.lit(None).cast("string").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
    )
    start_edge = spark.createDataFrame(
        [("n:start", 1, "n:p", "n:hub", 1, None, None)],
        "s string, s_kind tinyint, p string, o string, o_kind tinyint, "
        "o_datatype string, o_lang string",
    )
    triples = hub_edges.unionByName(start_edge)
    got = graph.k_hop_neighbors(
        triples, ["n:start"], k=5, broadcast_max_rows=100
    )
    # fixpoint reached at hop 2; visited = start + hub + all leaves
    assert got.count() == 2 + n_leaves


def test_k_hop_unreachable_and_cycle(spark):
    triples = spark.createDataFrame(
        [("n:a", 1, "n:p", "n:b", 1, None, None),
         ("n:b", 1, "n:p", "n:a", 1, None, None),   # cycle
         ("n:x", 1, "n:p", "n:y", 1, None, None)],  # disconnected
        "s string, s_kind tinyint, p string, o string, o_kind tinyint, "
        "o_datatype string, o_lang string",
    )
    got = {r.node for r in graph.k_hop_neighbors(triples, ["n:a"], k=10).collect()}
    assert got == {"n:a", "n:b"}


def test_k_hop_duplicate_seeds(spark):
    triples = spark.createDataFrame(
        [("n:a", 1, "n:p", "n:b", 1, None, None)],
        "s string, s_kind tinyint, p string, o string, o_kind tinyint, "
        "o_datatype string, o_lang string",
    )
    got = [r.node for r in graph.k_hop_neighbors(triples, ["n:a", "n:a"], k=1).collect()]
    assert sorted(got) == ["n:a", "n:b"]  # seed deduped
