"""ops/propertygraph.py — RDF → labeled-property-graph projection."""
from rdf_spark.ops.propertygraph import (
    pg_edges,
    pg_nodes,
    pg_properties,
    to_property_graph,
    write_graphml,
)

_DDL = ("s string, s_kind tinyint, p string, o string, o_kind tinyint, "
        "o_datatype string, o_lang string")

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _store(spark):
    rows = [
        ("urn:c/1", 1, _RDF_TYPE, "urn:ex#Customer", 1, None, None),
        ("urn:c/1", 1, _RDF_TYPE, "urn:ex#Person", 1, None, None),
        ("urn:c/1", 1, "urn:ex#name", "Alice", 2, None, "en"),
        ("urn:c/1", 1, "urn:ex#name", "Alicia", 2, None, "es"),
        ("urn:c/1", 1, "urn:ex#inNation", "urn:n/7", 1, None, None),
        ("urn:n/7", 1, "urn:ex#name", "NATION_7", 2, None, None),
        ("_:b1", 0, "urn:ex#knows", "urn:c/1", 1, None, None),
    ]
    return spark.createDataFrame(rows, _DDL)


class TestPropertyGraph:
    def test_nodes_multi_label_and_untyped(self, spark):
        got = {(r.node_id, r.label) for r in pg_nodes(_store(spark)).collect()}
        assert got == {
            ("urn:c/1", "Customer"), ("urn:c/1", "Person"),
            ("urn:n/7", None), ("_:b1", None),
        }

    def test_properties_keep_multivalues_and_meta(self, spark):
        got = {(r.node_id, r.key, r.value, r.lang)
               for r in pg_properties(_store(spark)).collect()}
        assert ("urn:c/1", "name", "Alice", "en") in got
        assert ("urn:c/1", "name", "Alicia", "es") in got
        assert ("urn:n/7", "name", "NATION_7", None) in got

    def test_edges_exclude_type_and_literals(self, spark):
        got = {(r.src, r.edge_type, r.dst)
               for r in pg_edges(_store(spark)).collect()}
        assert got == {
            ("urn:c/1", "inNation", "urn:n/7"),
            ("_:b1", "knows", "urn:c/1"),
        }

    def test_type_object_not_a_node_unless_referenced(self, spark):
        nodes = {r.node_id for r in pg_nodes(_store(spark)).collect()}
        assert "urn:ex#Customer" not in nodes

    def test_graphml_round_shape(self, spark, tmp_path):
        import glob

        out = str(tmp_path / "g")
        write_graphml(_store(spark), out)
        xml = "".join(open(f).read() for f in glob.glob(out + "/part-*"))
        assert xml.count("<node ") == 3
        assert xml.count("<edge ") == 2
        assert 'label="inNation"' in xml
        import xml.etree.ElementTree as ET

        ET.fromstring(xml)  # well-formed

    def test_faces_consistent(self, spark):
        n, p, e = to_property_graph(_store(spark))
        node_ids = {r.node_id for r in n.collect()}
        assert {r.node_id for r in p.collect()} <= node_ids
        assert {r.src for r in e.collect()} <= node_ids
        assert {r.dst for r in e.collect()} <= node_ids


def test_graphml_escapes_quotes_and_cr(spark, tmp_path):
    """Review regression: node ids with quotes must not break attribute
    quoting; \r in property values must survive as a char reference."""
    import glob
    import xml.etree.ElementTree as ET

    rows = [
        ('urn:x"q', 1, "urn:ex#name", "line\rbreak", 2, None, None),
        ('urn:x"q', 1, "urn:ex#knows", "urn:y", 1, None, None),
    ]
    df = spark.createDataFrame(rows, _DDL)
    out = str(tmp_path / "g")
    write_graphml(df, out)
    xml = "".join(open(f).read() for f in glob.glob(out + "/part-*"))
    root = ET.fromstring(xml)  # well-formed despite the quote
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    vals = [d.text for d in root.iter(f"{ns}data")]
    assert "line\rbreak" in vals  # \r preserved via &#13;
