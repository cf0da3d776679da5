"""SHACL-lite validation (ops/shacl.py)."""
import pytest

from rdf_spark import terms
from rdf_spark.ops.shacl import conforms, validate, violation_stats

KI, KL, KB = terms.KIND_IRI, terms.KIND_LITERAL, terms.KIND_BLANK
SCHEMA = (
    "s string, s_kind tinyint, p string, o string, o_kind tinyint, "
    "o_datatype string, o_lang string"
)
XS, XI = terms.XSD_STRING, terms.XSD_INTEGER


def _t(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _graph(spark):
    rows = [
        ("u:p1", KI, terms.RDF_TYPE, "u:Person", KI, None, None),
        ("u:p2", KI, terms.RDF_TYPE, "u:Person", KI, None, None),
        ("u:p3", KI, terms.RDF_TYPE, "u:Person", KI, None, None),
        ("u:p1", KI, "u:name", "Ada", KL, XS, None),
        # p2: two names (maxCount), one of them numeric-typed (datatype)
        ("u:p2", KI, "u:name", "Bo", KL, XS, None),
        ("u:p2", KI, "u:name", "7", KL, XI, None),
        # p3: no name at all (minCount)
        ("u:p1", KI, "u:org", "u:acme", KI, None, None),
        ("u:p2", KI, "u:org", "u:ghost", KI, None, None),  # untyped org
        ("u:acme", KI, terms.RDF_TYPE, "u:Org", KI, None, None),
    ]
    return _t(spark, rows)


SHAPES = [{
    "id": "u:PersonShape",
    "target_class": "u:Person",
    "properties": [
        {"path": "u:name", "min_count": 1, "max_count": 1,
         "datatype": XS},
        {"path": "u:org", "class": "u:Org"},
    ],
}]


def _viol(df):
    return {(r.focus, r.constraint, r.value) for r in df.collect()}


class TestCore:
    def test_report(self, spark):
        got = _viol(validate(_graph(spark), SHAPES))
        assert got == {
            ("u:p3", "minCount", "0"),
            ("u:p2", "maxCount", "2"),
            ("u:p2", "datatype", "7"),
            ("u:p2", "class", "u:ghost"),
        }

    def test_conforms_and_stats(self, spark):
        ok = _t(spark, [
            ("u:p1", KI, terms.RDF_TYPE, "u:Person", KI, None, None),
            ("u:p1", KI, "u:name", "Ada", KL, XS, None),
            ("u:p1", KI, "u:org", "u:acme", KI, None, None),
            ("u:acme", KI, terms.RDF_TYPE, "u:Org", KI, None, None),
        ])
        assert conforms(ok, SHAPES)
        stats = {
            (r.constraint, r.n_violations)
            for r in violation_stats(_graph(spark), SHAPES).collect()
        }
        assert stats == {("minCount", 1), ("maxCount", 1),
                         ("datatype", 1), ("class", 1)}

    def test_report_columns(self, spark):
        df = validate(_graph(spark), SHAPES)
        assert df.columns == [
            "focus", "shape_id", "path", "constraint", "value", "expected"
        ]
        row = [r for r in df.collect() if r.constraint == "class"][0]
        assert (row.shape_id, row.path, row.expected) == (
            "u:PersonShape", "u:org", "u:Org")


class TestConstraints:
    def test_node_kind(self, spark):
        t = _t(spark, [
            ("u:a", KI, terms.RDF_TYPE, "u:T", KI, None, None),
            ("u:a", KI, "u:ref", "lit", KL, XS, None),
            ("u:a", KI, "u:ref", "u:b", KI, None, None),
            ("u:a", KI, "u:ref", "b0", KB, None, None),
        ])
        shapes = [{"id": "s", "target_class": "u:T", "properties": [
            {"path": "u:ref", "node_kind": "IRI"}]}]
        assert _viol(validate(t, shapes)) == {
            ("u:a", "nodeKind", "lit"), ("u:a", "nodeKind", "b0")}

    def test_pattern_and_lengths(self, spark):
        t = _t(spark, [
            ("u:a", KI, terms.RDF_TYPE, "u:T", KI, None, None),
            ("u:a", KI, "u:code", "AB-1", KL, XS, None),
            ("u:a", KI, "u:code", "xx", KL, XS, None),
            ("u:a", KI, "u:code", "AB-123456789", KL, XS, None),
        ])
        shapes = [{"id": "s", "target_class": "u:T", "properties": [
            {"path": "u:code", "pattern": "^[A-Z]{2}-[0-9]+$",
             "min_length": 3, "max_length": 8}]}]
        got = _viol(validate(t, shapes))
        assert got == {
            ("u:a", "pattern", "xx"),
            ("u:a", "minLength", "xx"),
            ("u:a", "maxLength", "AB-123456789"),
        }

    def test_in(self, spark):
        t = _t(spark, [
            ("u:a", KI, terms.RDF_TYPE, "u:T", KI, None, None),
            ("u:a", KI, "u:st", "X", KL, XS, None),
            ("u:a", KI, "u:st", "O", KL, XS, None),
        ])
        shapes = [{"id": "s", "target_class": "u:T", "properties": [
            {"path": "u:st", "in": ["O", "F"]}]}]
        assert _viol(validate(t, shapes)) == {("u:a", "in", "X")}

    def test_inverse_path(self, spark):
        # every T must be the object of ≥1 u:member edge
        t = _t(spark, [
            ("u:a", KI, terms.RDF_TYPE, "u:T", KI, None, None),
            ("u:b", KI, terms.RDF_TYPE, "u:T", KI, None, None),
            ("u:g", KI, "u:member", "u:a", KI, None, None),
        ])
        shapes = [{"id": "s", "target_class": "u:T", "properties": [
            {"path": "u:member", "inverse": True, "min_count": 1}]}]
        assert _viol(validate(t, shapes)) == {("u:b", "minCount", "0")}

    def test_target_node_and_multi_shape(self, spark):
        t = _t(spark, [
            ("u:x", KI, "u:name", "N", KL, XS, None),
        ])
        shapes = [
            {"id": "s1", "target_node": ["u:x", "u:y"], "properties": [
                {"path": "u:name", "min_count": 1}]},
            {"id": "s2", "target_node": ["u:x"], "properties": [
                {"path": "u:age", "min_count": 1}]},
        ]
        got = {(r.shape_id, r.focus) for r in validate(t, shapes).collect()}
        assert got == {("s1", "u:y"), ("s2", "u:x")}

    def test_no_target_raises(self, spark):
        with pytest.raises(ValueError):
            validate(_graph(spark), [{"id": "s", "properties": []}])

    def test_datatype_rejects_iri_value(self, spark):
        t = _t(spark, [
            ("u:a", KI, terms.RDF_TYPE, "u:T", KI, None, None),
            ("u:a", KI, "u:v", "u:b", KI, None, None),
        ])
        shapes = [{"id": "s", "target_class": "u:T", "properties": [
            {"path": "u:v", "datatype": XS}]}]
        assert _viol(validate(t, shapes)) == {("u:a", "datatype", "u:b")}

    def test_class_dedups_repeat_values(self, spark):
        t = _t(spark, [
            ("u:a", KI, terms.RDF_TYPE, "u:T", KI, None, None),
            ("u:a", KI, "u:ref", "u:g", KI, None, None),
            ("u:a", KI, "u:ref", "u:g", KI, None, None),
        ])
        shapes = [{"id": "s", "target_class": "u:T", "properties": [
            {"path": "u:ref", "class": "u:C"}]}]
        assert validate(t, shapes).count() == 1

    def test_empty_shapes_conforms(self, spark):
        assert conforms(_graph(spark), [])


class TestIncremental:
    def test_validate_delta_matches_full_restricted(self, spark):
        from rdf_spark.ops.shacl import validate_delta
        from rdf_spark.store import snapshot_diff

        old_rows = [
            ("u:p1", KI, terms.RDF_TYPE, "u:Person", KI, None, None),
            ("u:p1", KI, "u:name", "Ada", KL, XS, None),
            ("u:p2", KI, terms.RDF_TYPE, "u:Person", KI, None, None),
            ("u:p2", KI, "u:name", "Bo", KL, XS, None),
        ]
        # delta: p2 loses its name (minCount violation appears);
        # p1 untouched
        new_rows = old_rows[:3]
        old, new = _t(spark, old_rows), _t(spark, new_rows)
        delta = snapshot_diff(old, new)
        rep = validate_delta(new, SHAPES, delta)
        got = {(r.focus, r.constraint) for r in rep.collect()}
        assert got == {("u:p2", "minCount")}

    def test_affected_focus_pulls_in_neighbors(self, spark):
        from rdf_spark.ops.shacl import affected_focus, validate_delta

        # u:acme loses its rdf:type → p1's sh:class verdict flips even
        # though no u:p1-subject triple changed
        new_rows = [
            ("u:p1", KI, terms.RDF_TYPE, "u:Person", KI, None, None),
            ("u:p1", KI, "u:name", "Ada", KL, XS, None),
            ("u:p1", KI, "u:org", "u:acme", KI, None, None),
        ]
        new = _t(spark, new_rows)
        delta = spark.createDataFrame(
            [("u:acme",)], "s string")  # the changed subject
        aff = {r.focus for r in affected_focus(new, delta).collect()}
        assert aff == {"u:acme", "u:p1"}
        rep = validate_delta(new, SHAPES, delta)
        got = {(r.focus, r.constraint) for r in rep.collect()}
        assert got == {("u:p1", "class")}

    def test_restrict_excludes_unaffected(self, spark):
        from rdf_spark.ops.shacl import validate

        restrict = spark.createDataFrame([("u:p3",)], "focus string")
        rep = validate(_graph(spark), SHAPES, restrict_focus=restrict)
        got = {(r.focus, r.constraint) for r in rep.collect()}
        # p2's violations are filtered out; only p3's minCount remains
        assert got == {("u:p3", "minCount")}


class TestReportGraph:
    def test_report_graph_roundtrip(self, spark):
        from rdf_spark.encoders import nt_line_col
        from rdf_spark.ops.shacl import report_graph
        from rdf_spark.parsing import parse_ntriples

        SHNS = "http://www.w3.org/ns/shacl#"
        rep = validate(_graph(spark), SHAPES)
        g = report_graph(rep)
        rows = g.collect()
        by_pred = {}
        for r in rows:
            by_pred.setdefault(r.p, []).append(r)
        assert len(by_pred[SHNS + "result"]) == 4
        assert len(by_pred[SHNS + "focusNode"]) == 4
        comps = {r.o for r in by_pred[SHNS + "sourceConstraintComponent"]}
        assert comps == {
            SHNS + "MinCountConstraintComponent",
            SHNS + "MaxCountConstraintComponent",
            SHNS + "DatatypeConstraintComponent",
            SHNS + "ClassConstraintComponent",
        }
        conf = by_pred[SHNS + "conforms"][0]
        assert (conf.o, conf.o_datatype) == (
            "false", "http://www.w3.org/2001/XMLSchema#boolean")
        # every result bnode is linked from the report node
        linked = {r.o for r in by_pred[SHNS + "result"]}
        assert linked == {r.s for r in rows if r.s != "_:report"}
        # dogfood: the graph serializes through our own encoder and
        # re-parses to the same triple count
        nt = g.select(nt_line_col().alias("line"))
        lines = "\n".join(r.line for r in nt.collect())
        assert len(parse_ntriples(lines)) == len(rows)

    def test_report_graph_conformant(self, spark):
        from rdf_spark.ops.shacl import report_graph

        SHNS = "http://www.w3.org/ns/shacl#"
        ok = _t(spark, [
            ("u:p1", KI, terms.RDF_TYPE, "u:Person", KI, None, None),
            ("u:p1", KI, "u:name", "Ada", KL, XS, None),
            ("u:p1", KI, "u:org", "u:acme", KI, None, None),
            ("u:acme", KI, terms.RDF_TYPE, "u:Org", KI, None, None),
        ])
        g = report_graph(validate(ok, SHAPES)).collect()
        got = {(r.p, r.o) for r in g}
        assert (SHNS + "conforms", "true") in got
        assert len(g) == 2  # type + conforms, no results
