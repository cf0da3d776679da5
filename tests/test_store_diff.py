"""Snapshot diff (store.snapshot_diff / diff_stats)."""
from rdf_spark import terms
from rdf_spark.store import diff_stats, snapshot_diff

KI, KL = terms.KIND_IRI, terms.KIND_LITERAL
SCHEMA = (
    "s string, s_kind tinyint, p string, o string, o_kind tinyint, "
    "o_datatype string, o_lang string"
)


def _t(spark, rows, extra=""):
    return spark.createDataFrame(rows, SCHEMA + extra)


def test_added_removed_and_null_safety(spark):
    # null o_datatype/o_lang must compare null-safe: the IRI triple is
    # UNCHANGED and must not appear in the diff
    common = ("u:a", KI, "u:p", "u:b", KI, None, None)
    lit_old = ("u:a", KI, "u:q", "x", KL, terms.XSD_STRING, None)
    lit_new = ("u:a", KI, "u:q", "y", KL, terms.XSD_STRING, None)
    got = {
        (r.change, r.o)
        for r in snapshot_diff(
            _t(spark, [common, lit_old]), _t(spark, [common, lit_new])
        ).collect()
    }
    assert got == {("added", "y"), ("removed", "x")}


def test_set_semantics(spark):
    row = ("u:a", KI, "u:p", "u:b", KI, None, None)
    # duplicates in either snapshot are one logical triple
    assert snapshot_diff(
        _t(spark, [row, row]), _t(spark, [row])
    ).isEmpty()


def test_lang_literal_distinct(spark):
    en = ("u:a", KI, "u:p", "hi", KL, terms.RDF_LANG_STRING, "en")
    de = ("u:a", KI, "u:p", "hi", KL, terms.RDF_LANG_STRING, "de")
    got = {(r.change, r.o_lang)
           for r in snapshot_diff(_t(spark, [en]), _t(spark, [de])).collect()}
    assert got == {("added", "de"), ("removed", "en")}


def test_graph_col(spark):
    g1 = ("u:a", KI, "u:p", "u:b", KI, None, None, "u:g1")
    g2 = ("u:a", KI, "u:p", "u:b", KI, None, None, "u:g2")
    extra = ", graph string"
    got = {(r.change, r.graph) for r in snapshot_diff(
        _t(spark, [g1], extra), _t(spark, [g2], extra), graph_col="graph"
    ).collect()}
    assert got == {("added", "u:g2"), ("removed", "u:g1")}


def test_diff_stats(spark):
    old = _t(spark, [
        ("u:a", KI, "u:p", "1", KL, terms.XSD_INTEGER, None),
        ("u:b", KI, "u:p", "2", KL, terms.XSD_INTEGER, None),
        ("u:c", KI, "u:q", "3", KL, terms.XSD_INTEGER, None),
    ])
    new = _t(spark, [
        ("u:c", KI, "u:q", "3", KL, terms.XSD_INTEGER, None),
        ("u:d", KI, "u:q", "4", KL, terms.XSD_INTEGER, None),
    ])
    got = {(r.change, r.p): r.n for r in diff_stats(old, new).collect()}
    assert got == {("removed", "u:p"): 2, ("added", "u:q"): 1}
