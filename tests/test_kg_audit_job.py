"""kg_audit spark-submit CLI (jobs/kg_audit_job.py)."""
import json
import sys

import pytest

from rdf_spark import terms

sys.path.insert(0, "jobs")
import kg_audit_job  # noqa: E402

KI, KL = terms.KIND_IRI, terms.KIND_LITERAL
SCHEMA = (
    "s string, s_kind tinyint, p string, o string, o_kind tinyint, "
    "o_datatype string, o_lang string, err string"
)


def _store(spark, tmp_path):
    rows = [
        ("u:a", KI, terms.RDF_TYPE, "u:T", KI, None, None, None),
        ("u:b", KI, terms.RDF_TYPE, "u:T", KI, None, None, None),
        ("u:a", KI, "u:name", "A", KL, terms.XSD_STRING, None, None),
        # u:b has no name → minCount violation
        # quarantined row must be ignored by both audits
        ("bad", KI, "u:name", "x", KL, terms.XSD_STRING, None, "boom"),
    ]
    path = str(tmp_path / "triples")
    spark.createDataFrame(rows, SCHEMA).write.parquet(path)
    return path


def _shapes(tmp_path):
    spec = [{
        "id": "u:TShape",
        "target_class": "u:T",
        "properties": [{"path": "u:name", "min_count": 1}],
    }]
    p = tmp_path / "shapes.json"
    p.write_text(json.dumps(spec))
    return str(p)


def test_void_and_shacl(spark, tmp_path, capsys):
    tri = _store(spark, tmp_path)
    out = str(tmp_path / "audit")
    rc = kg_audit_job.main([
        "--triples", tri, "--out", out, "--void",
        "--shapes", _shapes(tmp_path),
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["void"]["n_triples"] == 3  # err row excluded
    assert summary["void"]["classes"] == 1
    assert summary["violations"] == 1
    assert summary["violations_by_constraint"] == {"minCount": 1}
    assert not summary["conforms"]
    rep = spark.read.parquet(out + "/shacl_report").collect()
    assert [(r.focus, r.constraint) for r in rep] == [("u:b", "minCount")]


def test_fail_on_violation_rc(spark, tmp_path, capsys):
    tri = _store(spark, tmp_path)
    out = str(tmp_path / "audit2")
    rc = kg_audit_job.main([
        "--triples", tri, "--out", out,
        "--shapes", _shapes(tmp_path), "--fail-on-violation",
    ])
    assert rc == 1


def test_requires_a_task(spark, tmp_path):
    with pytest.raises(SystemExit):
        kg_audit_job.main(["--triples", "x", "--out", "y"])


def test_turtle_shapes_graph(spark, tmp_path, capsys):
    tri = _store(spark, tmp_path)
    out = str(tmp_path / "audit3")
    ttl = tmp_path / "shapes.ttl"
    ttl.write_text("""
        @prefix sh: <http://www.w3.org/ns/shacl#> .
        <u:TShape> a sh:NodeShape ; sh:targetClass <u:T> ;
          sh:property [ sh:path <u:name> ; sh:minCount 1 ] .
    """)
    rc = kg_audit_job.main([
        "--triples", tri, "--out", out, "--shapes", str(ttl),
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["violations_by_constraint"] == {"minCount": 1}
    rep = spark.read.parquet(out + "/shacl_report").collect()
    assert [(r.focus, r.shape_id) for r in rep] == [("u:b", "u:TShape")]


def test_turtle_shapes_sniffed_without_extension(tmp_path):
    p = tmp_path / "shapes.any"
    p.write_text("""
        @prefix sh: <http://www.w3.org/ns/shacl#> .
        <u:S> a sh:NodeShape ; sh:targetClass <u:T> ;
          sh:property [ sh:path <u:p> ; sh:maxCount 2 ] .
    """)
    specs = kg_audit_job._load_shapes(str(p))
    assert specs == [{"id": "u:S", "target_class": ["u:T"],
                      "properties": [{"path": "u:p", "max_count": 2}]}]


def test_lists_audit(spark, tmp_path, capsys):
    from rdf_spark.ops.rdflist import RDF_FIRST, RDF_NIL, RDF_REST

    rows = [
        ("c0", KI, RDF_FIRST, "a", KL, terms.XSD_STRING, None, None),
        ("c0", KI, RDF_REST, "c1", KI, None, None, None),
        ("c1", KI, RDF_FIRST, "b", KL, terms.XSD_STRING, None, None),
        ("c1", KI, RDF_REST, RDF_NIL, KI, None, None, None),
        # dangling list → dropped
        ("d0", KI, RDF_FIRST, "x", KL, terms.XSD_STRING, None, None),
        ("d0", KI, RDF_REST, "gone", KI, None, None, None),
    ]
    tri = str(tmp_path / "tri_lists")
    spark.createDataFrame(rows, SCHEMA).write.parquet(tri)
    out = str(tmp_path / "audit4")
    rc = kg_audit_job.main(["--triples", tri, "--out", out, "--lists"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["lists"] == {
        "n_lists": 1, "n_members": 2, "n_dropped_heads": 1}
    got = sorted((r.head, r.ix, r.member) for r in
                 spark.read.parquet(out + "/rdf_lists").collect())
    assert got == [("c0", 0, "a"), ("c0", 1, "b")]


def test_report_graph_output(spark, tmp_path, capsys):
    tri = _store(spark, tmp_path)
    out = str(tmp_path / "audit5")
    rc = kg_audit_job.main([
        "--triples", tri, "--out", out, "--shapes", _shapes(tmp_path),
        "--report-graph",
    ])
    assert rc == 0
    g = spark.read.parquet(out + "/shacl_report_graph").collect()
    SHNS = "http://www.w3.org/ns/shacl#"
    assert (sum(1 for r in g if r.p == SHNS + "result")) == 1
    nt = spark.read.text(out + "/shacl_report_nt").collect()
    assert any("ValidationReport" in r.value for r in nt)
