"""ops/fusion.py (truth discovery), ops/relations.py (Hearst
hyponymy), and ops/content.table_to_triples (infobox mining)."""
import pytest
from pyspark.sql import functions as F

from rdf_spark.ops.content import extract_tables, table_to_triples
from rdf_spark.ops.fusion import fuse_assertions, value_conflicts
from rdf_spark.ops.relations import hearst_candidates, hyponymy_triples


def _assertions(spark, rows):
    return spark.createDataFrame(
        rows, "s string, p string, o string, source string, trust int"
    )


class TestFusion:
    def test_weighted_vote_and_dedup(self, spark):
        df = _assertions(spark, [
            ("urn:o:1", "urn:p", "O", "a", 3),
            ("urn:o:1", "urn:p", "O", "a", 3),   # duplicate vote: once
            ("urn:o:1", "urn:p", "O", "b", 2),
            ("urn:o:1", "urn:p", "X", "c", 4),
        ])
        [r] = fuse_assertions(df).collect()
        assert (r.o, float(r.support), float(r.total)) == ("O", 5.0, 9.0)
        assert r.confidence == pytest.approx(5 / 9)
        assert (r.n_values, r.n_sources) == (2, 3)

    def test_source_dedup_keeps_max_trust(self, spark):
        df = _assertions(spark, [
            ("s", "p", "v", "a", 1),
            ("s", "p", "v", "a", 7),   # same source, higher trust wins
            ("s", "p", "w", "b", 6),
        ])
        [r] = fuse_assertions(df).collect()
        assert (r.o, float(r.support)) == ("v", 7.0)

    def test_tie_breaks_lexicographically_smallest(self, spark):
        df = _assertions(spark, [
            ("s", "p", "bbb", "a", 2),
            ("s", "p", "aaa", "b", 2),
        ])
        [r] = fuse_assertions(df).collect()
        assert r.o == "aaa" and r.confidence == pytest.approx(0.5)

    def test_null_values_are_not_votes(self, spark):
        df = _assertions(spark, [
            ("s", "p", None, "a", 9),
            ("s", "p", "v", "b", 1),
        ])
        [r] = fuse_assertions(df).collect()
        assert (r.o, r.n_values, r.n_sources) == ("v", 1, 1)

    def test_majority_vote_without_trust(self, spark):
        df = _assertions(spark, [
            ("s", "p", "v", "a", 9),   # trust column ignored
            ("s", "p", "w", "b", 1),
            ("s", "p", "w", "c", 1),
        ])
        [r] = fuse_assertions(df, trust_col=None).collect()
        assert (r.o, float(r.support), float(r.total)) == ("w", 2.0, 3.0)

    def test_conflicts_lists_only_contested_facts(self, spark):
        df = _assertions(spark, [
            ("s1", "p", "v", "a", 1),
            ("s1", "p", "w", "b", 1),
            ("s2", "p", "v", "a", 1),   # uncontested: absent
        ])
        rows = value_conflicts(df).orderBy("o").collect()
        assert [(r.s, r.o, r.n_values) for r in rows] == [
            ("s1", "v", 2), ("s1", "w", 2)]


_DOCS = [
    (1, "lowercase organic text only, no matches here"),
    (2, "Vendors such as Alpha, Beta and Gamma ship parts."),
    (3, "Delta and other Carriers run routes."),
    (4, "Tools including Epsilon work. Regions, especially Zeta, grow."),
    (5, "Such Firms as Eta and Theta exist."),
    (6, "Metals such as Iron or Copper conduct."),
    (7, "Vendors such as Alpha resell."),   # repeat pair: support 2
]


class TestHearst:
    @pytest.fixture()
    def docs(self, spark):
        return spark.createDataFrame(_DOCS, "doc_id long, text string")

    def test_all_five_patterns(self, spark, docs):
        rows = hearst_candidates(docs).collect()
        got = {(r.hyponym, r.hypernym, r.pattern) for r in rows}
        assert got == {
            ("Alpha", "Vendors", "such_as"),
            ("Beta", "Vendors", "such_as"),
            ("Gamma", "Vendors", "such_as"),
            ("Delta", "Carriers", "and_other"),
            ("Epsilon", "Tools", "including"),
            ("Zeta", "Regions", "especially"),
            ("Eta", "Firms", "such_np_as"),
            ("Theta", "Firms", "such_np_as"),
            ("Iron", "Metals", "such_as"),
            ("Copper", "Metals", "such_as"),
        }
        # bag semantics: the repeated Alpha/Vendors pair is two rows
        assert len(rows) == 11

    def test_no_false_positives_on_lowercase(self, spark):
        docs = spark.createDataFrame(
            [(1, "things such as stuff and junk, and other matter")],
            "doc_id long, text string")
        assert hearst_candidates(docs).count() == 0

    def test_triples_aggregate_support(self, spark, docs):
        t = {(r.s, r.o): r.support for r in hyponymy_triples(docs).collect()}
        assert t[("urn:hearst:Alpha", "urn:hearst:Vendors")] == 2
        assert t[("urn:hearst:Beta", "urn:hearst:Vendors")] == 1

    def test_min_support_filters(self, spark, docs):
        rows = hyponymy_triples(docs, min_support=2).collect()
        assert [(r.s, r.o) for r in rows] == [
            ("urn:hearst:Alpha", "urn:hearst:Vendors")]


class TestTableToTriples:
    def _cells(self, spark, html, url="u1"):
        pages = spark.createDataFrame([(url, html)], "url string, html string")
        return extract_tables(pages)

    def test_header_table_rows(self, spark):
        cells = self._cells(
            spark,
            "<table><tr><th>Order Status</th><th>Total Price</th><th></th>"
            "</tr><tr><td>O</td><td>123.45</td><td>no-header-col</td></tr>"
            "<tr><td>F</td><td></td></tr></table>"
            "<table><tr><td>loner</td></tr></table>",
        )
        rows = table_to_triples(cells).orderBy("s", "p").collect()
        assert [(r.s, r.p, r.o) for r in rows] == [
            ("u1#table-0-row-1", "urn:table:p:order_status", "O"),
            ("u1#table-0-row-1", "urn:table:p:total_price", "123.45"),
            ("u1#table-0-row-2", "urn:table:p:order_status", "F"),
        ]
        r = rows[0]
        assert (r.s_kind, r.o_kind, r.o_datatype, r.o_lang) == (
            1, 2, None, None)

    def test_key_column_mode(self, spark):
        cells = self._cells(
            spark,
            "<table><tr><th>Name</th><th>Pop</th><th>Area</th></tr>"
            "<tr><td>Oslo City</td><td>700k</td><td>454</td></tr>"
            "<tr><td></td><td>keyless-dropped</td><td>1</td></tr></table>",
        )
        rows = table_to_triples(
            cells, subject_from_first_col=True).orderBy("p").collect()
        assert [(r.s, r.p, r.o) for r in rows] == [
            ("u1#oslo_city", "urn:table:p:area", "454"),
            ("u1#oslo_city", "urn:table:p:pop", "700k"),
        ]

    def test_subj_base_override(self, spark):
        cells = self._cells(
            spark,
            "<table><tr><th>K</th><th>V</th></tr>"
            "<tr><td>a</td><td>1</td></tr></table>",
        )
        [r] = table_to_triples(
            cells, subject_from_first_col=True, subj_base="urn:e:"
        ).collect()
        assert r.s == "urn:e:a"


def test_fuse_job_entrypoint(spark, tmp_path):
    """jobs/fuse_job.py: fused winners + conflicts audit + canonical
    triples sidecar, with a confidence floor."""
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import fuse_job

    spark.createDataFrame([
        ("urn:o1", "urn:p", "A", "s1", 3),
        ("urn:o1", "urn:p", "B", "s2", 4),
        ("urn:o2", "urn:p", "C", "s1", 1),
    ], "s string, p string, o string, source string, trust int"
    ).write.parquet(str(tmp_path / "a"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = fuse_job.main([
            "--assertions", str(tmp_path / "a"),
            "--out", str(tmp_path / "f"),
            "--conflicts", str(tmp_path / "c"),
            "--triples-out", str(tmp_path / "t"),
            "--min-confidence", "0.5",
        ])
    assert rc == 0
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["facts"] == 2 and stats["contested_facts"] == 1
    rows = {(r.s, r.o) for r in spark.read.parquet(
        str(tmp_path / "f")).collect()}
    assert rows == {("urn:o1", "B"), ("urn:o2", "C")}
    t = spark.read.parquet(str(tmp_path / "t"))
    assert t.count() == 2
    assert set(t.columns) == {
        "s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang"}
