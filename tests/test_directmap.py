"""rdf_spark/directmap.py — W3C Direct Mapping of DataFrames to RDF."""
import datetime

import pytest

from rdf_spark.directmap import direct_map, percent_encode
from rdf_spark.terms import RDF_TYPE, XSD


def _by_pred(rows):
    return {(r.s, r.p): (r.o, r.o_kind, r.o_datatype) for r in rows}


class TestDirectMap:
    def test_pk_row_nodes_and_types(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], "id long, name string")
        rows = direct_map(df, "t", pk=["id"]).collect()
        m = _by_pred(rows)
        assert m[("urn:dm:t/id=1", RDF_TYPE)] == ("urn:dm:t", 1, None)
        assert m[("urn:dm:t/id=1", "urn:dm:t#id")] == (
            "1", 2, XSD + "integer")
        assert m[("urn:dm:t/id=2", "urn:dm:t#name")] == ("beta", 2, None)
        assert all(r.s_kind == 1 for r in rows)

    def test_composite_pk_and_encoding(self, spark):
        df = spark.createDataFrame(
            [("a b", "x/y", 1)], "k1 string, k2 string, v int")
        [s] = {r.s for r in direct_map(df, "t", pk=["k1", "k2"]).collect()}
        assert s == "urn:dm:t/k1=a%20b;k2=x%2Fy"

    def test_no_pk_blank_nodes_merge_duplicates(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", 1), ("b", 2)], "name string, v int")
        rows = direct_map(df, "t").collect()
        subs = {r.s for r in rows}
        assert len(subs) == 2 and all(s.startswith("_:dm") for s in subs)
        assert all(r.s_kind == 0 for r in rows)

    def test_datatype_matrix(self, spark):
        from decimal import Decimal

        df = spark.createDataFrame(
            [(1, 2.5, Decimal("3.10"), True,
              datetime.date(2026, 1, 2),
              datetime.datetime(2026, 1, 2, 3, 4, 5),
              bytearray(b"\x0a\xff"))],
            "i long, d double, dec decimal(10,2), b boolean, "
            "dt date, ts timestamp, bin binary")
        rows = direct_map(df, "t", pk=["i"]).collect()
        m = {r.p: (r.o, r.o_datatype) for r in rows}
        assert m["urn:dm:t#i"] == ("1", XSD + "integer")
        assert m["urn:dm:t#d"] == ("2.5", XSD + "double")
        assert m["urn:dm:t#dec"] == ("3.10", XSD + "decimal")
        assert m["urn:dm:t#b"] == ("true", XSD + "boolean")
        assert m["urn:dm:t#dt"] == ("2026-01-02", XSD + "date")
        assert m["urn:dm:t#ts"] == (
            "2026-01-02T03:04:05", XSD + "dateTime")
        assert m["urn:dm:t#bin"] == ("0aff", XSD + "hexBinary")

    def test_nulls_emit_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, None)], "id long, name string")
        preds = {r.p for r in direct_map(df, "t", pk=["id"]).collect()}
        assert "urn:dm:t#name" not in preds

    def test_foreign_keys(self, spark):
        df = spark.createDataFrame(
            [(1, 7), (2, None)], "id long, ref long")
        rows = direct_map(
            df, "a", pk=["id"], fks={"ref": ("b", "bid")}).collect()
        m = _by_pred(rows)
        assert m[("urn:dm:a/id=1", "urn:dm:a#ref-ref")] == (
            "urn:dm:b/bid=7", 1, None)
        assert ("urn:dm:a/id=2", "urn:dm:a#ref-ref") not in m

    def test_validation(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError):
            direct_map(df, "t", pk=["nope"])
        with pytest.raises(ValueError):
            direct_map(df, "t", fks={"nope": ("b", "bid")})

    def test_single_scan_no_shuffle(self, spark):
        df = spark.createDataFrame([(1, "x")], "id long, name string")
        plan = direct_map(df, "t", pk=["id"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_job_entrypoint(self, spark, tmp_path):
        import io
        import json
        import sys
        from contextlib import redirect_stdout

        sys.path.insert(0, "jobs")
        import direct_map_job

        src = str(tmp_path / "t.parquet")
        spark.createDataFrame(
            [(1, "x", 7), (2, "y", 8)], "id long, name string, ref long"
        ).write.parquet(src)
        out = str(tmp_path / "out_nt")
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = direct_map_job.main([
                "--in", src, "--table", "t", "--pk", "id",
                "--fk", "ref:b:bid", "--out", out,
                "--out-format", "ntriples",
            ])
        assert rc == 0
        stats = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert stats["n_triples"] == 2 * 5  # type + 3 cols + ref
        from rdf_spark import sources

        back = sources.read_ntriples(spark, out)
        assert back.filter("err is null").count() == 10

    def test_output_reserializes(self, spark):
        from rdf_spark.encoders import nt_line_col

        df = spark.createDataFrame([(1, "x")], "id long, name string")
        lines = [
            r[0] for r in direct_map(df, "t", pk=["id"])
            .select(nt_line_col()).collect()
        ]
        assert '<urn:dm:t/id=1> <urn:dm:t#name> "x" .' in lines


class TestReviewRegressions:
    def test_null_columns_do_not_collide_blank_keys(self, spark):
        df = spark.createDataFrame(
            [("x", None), (None, "x")], "a string, b string")
        subs = {r.s for r in direct_map(df, "t").collect()}
        assert len(subs) == 2  # distinct rows, distinct blank nodes

    def test_separator_lookalike_rows_do_not_collide(self, spark):
        df = spark.createDataFrame(
            [("a\x1fb", None), ("a", "b")], "a string, b string")
        subs = {r.s for r in direct_map(df, "t").collect()}
        assert len(subs) == 2

    def test_null_pk_rows_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "x"), (None, "y")], "id long, name string")
        rows = direct_map(df, "t", pk=["id"]).collect()
        assert all(r.s is not None for r in rows)
        assert {r.o for r in rows if r.p == "urn:dm:t#name"} == {"x"}
