"""Spark-layer tests: sources (vectorized NT scan, document Turtle parse),
encoders (column-level NT serialization, Turtle encoder), canonical ops
(skolemize, dedup, validation)."""

import os

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from rdf_spark import canonical, encoders, sources, terms

NT_DOC = """# a small graph
<http://example/s> <http://example/p> <http://example/o> .
<http://example/s> <http://example/p> "hei"@nb-no .
_:b1 <http://example/p2> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://example/s> <http://example/p> <http://example/o> .
bad line here
"""


def test_read_ntriples_quarantine(spark, tmp_path):
    p = str(tmp_path / "doc.nt")
    with open(p, "w") as f:
        f.write(NT_DOC)
    df = sources.read_ntriples(spark, p)
    rows = df.collect()
    good = [r for r in rows if r.err is None]
    bad = [r for r in rows if r.err is not None]
    assert len(good) == 4
    assert len(bad) == 1
    langs = {r.o_lang for r in good}
    assert "nb-no" in langs


def test_read_ntriples_strict_raises(spark, tmp_path):
    p = str(tmp_path / "doc.nt")
    with open(p, "w") as f:
        f.write(NT_DOC)
    df = sources.read_ntriples(spark, p, errors="strict")
    with pytest.raises(Exception):
        df.collect()


def test_parse_documents_turtle(spark):
    docs = spark.createDataFrame(
        [
            ("http://ex.org/a", "@prefix f: <http://f/> . <s> f:p 'x', [f:q 1] ."),
            ("http://ex.org/b", "<s> <http://f/p> 'y' ."),
            ("http://ex.org/bad", "@prefix broken"),
        ],
        ["url", "text"],
    )
    out = sources.parse_documents(docs, fmt="turtle").collect()
    errs = [r for r in out if r.err is not None]
    good = [r for r in out if r.err is None]
    assert len(errs) == 1 and errs[0].url == "http://ex.org/bad"
    # relative IRI <s> resolved against url base by naive concat (ttl.go:240)
    assert {r.s for r in good} == {"http://ex.org/as", "http://ex.org/bs", "_:b1"}
    # per-document bnode counter restarts (both docs independent)
    assert [r for r in good if r.s == "_:b1"]


def test_skolemize_deterministic(spark):
    docs = spark.createDataFrame(
        [
            ("http://ex.org/a", "_:x <http://p> _:x ."),
            ("http://ex.org/b", "_:x <http://p> _:y ."),
        ],
        ["url", "text"],
    )
    tri = sources.parse_documents(docs, fmt="ntriples", base_from_url=False)
    sk = canonical.skolemize(tri).collect()
    by_url = {}
    for r in sk:
        by_url.setdefault(r.url, []).append(r)
    a = by_url["http://ex.org/a"][0]
    assert a.s.startswith(canonical.SKOLEM_PREFIX) and a.s.endswith(":x")
    assert a.s == a.o  # same label, same doc → same skolem IRI
    b = by_url["http://ex.org/b"][0]
    assert b.s != a.s  # same label, different doc → different skolem IRI
    assert a.s_kind == terms.KIND_BLANK  # provenance kept


def test_dedup_and_lineage(spark):
    rows = [
        ("u1", "http://s", 1, "http://p", "v", 2, terms.XSD_STRING, None),
        ("u2", "http://s", 1, "http://p", "v", 2, terms.XSD_STRING, None),
        ("u1", "http://s", 1, "http://p", "w", 2, terms.XSD_STRING, None),
    ]
    df = spark.createDataFrame(rows, "url string, " + terms.TRIPLE_DDL)
    assert canonical.dedup_triples(df.drop("url")).count() == 2
    lin = {r.o: r for r in canonical.dedup_triples(df, keep_lineage=True).collect()}
    assert lin["v"].n_sources == 2 and lin["v"].url == "u1"


def test_nt_roundtrip_via_spark(spark, tmp_path):
    docs = spark.createDataFrame(
        [("u", '<http://s> <http://p> "a\\nb\\"c\\\\d"@en .\n'
                '<http://s> <http://p2> "plain" .\n'
                '_:z <http://p3> <http://o> .')],
        ["url", "text"],
    )
    tri = sources.parse_documents(docs, fmt="ntriples", base_from_url=False).drop("url", "err")
    out = str(tmp_path / "out_nt")
    encoders.write_ntriples(tri, out)
    back = sources.read_ntriples(spark, out)
    a = {tuple(r) for r in tri.collect()}
    b = {tuple(r) for r in back.drop("err").collect()}
    assert a == b


def test_validate_triples(spark):
    rows = [
        ("http://ok", 1, "http://p", "x", 2, None, None),
        ("http://b ad", 1, "http://p", "x", 2, None, None),
        ("http://ok", 1, "http://p", "x", 2, None, "en-gb-x"),  # >1 dash: rdf.go:376
    ]
    df = canonical.validate_triples(spark.createDataFrame(rows, terms.TRIPLE_DDL))
    got = [r.valid for r in df.collect()]
    assert got == [True, False, False]


def test_turtle_encoder_compression(spark):
    ttl = (
        "@prefix f: <http://f/> .\n"
        "<http://x/s> f:a <http://x/o1> ; f:a <http://x/o2> ; f:b 'v' .\n"
        "<http://x/t> a f:T .\n"
    )
    docs = spark.createDataFrame([("u", ttl)], ["url", "text"])
    tri = sources.parse_documents(docs, fmt="turtle").drop("url", "err")
    text = encoders.encode_turtle_pdf(tri.toPandas())
    # prefix directives minted as ns%d, rdf:type as 'a', object lists with ','
    assert "@prefix ns0:" in text
    assert "\ta\t" in text or "\ta " in text
    assert " ,\n\t" in text
    # round-trip: reparse the encoded Turtle → same canonical triple set
    docs2 = spark.createDataFrame([("u", text)], ["url", "text"])
    tri2 = sources.parse_documents(docs2, fmt="turtle").drop("url", "err")
    assert {tuple(r) for r in tri.collect()} == {tuple(r) for r in tri2.collect()}


def test_histograms(spark):
    rows = [
        ("http://a/s", 1, "http://a/p", "http://b#x", 1, None, None),
        ("http://a/s2", 1, "http://a/p", "v", 2, None, None),
    ]
    df = spark.createDataFrame(rows, terms.TRIPLE_DDL)
    ph = canonical.predicate_histogram(df).collect()
    assert ph[0].p == "http://a/p" and ph[0].n == 2
    ns = {r.ns: r.n for r in canonical.namespace_histogram(df).collect()}
    assert ns["http://a/"] == 4  # 2 subjects + 2 predicates
    assert ns["http://b#"] == 1


def test_with_salt_deterministic(spark):
    from rdf_spark.ops.skew import with_salt

    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    s1 = {(r.k, r.part_salt) for r in with_salt(df, 16).collect()}
    s2 = {(r.k, r.part_salt) for r in with_salt(df, 16).collect()}
    assert s1 == s2  # row-hash salt, not rand(): idempotent across runs
    assert all(0 <= s < 16 for _, s in s1)


def test_typed_object_col_casts(spark):
    from rdf_spark import canonical, terms

    rows = [
        ("42", terms.XSD_INTEGER), ("-7", terms.XSD_INT),
        ("2.5", terms.XSD_DOUBLE), ("1.50", terms.XSD_DECIMAL),
        ("true", terms.XSD_BOOLEAN), ("oops", terms.XSD_INTEGER),
    ]
    df = spark.createDataFrame(rows, "o string, dt string")
    out = {}
    for lex, dt in rows:
        v = df.filter(F.col("o") == lex).select(
            canonical.typed_object_col(dt).alias("t")
        ).first().t
        out[lex] = v
    assert out["42"] == 42 and out["-7"] == -7
    assert out["2.5"] == 2.5 and float(out["1.50"]) == 1.5
    assert out["true"] is True


def test_typed_object_byte_and_dateformat(spark):
    from rdf_spark import canonical, terms

    df = spark.createDataFrame([("Pé",), ("ab",)], ["o"])
    got = df.select(canonical.typed_object_col(terms.XSD_BYTE).alias("b")).collect()
    assert [bytes(r.b) for r in got] == ["Pé".encode(), b"ab"]

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df2 = spark.createDataFrame([("03/15/2024 10:30:00",)], ["o"])
    ts = df2.select(
        canonical.typed_object_col(
            terms.XSD_DATETIME, date_format="MM/dd/yyyy HH:mm:ss"
        ).alias("t")
    ).collect()[0].t
    assert (ts.year, ts.month, ts.day, ts.hour, ts.minute) == (2024, 3, 15, 10, 30)
    # default patterns still work when an override is present
    df3 = spark.createDataFrame([("2024-03-15T10:30:00",)], ["o"])
    ts3 = df3.select(
        canonical.typed_object_col(
            terms.XSD_DATETIME, date_format="MM/dd/yyyy HH:mm:ss"
        ).alias("t")
    ).collect()[0].t
    assert ts3 is not None


def test_literal_object_cols_inference(spark):
    """C6: NewLiteral's Go-value→(lexical, datatype) inference table
    (rdf.go:342-359) from typed Spark columns."""
    import datetime
    import decimal

    from rdf_spark import canonical, terms

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.createDataFrame(
        [(True, 42, 2.5, decimal.Decimal("1.50"), "s",
          datetime.datetime(2024, 3, 15, 10, 30), b"\x01A")],
        "c_bool boolean, c_long long, c_dbl double, c_dec decimal(10,2), "
        "c_str string, c_ts timestamp, c_bin binary",
    )
    expect = {
        "c_bool": ("true", terms.XSD_BOOLEAN),
        "c_long": ("42", terms.XSD_INTEGER),
        "c_dbl": ("2.5", terms.XSD_DOUBLE),
        "c_dec": ("1.50", terms.XSD_DECIMAL),
        "c_str": ("s", terms.XSD_STRING),
        "c_ts": ("2024-03-15T10:30:00Z", terms.XSD_DATETIME),
        "c_bin": ("\x01A", terms.XSD_BYTE),
    }
    for col, (lex, dt) in expect.items():
        cols = canonical.literal_object_cols(df, col)
        row = df.select(
            cols["o"].alias("o"), cols["o_kind"].alias("k"),
            cols["o_datatype"].alias("dt"), cols["o_lang"].alias("lang")
        ).collect()[0]
        assert (row.o, row.k, row.dt, row.lang) == (lex, 2, dt, None), col

    import pytest as _pytest

    arr = spark.createDataFrame([([1, 2],)], "c array<long>")
    with _pytest.raises(ValueError):
        canonical.literal_object_cols(arr, "c")
