"""RDFa Lite → RDF (rdf_spark/rdfa.py): walker semantics, the Spark
stage, and the pipeline extra_fmts route."""

from pyspark.sql import functions as F

from rdf_spark import datagen, pipeline
from rdf_spark.rdfa import parse_rdfa, parse_rdfa_html
from rdf_spark.terms import RDF_TYPE, XSD_STRING


DOC = """<html><body vocab="http://schema.org/" prefix="og: http://ogp.me/ns#">
<div typeof="Person" about="/people/ada">
  <span property="name">Ada <b>Lovelace</b></span>
  <a property="url" href="ada.html">home</a>
  <meta property="og:type" content="profile">
  <div property="knows" typeof="Person"><span property="name">Charles</span></div>
</div>
<p property="description">doc-level</p>
<span property="nope:x">undeclared prefix dropped</span>
</body></html>"""


def test_walker_core():
    got = parse_rdfa_html(DOC, base="https://ex.com/people/")
    ada = "https://ex.com/people/ada"
    m = {(s, p): (o, ok) for s, _, p, o, ok, *_ in got}
    assert m[(ada, RDF_TYPE)] == ("http://schema.org/Person", 1)
    assert m[(ada, "http://schema.org/name")] == ("Ada Lovelace", 2)
    # href object resolved against base
    assert m[(ada, "http://schema.org/url")] == (
        "https://ex.com/people/ada.html", 1)
    # CURIE via declared prefix; content attribute literal
    assert m[(ada, "http://ogp.me/ns#type")] == ("profile", 2)
    # chaining: property+typeof mints the object node
    assert m[(ada, "http://schema.org/knows")] == ("_:ra1", 0)
    assert m[("_:ra1", "http://schema.org/name")] == ("Charles", 2)
    # the document itself is the default subject
    assert m[("https://ex.com/people/", "http://schema.org/description")] == (
        "doc-level", 2)
    # undeclared prefix terms are dropped (spec), not invented
    assert not any(p.endswith("nope:x") or "nope" in p for _, _, p, *_ in got)


def test_walker_lang_and_scoping():
    got = parse_rdfa_html(
        '<div vocab="urn:v:" lang="de"><i property="a">x</i>'
        '<i property="b" xml:lang="fr">y</i></div>'
        '<span property="loose">no vocab in scope</span>'
    )
    by_p = {p: (o, dt, lang) for _, _, p, o, _, dt, lang in got}
    assert by_p["urn:v:a"][2] == "de"
    assert by_p["urn:v:b"][2] == "fr"
    # no vocabulary in scope → bare term dropped entirely
    assert list(by_p) == ["urn:v:a", "urn:v:b"]
    # vocab scope ends with its element
    got2 = parse_rdfa_html(
        '<div vocab="urn:v:"><i property="in">x</i></div>'
        '<i property="out">y</i>'
    )
    assert [p for _, _, p, *_ in got2] == ["urn:v:in"]


def test_walker_recovery():
    # unclosed at EOF flushes; absolute property IRIs pass through
    got = parse_rdfa_html('<div vocab="urn:v:"><b property="a://p">Ada')
    assert got == [(("" ), 1, "a://p", "Ada", 2, XSD_STRING, None)] or \
        got == [("", 1, "a://p", "Ada", 2, XSD_STRING, None)]
    # bare resource re-anchors the subject without typeof
    got = parse_rdfa_html(
        '<div vocab="urn:v:" resource="urn:thing:1">'
        '<span property="k">v</span></div>'
    )
    assert got == [("urn:thing:1", 1, "urn:v:k", "v", 2, XSD_STRING, None)]


def test_spark_stage(spark):
    pages = spark.createDataFrame(
        [("https://r.example/d", DOC), ("https://r.example/none", "<p>x</p>")],
        "url string, html string",
    )
    out = parse_rdfa(pages)
    assert out.filter(F.col("url") == "https://r.example/none").count() == 0
    got = out.filter(F.col("p") == "http://schema.org/knows").collect()
    assert len(got) == 1 and got[0].o == "_:ra1" and got[0].o_kind == 0
    bpages = pages.select("url", F.encode("html", "utf-8").alias("html"))
    assert parse_rdfa(bpages).count() == out.count()


def test_pipeline_rdfa_route(spark, tmp_path):
    df = spark.range(24)
    html = F.concat(
        F.lit('<html><body vocab="http://schema.org/">'
              '<div typeof="Product" about="urn:prod:'), F.col("id"),
        F.lit('"><span property="sku">sku-'), F.col("id"),
        F.lit('</span><div property="brand" typeof="Brand">'
              '<span property="name">B</span></div></div>'
              "<p>About Barbara Liskov.</p></body></html>"),
    )
    pages = df.select(
        F.concat(F.lit("https://ra.example/p/"), F.col("id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
    out = str(tmp_path / "kg_ra")
    pipeline.run_pipeline(
        spark, pages, datagen.aliases(spark), out,
        n_shards=2, n_buckets=4, extra_fmts=("rdfa",),
    )
    store = pipeline.read_triple_store(spark, out)
    assert store.filter(F.col("p") == "http://schema.org/sku").count() == 24
    brands = store.filter(F.col("p") == "http://schema.org/brand")
    assert brands.count() == 24
    # chained Brand bnodes skolemized per page, never raw
    assert store.filter(F.col("o").startswith("_:")).count() == 0
    assert brands.select("o").distinct().count() == 24
