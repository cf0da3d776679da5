"""Microdata → RDF (rdf_spark/microdata.py): the itemscope/itemprop
walker, its Spark stage, and the pipeline extra_fmts route."""

from pyspark.sql import functions as F

from rdf_spark import datagen, pipeline
from rdf_spark.microdata import parse_microdata, parse_microdata_html
from rdf_spark.terms import RDF_TYPE, XSD_STRING


ORG = """<div itemscope itemtype="http://schema.org/Organization" itemid="urn:org:7">
  <span itemprop="name">Acme <b>Corp</b></span>
  <a itemprop="url" href="/about">site</a>
  <meta itemprop="tick" content="42">
  <time itemprop="founded" datetime="1999-01-02">Jan 2, 1999</time>
  <div itemprop="address" itemscope>
    <span itemprop="locality">Metropolis</span>
  </div>
</div>"""


def test_walker_core():
    got = parse_microdata_html(ORG, base="https://ex.com/a/b")
    assert (
        "urn:org:7", 1, RDF_TYPE, "http://schema.org/Organization", 1, None, None
    ) in got
    as_map = {(s, p): (o, ok) for s, _, p, o, ok, *_ in got}
    # nested tags stripped + whitespace squashed in text values
    assert as_map[("urn:org:7", "http://schema.org/name")] == ("Acme Corp", 2)
    # href/itemid resolved against the page url
    assert as_map[("urn:org:7", "http://schema.org/url")] == (
        "https://ex.com/about", 1)
    assert as_map[("urn:org:7", "http://schema.org/tick")] == ("42", 2)
    assert as_map[("urn:org:7", "http://schema.org/founded")] == ("1999-01-02", 2)
    # untyped nested item inherits the schema.org vocabulary
    assert as_map[("urn:org:7", "http://schema.org/address")] == ("_:md1", 0)
    assert as_map[("_:md1", "http://schema.org/locality")] == ("Metropolis", 2)


def test_walker_edge_cases():
    # multi-name itemprop, absolute property passthrough
    got = parse_microdata_html(
        '<div itemscope itemtype="urn:v:T#"><i itemprop="a a://b">x</i></div>'
    )
    preds = {p for _, _, p, *_ in got}
    assert preds == {RDF_TYPE, "urn:v:T#a", "a://b"}
    # itemprop outside any itemscope is ignored
    assert parse_microdata_html('<p itemprop="x">loose</p>') == []
    # no vocabulary anywhere → urn:md: fallback
    got = parse_microdata_html('<b itemscope><i itemprop="k">v</i></b>')
    assert got == [("_:md1", 0, "urn:md:k", "v", 2, XSD_STRING, None)]
    # unclosed elements at EOF still flush their pending text property
    got = parse_microdata_html('<div itemscope><span itemprop="n">Ada')
    assert got == [("_:md1", 0, "urn:md:n", "Ada", 2, XSD_STRING, None)]
    # stray end tags are ignored, not fatal
    got = parse_microdata_html(
        '</b><div itemscope></i><span itemprop="n">x</span></div>'
    )
    assert len(got) == 1 and got[0][3] == "x"
    # nested property text: outer collects all, inner only its own
    got = parse_microdata_html(
        '<div itemscope><b itemprop="o">x <i itemprop="i">y</i></b></div>'
    )
    vals = {p: o for _, _, p, o, *_ in got}
    assert vals == {"urn:md:o": "x y", "urn:md:i": "y"}


def test_spark_stage(spark):
    pages = spark.createDataFrame(
        [
            ("https://m.example/1", ORG),
            ("https://m.example/none", "<p>no items here</p>"),
        ],
        "url string, html string",
    )
    out = parse_microdata(pages)
    assert out.filter(F.col("url") == "https://m.example/none").count() == 0
    got = out.filter(F.col("p") == "http://schema.org/locality").collect()
    assert len(got) == 1 and got[0].o == "Metropolis" and got[0].err is None
    # binary html column accepted too
    bpages = pages.select("url", F.encode("html", "utf-8").alias("html"))
    assert parse_microdata(bpages).count() == out.count()


def test_pipeline_microdata_route(spark, tmp_path):
    df = spark.range(30)
    html = F.concat(
        F.lit('<html><body><div itemscope itemtype="http://schema.org/Product"'
              ' itemid="urn:prod:'), F.col("id"),
        F.lit('"><span itemprop="sku">sku-'), F.col("id"),
        F.lit('</span><div itemprop="maker" itemscope>'
              '<span itemprop="alias">m</span></div></div>'
              "<p>About Donald Knuth.</p></body></html>"),
    )
    pages = df.select(
        F.concat(F.lit("https://md.example/p/"), F.col("id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
    out = str(tmp_path / "kg_md")
    pipeline.run_pipeline(
        spark, pages, datagen.aliases(spark), out,
        n_shards=2, n_buckets=4, extra_fmts=("microdata",),
    )
    store = pipeline.read_triple_store(spark, out)
    assert store.filter(F.col("p") == "http://schema.org/sku").count() == 30
    # nested blank maker skolemized (no raw labels) and distinct per page
    makers = store.filter(F.col("p") == "http://schema.org/maker")
    assert makers.count() == 30
    assert store.filter(F.col("o").startswith("_:")).count() == 0
    assert makers.select("o").distinct().count() == 30
