"""HTML structured-data island + link extraction (ops/html.py).

The web-KG entry point: ``<script type="application/ld+json">`` /
``text/turtle`` islands → canonical triples, ``<a href>`` anchors →
host link graph.  Includes a differential test against the pipeline's
own turtle-block extractor over the datagen corpus.
"""

import pytest
from pyspark.sql import functions as F

from rdf_spark import datagen, sources
from rdf_spark.ops import html as H


PAGE = """<html><head>
<script type="application/ld+json">{"@id":"urn:x:1","urn:p:n":"one"}</script>
<SCRIPT data-x=1 TYPE='application/ld+json'>[{"@id":"urn:x:2","urn:p:n":2}]</SCRIPT>
<script type="text/turtle"><urn:t:1> <urn:p:k> "v" .</script>
<script src="app.js"></script>
</head><body>
<a href="https://Other.com:443/z?utm_src=t&b=1#frag">x</a>
<a class=c HREF='//cdn.ex.com/lib.js'>y</a>
<a href="/root.html">r</a>
<a href="rel/doc.html">rel</a>
<a href="#top">self</a>
<a href="">empty</a>
<a href="mailto:a@b.c">m</a>
</body></html>"""


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        [
            ("https://ex.com/a/page1", PAGE),
            ("https://ex.com/empty", "<html><body>plain</body></html>"),
        ],
        "url string, html string",
    )


def test_extract_script_blocks(pages):
    rows = (
        H.extract_script_blocks(pages, "jsonld")
        .orderBy("url", "block")
        .collect()
    )
    # case-insensitive tag/attr, both quote styles, extra attributes; the
    # plain src= script and the turtle block are not jsonld islands
    assert [(r.url, r.block) for r in rows] == [
        ("https://ex.com/a/page1", 0),
        ("https://ex.com/a/page1", 1),
    ]
    assert rows[0].text == '{"@id":"urn:x:1","urn:p:n":"one"}'
    assert rows[1].text.startswith("[{")
    ttl = H.extract_script_blocks(pages, "turtle").collect()
    assert len(ttl) == 1 and "<urn:t:1>" in ttl[0].text
    with pytest.raises(ValueError):
        H.extract_script_blocks(pages, "rdfa")


def test_parse_html_structured(pages):
    out = H.parse_html_structured(pages)
    ok = out.filter(F.col("err").isNull()).orderBy("s").collect()
    assert [(r.s, r.p, r.o, r.fmt) for r in ok] == [
        ("urn:t:1", "urn:p:k", "v", "turtle"),
        ("urn:x:1", "urn:p:n", "one", "jsonld"),
        ("urn:x:2", "urn:p:n", "2", "jsonld"),
    ]
    # pages without islands contribute nothing (not even an err row)
    assert out.filter(F.col("url") == "https://ex.com/empty").count() == 0


def test_parse_html_structured_quarantine(spark):
    pages = spark.createDataFrame(
        [
            ("u:bad", '<script type="application/ld+json">{nope</script>'),
            ("u:good", '<script type="application/ld+json">{"@id":"urn:g","urn:p:v":7}</script>'),
        ],
        "url string, html string",
    )
    out = H.parse_html_structured(pages, fmts=("jsonld",))
    assert out.filter((F.col("url") == "u:bad") & F.col("err").isNotNull()).count() == 1
    good = out.filter(F.col("url") == "u:good").collect()
    assert len(good) == 1 and good[0].err is None and good[0].s == "urn:g"


def test_extract_links_resolution(pages):
    got = {
        r.href
        for r in H.extract_links(pages).collect()
    }
    assert got == {
        "https://Other.com:443/z?utm_src=t&b=1",  # absolute: fragment cut, else raw
        "https://cdn.ex.com/lib.js",              # protocol-relative gets page scheme
        "https://ex.com/root.html",               # root-relative gets origin
        "https://ex.com/a/rel/doc.html",          # relative resolves in page dir
    }  # fragment-only, empty, and mailto anchors are dropped


def test_extract_links_pathless_page(spark):
    pages = spark.createDataFrame(
        [("https://ex.com", '<a href="x.html">x</a><a href="/y">y</a>')],
        "url string, html string",
    )
    got = {r.href for r in H.extract_links(pages).collect()}
    assert got == {"https://ex.com/x.html", "https://ex.com/y"}


def test_extract_links_unresolved(pages):
    raw = {r.href for r in H.extract_links(pages, resolve=False).collect()}
    assert "#top" in raw and "mailto:a@b.c" in raw and "rel/doc.html" in raw


def test_host_link_graph(spark):
    html = (
        '<a href="https://B.example:443/1">1</a>'
        '<a href="https://b.example/2?utm_x=1">2</a>'
        '<a href="/self">s</a>'
        '<a href="//c.example/x">c</a>'
    )
    pages = spark.createDataFrame(
        [("https://a.example/p", html)], "url string, html string"
    )
    got = {(r.src, r.dst): r.n_links for r in H.host_link_graph(pages).collect()}
    # the two b.example spellings collapse post-normalization; self dropped
    assert got == {("a.example", "b.example"): 2, ("a.example", "c.example"): 1}
    with_self = {
        (r.src, r.dst): r.n_links
        for r in H.host_link_graph(pages, keep_self=True).collect()
    }
    assert with_self[("a.example", "a.example")] == 1


def test_datagen_differential_vs_pipeline_extractor(spark):
    """The html-ops turtle route must produce exactly the triples of the
    pipeline's own extract_turtle_blocks path over the datagen corpus —
    same islands, same quarantine decisions."""
    from rdf_spark.extraction import extract_stage

    pages = datagen.pages(spark, 80)
    via_html = H.parse_html_structured(pages, fmts=("turtle",))
    staged = extract_stage(pages).select("url", F.col("rdf_text").alias("text"))
    via_pipeline = sources.parse_documents(staged.filter(F.col("text") != ""), fmt="turtle")

    cols = ["url", "s", "s_kind", "p", "o", "o_kind", "o_datatype", "o_lang"]
    a = {tuple(r) for r in via_html.filter(F.col("err").isNull()).select(*cols).collect()}
    b = {tuple(r) for r in via_pipeline.filter(F.col("err").isNull()).select(*cols).collect()}
    assert a == b and len(a) > 300
    bad_a = {r.url for r in via_html.filter(F.col("err").isNotNull()).select("url").collect()}
    bad_b = {r.url for r in via_pipeline.filter(F.col("err").isNotNull()).select("url").collect()}
    assert bad_a == bad_b and bad_a


def test_extract_anchor_texts(spark):
    pages = spark.createDataFrame(
        [(
            "u1",
            '<a href="https://a/x"> The  <b>Ada</b> Lovelace page </a>'
            '<a href="/y">plain</a><a href="z">unclosed',
        )],
        "url string, html string",
    )
    rows = {(r.href, r.anchor_text) for r in H.extract_anchor_texts(pages).collect()}
    # inner tags stripped, whitespace squashed, unclosed anchor dropped
    assert rows == {
        ("https://a/x", "The Ada Lovelace page"),
        ("/y", "plain"),
    }


def test_anchor_link_priors(spark):
    mk = lambda t, h: f'<a href="{h}">{t}</a>'  # noqa: E731
    rows = [
        ("https://p.example/1",
         mk("Ada", "https://T.example:443/e/ada?utm_x=1")
         + mk("Ada", "https://t.example/e/ada")
         + mk("Ada", "https://other.example/ada-l")
         + mk("rare", "https://x.example/r")),
        ("https://p.example/2", mk("Ada", "https://t.example/e/ada")),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    got = {
        (r.surface, r.entity_iri): (r.n, r.prior)
        for r in H.anchor_link_priors(pages).collect()
    }
    # the three t.example spellings collapse under canonicalization
    assert got[("Ada", "https://t.example/e/ada")] == (3, 0.75)
    assert got[("Ada", "https://other.example/ada-l")] == (1, 0.25)
    assert got[("rare", "https://x.example/r")] == (1, 1.0)
    # min_count prunes the tail AFTER the denominator is fixed
    kept = {
        (r.surface, r.entity_iri): (r.n, r.prior)
        for r in H.anchor_link_priors(pages, min_count=2).collect()
    }
    assert kept == {("Ada", "https://t.example/e/ada"): (3, 0.75)}
    # output schema is the pipeline gazetteer contract
    assert {"surface", "entity_iri", "prior"} <= set(kept and
        H.anchor_link_priors(pages).columns)


def test_empty_islands_do_not_poison_page(spark):
    pages = spark.createDataFrame(
        [(
            "u:e",
            '<script type="application/ld+json"></script>'
            '<script type="application/ld+json">  </script>'
            '<script type="application/ld+json">{"@id":"urn:k","urn:p:v":1}</script>',
        ), ("u:only-empty", '<script type="application/ld+json"></script>')],
        "url string, html string",
    )
    out = H.parse_html_structured(pages, fmts=("jsonld",)).collect()
    # blank stubs are dropped, the real island still parses, no err rows
    assert [(r.url, r.s, r.err) for r in out] == [("u:e", "urn:k", None)]


def test_decode_html_charset_sniffing(spark):
    """BOM > meta prescan > utf-8; latin-1 label upgraded to cp1252."""
    from rdf_spark.ops.html import decode_html

    rows = [
        ("u0", ('<meta charset="utf-8"><p>café</p>').encode("utf-8")),
        # iso-8859-1 label must decode as cp1252: 0x80 is € there
        ("u1", b'<meta charset="iso-8859-1"><p>\x80\xe9</p>'),
        ("u2", "﻿<p>☃</p>".encode("utf-16-le")),  # LE BOM
        ("u3", "﻿<p>☃</p>".encode("utf-16-be")),  # BE BOM
        ("u4", "<p>pla✓in</p>".encode("utf-8")),            # no meta
        ("u5", b'<meta charset="bogus"><p>x\xff</p>'),       # unknown label
        ("u6", None),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = dict(
        (r.url, r.html_text)
        for r in decode_html(pages).select("url", "html_text").collect()
    )
    assert got["u0"] == '<meta charset="utf-8"><p>café</p>'
    assert got["u1"] == '<meta charset="iso-8859-1"><p>€é</p>'
    assert got["u2"] == "<p>☃</p>"  # BOM consumed, not content
    assert got["u3"] == "<p>☃</p>"
    assert got["u4"] == "<p>pla✓in</p>"
    assert got["u5"] == '<meta charset="bogus"><p>x�</p>'  # replace
    assert got["u6"] is None

    # a string column is a contract violation, not a silent no-op
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_html(pages.withColumn("html", F.lit("x")))


def test_extract_page_meta(spark):
    from rdf_spark.ops.html import extract_page_meta

    rows = [
        # both attribute orders, entities in title, relative canonical
        ("https://e.example/a/b", """
            <title> Caf&eacute;  &amp; &quot;Bar&quot;\n page </title>
            <meta name="description" content="A &amp; B">
            <meta content="OG &#39;T&#39;" property="og:title">
            <link rel="canonical" href="/a/b?x=1">
        """),
        # reversed orders
        ("https://e.example/c", """
            <TITLE>plain</TITLE>
            <meta content="rev desc" name="description">
            <link href="https://other.example/c" rel="canonical">
        """),
        ("https://e.example/none", "<p>nothing here</p>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    got = {r.url: r for r in extract_page_meta(pages).collect()}
    a = got["https://e.example/a/b"]
    # &eacute; is NOT in the documented basic-entity subset — kept raw
    assert a.title == 'Caf&eacute; & "Bar" page'
    assert a.description == "A & B"
    assert a.og_title == "OG 'T'"
    assert a.canonical == "https://e.example/a/b?x=1"
    c = got["https://e.example/c"]
    assert (c.title, c.description, c.canonical, c.og_title) == (
        "plain", "rev desc", "https://other.example/c", None)
    n = got["https://e.example/none"]
    assert (n.title, n.description, n.canonical, n.og_title) == (
        None, None, None, None)
