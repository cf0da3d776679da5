"""Main-content extraction (ops.content): block scoring + Spark stage."""

import pytest
from pyspark.sql import functions as F

from rdf_spark.ops.content import extract_main_text, main_text

LONG = "This paragraph is comfortably longer than the minimum length bar."


def test_boilerplate_dropped_and_article_kept():
    page = (
        '<nav><a href="/">Home</a> <a href="/b">Blog</a></nav>'
        '<div class="breadcrumb"><a href="/">Home</a> &gt; x</div>'
        "<header><h1>Banner</h1></header>"
        f"<article><h2>Headline</h2><p>{LONG}</p>"
        '<p><a href="/x">read</a> <a href="/y">more</a> <a href="/z">here</a></p>'
        "</article>"
        f'<div class="sidebar"><p>{LONG}</p></div>'
        f'<div id="comments-area"><p>{LONG}</p></div>'
        f"<footer><p>{LONG}</p></footer>"
    )
    assert main_text(page) == f"Headline\n{LONG}"


def test_link_density_gate():
    linky = '<p><a href="/a">one two three four</a> and barely any prose text</p>'
    assert main_text(linky) == ""
    prose_with_link = (f'<p>{LONG} <a href="/a">tiny link</a> {LONG}</p>')
    assert main_text(prose_with_link) != ""


def test_neighbour_promotion_needs_following_kept_block():
    # a lone short heading with nothing after it stays dropped
    assert main_text("<h2>Headline</h2>") == ""
    # hinted short blocks are never promoted
    page = f'<h2 class="share">Share me</h2><p>{LONG}</p>'
    assert main_text(page) == LONG


def test_hint_token_boundaries():
    # 'download' must not match the 'ad' token; 'ad-banner' must
    page = (f'<div class="download"><p>{LONG}</p></div>'
            f'<div class="ad-banner"><p>{LONG} dropped</p></div>')
    assert main_text(page) == LONG


def test_loose_html_recovery():
    # unclosed tags, void elements, stray end tags: never raises
    assert main_text(f"<div><p>{LONG}<br><hr></span>") == LONG
    assert main_text("<<<>>><p junk") == ""
    assert main_text(None) is None


def test_extract_main_text_stage(spark):
    rows = [
        ("u0", f"<nav><a href='/'>Home</a></nav><p>{LONG}</p>"),
        ("u1", None),
        ("u2", "<p>tiny</p>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    got = {r.url: r.main_text
           for r in extract_main_text(pages).collect()}
    assert got == {"u0": LONG, "u1": None, "u2": ""}
    # binary html decodes utf-8-replace on the way in
    bpages = spark.createDataFrame(
        [("b0", f"<p>{LONG} café</p>".encode())], "url string, html binary")
    [r] = extract_main_text(bpages).collect()
    assert r.main_text == f"{LONG} café"
    # schema: input columns pass through untouched, out_col appended
    assert extract_main_text(pages).columns == ["url", "html", "main_text"]


def test_kg_construct_job_main_text(spark, tmp_path):
    import io
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import kg_construct_job

    html = ("<nav><a href='/'>Home</a></nav>"
            f"<p>{LONG} About Ada Lovelace.</p>"
            f"<footer><p>{LONG}</p></footer>")
    rows = [(f"https://m.example/p/{i}", None, html.encode(), None, "en")
            for i in range(6)]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string")
    src = str(tmp_path / "pages")
    pages.write.parquet(src)
    out = str(tmp_path / "out")
    mt = str(tmp_path / "main_text")
    pm = str(tmp_path / "page_meta")
    with redirect_stdout(io.StringIO()):
        rc = kg_construct_job.main(
            ["--pages", src, "--out", out, "--shards", "1",
             "--buckets", "2", "--main-text", mt, "--page-meta", pm])
    assert rc == 0
    meta = spark.read.parquet(pm)
    assert meta.columns == ["url", "title", "description", "canonical",
                            "og_title"]
    assert meta.count() == 6
    got = spark.read.parquet(mt)
    assert got.columns == ["url", "main_text"]
    assert got.count() == 6
    assert {r.main_text for r in got.collect()} == {f"{LONG} About Ada Lovelace."}


def test_title_skipped_unclosed_head_survives():
    # <title> text must not leak into content (it's metadata), and an
    # UNCLOSED <head> must not swallow the body (html.parser does not
    # auto-close head like browsers do)
    page = f"<head><title>Site Name</title><p>{LONG}</p>"
    assert main_text(page) == LONG


def test_extract_tables(spark):
    from rdf_spark.ops.content import extract_tables, page_tables

    # pure-function recovery cases
    assert page_tables("<td>stray cell, no table</td>") == []
    assert page_tables(
        "<table><tr><td>a<td>b</table>") == [(0, 0, 0, "a"), (0, 0, 1, "b")]

    html = ("<table><tr><th>K</th><th>V</th></tr>"
            "<tr><td>pop</td><td>12 &amp; 3</td></tr></table>"
            "<table><tr><td>second</td></tr></table>")
    pages = spark.createDataFrame(
        [("u0", html), ("u1", None), ("u2", "<p>tableless</p>")],
        "url string, html string")
    got = sorted(tuple(r) for r in extract_tables(pages).collect())
    assert got == [
        ("u0", 0, 0, 0, "K"), ("u0", 0, 0, 1, "V"),
        ("u0", 0, 1, 0, "pop"), ("u0", 0, 1, 1, "12 & 3"),
        ("u0", 1, 0, 0, "second"),
    ]
    # binary html path
    b = spark.createDataFrame(
        [("b0", "<table><tr><td>café</td></tr></table>".encode())],
        "url string, html binary")
    assert [tuple(r) for r in extract_tables(b).collect()] == [
        ("b0", 0, 0, 0, "café")]
