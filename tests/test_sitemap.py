"""Sitemap XML parsing (rdf_spark/sitemap.py)."""

import pytest
from pyspark.sql import functions as F

from rdf_spark.sitemap import parse_sitemap_xml, parse_sitemaps

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'

URLSET = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset {NS}>
  <url><loc>https://ex.com/a</loc><lastmod>2026-01-02</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://ex.com/b</loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
  <url><loc>https://ex.com/c</loc><priority>high</priority></url>
</urlset>"""

INDEX = f"""<sitemapindex {NS}>
  <sitemap><loc>https://ex.com/s1.xml</loc><lastmod>2026-02-03</lastmod></sitemap>
  <sitemap><loc>https://ex.com/s2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_core():
    kind, rows = parse_sitemap_xml(URLSET)
    assert kind == "urlset"
    # loc-less entries dropped; unparsable priority → null
    assert rows == [
        ("https://ex.com/a", "2026-01-02", "daily", 0.8),
        ("https://ex.com/b", None, None, None),
        ("https://ex.com/c", None, None, None),
    ]
    kind, rows = parse_sitemap_xml(INDEX)
    assert kind == "sitemapindex"
    assert [r[0] for r in rows] == ["https://ex.com/s1.xml", "https://ex.com/s2.xml"]
    with pytest.raises(Exception):
        parse_sitemap_xml("<rss><item/></rss>")
    with pytest.raises(Exception):
        parse_sitemap_xml("not xml at all <")


def test_spark_stage(spark):
    docs = spark.createDataFrame(
        [
            ("https://ex.com/sitemap.xml", URLSET),
            ("https://ex.com/index.xml", INDEX),
            ("https://ex.com/broken.xml", "<urlset><url></urlset>"),
        ],
        "url string, xml string",
    )
    out = parse_sitemaps(docs)
    ok = out.filter(F.col("err").isNull())
    assert ok.filter(F.col("kind") == "urlset").count() == 3
    assert ok.filter(F.col("kind") == "sitemapindex").count() == 2
    bad = out.filter(F.col("err").isNotNull()).collect()
    assert len(bad) == 1 and bad[0].url == "https://ex.com/broken.xml"
    # binary column accepted
    b = docs.select("url", F.encode("xml", "utf-8").alias("xml"))
    assert parse_sitemaps(b).count() == out.count()
