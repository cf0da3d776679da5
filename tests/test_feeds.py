"""RSS 2.0 / Atom feed parsing (rdf_spark.feeds)."""

from rdf_spark.feeds import parse_feed_xml, parse_feeds

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel><title>C</title>
<item><title>First</title><link>https://e.example/1</link>
  <pubDate>Mon, 05 Jan 2026 10:00:00 GMT</pubDate>
  <guid>g1</guid><description>d1</description></item>
<item><title>NoLink</title></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>
<entry><title>A1</title>
  <link rel="self" href="https://e.example/self"/>
  <link href="https://e.example/a1"/>
  <updated>2026-01-05T10:00:00Z</updated>
  <published>2026-01-04T09:00:00Z</published>
  <id>urn:a1</id><summary>s1</summary></entry>
<entry><title>A2</title><link rel="enclosure" href="https://e.example/mp3"/>
  <updated>2026-01-06T10:00:00Z</updated></entry>
</feed>"""


def test_parse_feed_xml_rss():
    kind, rows = parse_feed_xml(RSS)
    assert kind == "rss"
    assert rows[0] == ("First", "https://e.example/1",
                       "Mon, 05 Jan 2026 10:00:00 GMT", "g1", "d1")
    assert rows[1] == ("NoLink", None, None, None, None)


def test_parse_feed_xml_atom():
    kind, rows = parse_feed_xml(ATOM)
    assert kind == "atom"
    # rel=alternate (implicit) beats rel=self; published beats updated
    assert rows[0] == ("A1", "https://e.example/a1",
                       "2026-01-04T09:00:00Z", "urn:a1", "s1")
    # no alternate link: the plumbing link is the fallback
    assert rows[1] == ("A2", "https://e.example/mp3",
                       "2026-01-06T10:00:00Z", None, None)


def test_parse_feeds_stage(spark):
    docs = spark.createDataFrame(
        [("https://e.example/rss", RSS),
         ("https://e.example/atom", ATOM),
         ("https://e.example/bad", "<html>not a feed</html>"),
         ("https://e.example/null", None)],
        "url string, xml string")
    got = parse_feeds(docs).collect()
    by_url = {}
    for r in got:
        by_url.setdefault(r.url, []).append(r)
    assert len(by_url["https://e.example/rss"]) == 2
    assert by_url["https://e.example/atom"][0].kind == "atom"
    [bad] = by_url["https://e.example/bad"]
    assert bad.err and bad.kind is None
    assert "https://e.example/null" not in by_url
    # binary xml decodes utf-8-replace on the way in
    bdocs = spark.createDataFrame(
        [("b0", RSS.encode())], "url string, xml binary")
    assert parse_feeds(bdocs).filter("err is null").count() == 2
