"""robots.txt politeness gate (ops/robots.py): RFC 9309 group
selection, longest-match precedence, wildcards, and the Spark join
decision."""

from pyspark.sql import functions as F

from rdf_spark.ops.robots import (
    parse_robots_body,
    robots_filter,
    robots_rules,
)


BODY = """# global rules
User-agent: *
Disallow: /private/
Allow: /private/pub/
Disallow: /*.pdf$

User-agent: gptbot
User-agent: claudebot
Disallow: /

User-agent: goodbot
Disallow:
"""


def _decide(rules, path):
    best_len, best_allow = -1, True
    for allow, pattern in rules:
        from rdf_spark.ops.robots import _pattern_re

        n = len(pattern) if _pattern_re(pattern).match(path) else -1
        if n >= 0 and (n > best_len or (n == best_len and allow)):
            best_len, best_allow = n, allow
    return best_allow


def test_parse_and_decide_core():
    r = parse_robots_body(BODY)
    assert _decide(r, "/index.html") is True
    assert _decide(r, "/private/x") is False
    assert _decide(r, "/private/pub/x") is True      # longer Allow wins
    assert _decide(r, "/doc/a.pdf") is False         # '*' + '$' anchor
    assert _decide(r, "/doc/a.pdf.html") is True     # '$' anchors the end
    # most specific agent group wins; stacked User-agent lines share it
    for agent in ("ClaudeBot/2.1", "gptbot"):
        rb = parse_robots_body(BODY, agent=agent)
        assert _decide(rb, "/anything") is False
    # empty Disallow = allow-all group
    rg = parse_robots_body(BODY, agent="goodbot-2")
    assert _decide(rg, "/private/x") is True
    # allow wins exact ties
    assert _decide([(False, "/a/"), (True, "/a/")], "/a/x") is True


def test_robots_rules_stage(spark):
    robots = spark.createDataFrame(
        [("Ex.com", BODY), ("empty.example", "# nothing here")],
        "host string, body string",
    )
    rows = robots_rules(robots).collect()
    # host lowercased; rule-less hosts emit nothing
    assert {r.host for r in rows} == {"ex.com"}
    assert {(r.allow, r.pattern) for r in rows} == {
        (False, "/private/"), (True, "/private/pub/"), (False, "/*.pdf$"),
    }


def test_robots_filter_spark(spark):
    robots = spark.createDataFrame([("ex.com", BODY)], "host string, body string")
    pages = spark.createDataFrame(
        [
            ("https://ex.com/index.html",),
            ("https://ex.com/private/secret",),
            ("https://ex.com/private/pub/ok",),
            ("https://EX.com/file.pdf",),       # host matching is case-blind
            ("https://ex.com/file.pdf.html",),
            ("https://norobots.example/x",),    # no robots.txt → allowed
        ],
        "url string",
    )
    got = {r.url: r.crawl_allowed for r in robots_filter(pages, robots).collect()}
    assert got == {
        "https://ex.com/index.html": True,
        "https://ex.com/private/secret": False,
        "https://ex.com/private/pub/ok": True,
        "https://EX.com/file.pdf": False,
        "https://ex.com/file.pdf.html": True,
        "https://norobots.example/x": True,
    }
    kept = robots_filter(pages, robots, agent="ClaudeBot/1.0", keep_denied=False)
    assert [r.url for r in kept.collect()] == ["https://norobots.example/x"]
    assert "crawl_allowed" not in kept.columns
    # page payload columns survive the decision join
    paged = pages.withColumn("payload", F.length("url"))
    out = robots_filter(paged, robots)
    assert set(out.columns) == {"url", "payload", "crawl_allowed"}


def test_crawl_delays_and_sitemaps(spark):
    body = """User-agent: *
Crawl-delay: 2.5
Sitemap: https://ex.com/sitemap.xml
Sitemap: https://ex.com/news.xml

User-agent: claudebot
Crawl-delay: 10
"""
    from rdf_spark.ops.robots import robots_crawl_delays, robots_sitemaps

    robots = spark.createDataFrame(
        [("Ex.com", body), ("quiet.example", "User-agent: *\nDisallow: /x\n")],
        "host string, body string",
    )
    d = {r.host: r.crawl_delay for r in robots_crawl_delays(robots).collect()}
    assert d == {"ex.com": 2.5}  # delay-less hosts emit nothing
    db = {
        r.host: r.crawl_delay
        for r in robots_crawl_delays(robots, agent="ClaudeBot/1.0").collect()
    }
    assert db == {"ex.com": 10.0}
    sm = {(r.host, r.sitemap_url) for r in robots_sitemaps(robots).collect()}
    # Sitemap lines are group-independent; the URL's colons survive
    assert sm == {
        ("ex.com", "https://ex.com/sitemap.xml"),
        ("ex.com", "https://ex.com/news.xml"),
    }


def test_kg_construct_job_robots_gate(spark, tmp_path):
    import io
    import json as _json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import kg_construct_job

    html = "<p>About Ada Lovelace.</p>".encode()
    rows = [(f"https://r.example/keep/{i}", None, html, None, "en")
            for i in range(3)]
    rows += [(f"https://r.example/private/{i}", None, html, None, "en")
             for i in range(2)]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string")
    robots = spark.createDataFrame(
        [("r.example", "User-agent: *\nDisallow: /private/")],
        "host string, body string")
    src = str(tmp_path / "pages")
    rb = str(tmp_path / "robots")
    pages.write.parquet(src)
    robots.write.parquet(rb)
    out = str(tmp_path / "out")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = kg_construct_job.main(
            ["--pages", src, "--out", out, "--shards", "1",
             "--buckets", "2", "--robots", rb])
    assert rc == 0
    summary = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["pages"] == 3  # the two /private/ pages are gated out
