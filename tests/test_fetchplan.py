"""Politeness fetch scheduling (ops/fetchplan.py)."""
from pyspark.sql import functions as F

from rdf_spark.ops.fetchplan import plan_fetches


def _frontier(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


class TestPlanFetches:
    def test_per_host_serial_slots(self, spark):
        urls = [f"https://a.com/{i}" for i in range(5)] + [
            "https://b.com/x"
        ]
        out = plan_fetches(_frontier(spark, urls)).collect()
        a = sorted(r.slot for r in out if r.host == "a.com")
        assert a == [1, 2, 3, 4, 5]
        b = [r for r in out if r.host == "b.com"]
        assert b[0].slot == 1 and b[0].fetch_at_s == 0.0

    def test_delay_join_and_default(self, spark):
        delays = spark.createDataFrame(
            [("a.com", 10.0)], "host string, crawl_delay double"
        )
        out = plan_fetches(
            _frontier(spark, ["https://a.com/1", "https://a.com/2",
                              "https://b.com/1", "https://b.com/2"]),
            delays=delays,
            default_delay=2.0,
        ).collect()
        a = sorted(r.fetch_at_s for r in out if r.host == "a.com")
        b = sorted(r.fetch_at_s for r in out if r.host == "b.com")
        assert a == [0.0, 10.0] and b == [0.0, 2.0]

    def test_deterministic_under_repartition(self, spark):
        urls = [f"https://a.com/{i}" for i in range(40)]
        f1 = plan_fetches(_frontier(spark, urls))
        f2 = plan_fetches(_frontier(spark, urls).repartition(7))
        rows1 = {(r.url, r.slot) for r in f1.collect()}
        rows2 = {(r.url, r.slot) for r in f2.collect()}
        assert rows1 == rows2

    def test_relative_urls_schedule_but_flagged(self, spark):
        out = plan_fetches(_frontier(spark, ["not-a-url", "also/not"]))
        rows = out.collect()
        assert {r.host for r in rows} == {""}
        assert sorted(r.slot for r in rows) == [1, 2]

    def test_payload_columns_pass_through(self, spark):
        df = spark.createDataFrame(
            [("https://a.com/1", "sha1:X")], "url string, digest string"
        )
        out = plan_fetches(df).collect()[0]
        assert out.digest == "sha1:X"


def test_crawl_plan_job_entrypoint(spark, tmp_path):
    """CDXJ index → status/mime filters → digest dedup → robots gate +
    Crawl-delay → per-host schedule, end-to-end through the CLI."""
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import crawl_plan_job

    lines = []
    for i in range(6):
        lines.append(
            f'com,a)/p{i} 20240101120000 '
            f'{{"url": "https://a.com/p{i}", "status": "200", '
            f'"mime": "text/html", "digest": "sha1:D{i % 3}"}}'
        )
    # non-200 and non-html records must be filtered out
    lines.append(
        'com,a)/gone 20240101120000 '
        '{"url": "https://a.com/gone", "status": "404", "mime": "text/html"}'
    )
    lines.append(
        'com,a)/img 20240101120000 '
        '{"url": "https://a.com/img", "status": "200", "mime": "image/png"}'
    )
    # robots-blocked path
    lines.append(
        'com,b)/secret 20240101120000 '
        '{"url": "https://b.com/secret/x", "status": "200", '
        '"mime": "text/html", "digest": "sha1:Z"}'
    )
    cdx = tmp_path / "idx.cdxj"
    cdx.write_text("\n".join(lines) + "\n")
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nAllow: /\nCrawl-delay: 5\n"),
            ("b.com", "User-agent: *\nDisallow: /secret/\n"),
        ],
        "host string, body string",
    )
    robots_path = str(tmp_path / "robots")
    robots.write.parquet(robots_path)
    out = str(tmp_path / "plan")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = crawl_plan_job.main([
            "--cdx", str(cdx), "--out", out,
            "--robots", robots_path,
            "--statuses", "200", "--mime", "text/html",
            "--dedup-digest", "--surt",
        ])
    assert rc == 0
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    # 6 html 200s → 3 after digest dedup; the b.com URL is robots-denied
    assert summary == {"urls": 3, "hosts": 1, "index_errors": 0,
                       "out": out}
    plan = spark.read.parquet(out).collect()
    assert {r.host for r in plan} == {"a.com"}
    assert sorted(r.slot for r in plan) == [1, 2, 3]
    assert sorted(r.fetch_at_s for r in plan) == [0.0, 5.0, 10.0]
    assert all(r.surt_key.startswith("com,a)/") for r in plan)
