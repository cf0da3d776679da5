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
