"""SURT keys (ops/url.py) + CDXJ index parsing (cdx.py)."""
import pytest
from pyspark.sql import functions as F

from rdf_spark.cdx import parse_cdxj
from rdf_spark.ops.url import surt_col


def _surt(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(surt_col(F.col("url")).alias("k")).collect()[0].k


class TestSurt:
    def test_basic(self, spark):
        assert _surt(spark, "https://example.com/page") == "com,example)/page"

    def test_host_reversal_multi_label(self, spark):
        assert (
            _surt(spark, "http://a.b.example.co.uk/x")
            == "uk,co,example,b,a)/x"
        )

    def test_www_dropped_and_lowercased(self, spark):
        assert (
            _surt(spark, "HTTP://WWW.Example.COM/Path")
            == "com,example)/path"
        )

    def test_www_kept_when_it_is_the_domain(self, spark):
        # dropping 'www' from www.com would leave a bare TLD
        assert _surt(spark, "http://www.com/") == "com,www)/"

    def test_default_port_dropped_other_kept(self, spark):
        assert _surt(spark, "http://example.com:80/a") == "com,example)/a"
        assert _surt(spark, "https://example.com:443/a") == "com,example)/a"
        assert (
            _surt(spark, "http://example.com:8080/a")
            == "com,example:8080)/a"
        )

    def test_query_sorted_fragment_dropped_empty_path(self, spark):
        assert (
            _surt(spark, "https://example.com?b=2&a=1#frag")
            == "com,example)/?a=1&b=2"
        )

    def test_relative_is_null(self, spark):
        assert _surt(spark, "/just/a/path") is None


class TestCdxj:
    LINE = (
        'com,example)/page 20240101120000 {"url": "https://example.com/page",'
        ' "status": "200", "mime": "text/html", "digest": "sha1:AB",'
        ' "filename": "c-00.warc.gz", "offset": "384", "length": "1027"}'
    )

    def _parse(self, spark, lines, **kw):
        df = spark.createDataFrame([(l,) for l in lines], "value string")
        return parse_cdxj(df, **kw)

    def test_full_line(self, spark):
        r = self._parse(spark, [self.LINE]).collect()[0]
        assert r.surt_key == "com,example)/page"
        assert r.ts == "20240101120000"
        assert r.url == "https://example.com/page"
        assert r.status == 200 and r.offset == 384 and r.length == 1027
        assert r.mime == "text/html" and r.err is None

    def test_blank_lines_dropped(self, spark):
        assert self._parse(spark, [self.LINE, "", "   "]).count() == 1

    def test_malformed_quarantined(self, spark):
        bad = "com,example)/x not-a-timestamp {}"
        out = self._parse(spark, [self.LINE, bad]).collect()
        errs = [r for r in out if r.err is not None]
        assert len(errs) == 1 and errs[0].err == bad
        assert errs[0].surt_key is None

    def test_json_missing_url_quarantined(self, spark):
        bad = 'com,example)/x 20240101120000 {"status": "200"}'
        out = self._parse(spark, [bad]).collect()
        assert out[0].err == bad

    def test_non_numeric_status_null_but_raw_kept(self, spark):
        line = (
            'com,example)/x 20240101120000 '
            '{"url": "https://example.com/x", "status": "-"}'
        )
        r = self._parse(spark, [line]).collect()[0]
        assert r.status is None and r.status_raw == "-" and r.err is None

    def test_strict_raises(self, spark):
        with pytest.raises(Exception) as ei:
            self._parse(spark, ["garbage line"], strict=True).collect()
        assert "malformed" in str(ei.value)

    def test_17_digit_timestamp(self, spark):
        line = (
            'com,example)/x 20240101120000123 '
            '{"url": "https://example.com/x"}'
        )
        r = self._parse(spark, [line]).collect()[0]
        assert r.ts == "20240101120000123" and r.err is None


class TestRecrawlStats:
    def _stats(self, spark, rows):
        from rdf_spark.cdx import recrawl_stats

        df = spark.createDataFrame(
            rows, "url string, ts string, digest string"
        )
        return {r.url: r for r in recrawl_stats(df).collect()}

    def test_change_rate(self, spark):
        got = self._stats(spark, [
            ("u", "20240101000000", "A"),
            ("u", "20240201000000", "A"),
            ("u", "20240301000000", "B"),
            ("v", "20240101000000", "A"),
        ])
        u = got["u"]
        assert u.n_captures == 3 and u.n_versions == 2
        assert u.change_rate == 0.5
        assert u.first_ts == "20240101000000"
        assert u.last_ts == "20240301000000"
        # single capture: no change evidence
        assert got["v"].change_rate == 0.0

    def test_all_null_digests_clamp_to_one_version(self, spark):
        got = self._stats(spark, [
            ("u", "20240101000000", None),
            ("u", "20240201000000", None),
        ])
        assert got["u"].n_versions == 1 and got["u"].change_rate == 0.0

    def test_every_capture_changed(self, spark):
        got = self._stats(spark, [
            ("u", "20240101000000", "A"),
            ("u", "20240201000000", "B"),
            ("u", "20240301000000", "C"),
        ])
        assert got["u"].change_rate == 1.0
