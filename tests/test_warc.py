"""WARC reader: record framing, HTTP payload split, gzip members, Spark
file explode + quarantine.  All inputs synthesized (no external data)."""

import gzip

import pytest

from rdf_spark import warc


def _rec(wtype, uri, body, rid="<urn:uuid:1>", extra=None):
    hdrs = {
        "WARC-Type": wtype,
        "WARC-Record-ID": rid,
        "WARC-Date": "2026-01-01T00:00:00Z",
        "Content-Type": "application/http;msgtype=response",
    }
    if uri:
        hdrs["WARC-Target-URI"] = uri
    if extra:
        hdrs.update(extra)
    return warc.encode_warc_record(hdrs, body)


def _http(body: bytes, ct=b"text/plain; charset=utf-8", status=b"200 OK"):
    return (
        b"HTTP/1.1 " + status + b"\r\nContent-Type: " + ct + b"\r\n\r\n" + body
    )


def test_iter_records_roundtrip():
    data = _rec("warcinfo", None, b"software: test\r\n") + _rec(
        "response", "https://x.org/a", _http(b"hello world")
    )
    recs = list(warc.iter_warc_records(data))
    assert [h["warc-type"] for h, _ in recs] == ["warcinfo", "response"]
    assert recs[0][0]["warc-version"] == "1.0"
    assert recs[1][0]["warc-target-uri"] == "https://x.org/a"
    status, hh, body = warc.split_http_payload(recs[1][1])
    assert status == 200 and body == b"hello world"
    assert hh["content-type"] == "text/plain; charset=utf-8"


def test_header_folding_and_binary_payload():
    # payload containing CRLFCRLF must not confuse framing (length-driven)
    body = b"\r\n\r\nWARC/1.0\r\n\x00\xff"
    data = _rec("resource", "https://x.org/b", body,
                extra={"X-Long": "part one"})
    data = data.replace(b"X-Long: part one", b"X-Long: part\r\n  one")
    (hdrs, payload), = warc.iter_warc_records(data)
    assert hdrs["x-long"] == "part one"
    assert payload == body


def test_truncation_and_bad_version():
    good = _rec("response", "https://x.org/a", _http(b"abc"))
    with pytest.raises(warc.WarcError, match="truncated payload"):
        list(warc.iter_warc_records(good[:-10]))
    with pytest.raises(warc.WarcError, match="version"):
        list(warc.iter_warc_records(b"HTTP/1.1 200\r\n\r\n"))
    with pytest.raises(warc.WarcError, match="Content-Length"):
        list(warc.iter_warc_records(
            b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"))


def test_gzip_multi_member():
    # .warc.gz = one gzip member per record
    a = gzip.compress(_rec("response", "https://x.org/1", _http(b"one")))
    b = gzip.compress(_rec("response", "https://x.org/2", _http(b"two")))
    recs = list(warc.iter_warc_records(a + b))
    assert [h["warc-target-uri"] for h, _ in recs] == [
        "https://x.org/1", "https://x.org/2"]


def test_charset_decode():
    body = "naïve café".encode("iso-8859-1")
    status, hh, got = warc.split_http_payload(
        _http(body, ct=b"text/html; charset=ISO-8859-1"))
    assert warc.decode_payload_text(got, hh["content-type"]) == "naïve café"
    # unknown charset falls back to utf-8/replace, never raises
    assert warc.decode_payload_text(b"\xff", "text/plain; charset=bogus-enc")


def test_non_http_payload_passthrough():
    status, hh, body = warc.split_http_payload(b"just bytes")
    assert status is None and hh == {} and body == b"just bytes"


def test_read_warc_spark(spark, tmp_path):
    d = tmp_path / "segs"
    d.mkdir()
    for seg in range(3):
        blobs = [_rec("warcinfo", None, b"software: t\r\n")]
        for i in range(4):
            doc = seg * 4 + i
            blobs.append(_rec(
                "response", f"https://x.org/doc/{doc}",
                _http(f"text {doc}".encode()),
                rid=f"<urn:uuid:{doc}>",
            ))
        raw = b"".join(blobs)
        if seg == 2:  # one segment gzipped, member-per-record
            raw = b"".join(gzip.compress(b) for b in blobs)
            (d / f"seg{seg}.warc.gz").write_bytes(raw)
        else:
            (d / f"seg{seg}.warc").write_bytes(raw)
    df = warc.read_warc(spark, str(d))
    rows = df.collect()
    assert len(rows) == 12  # warcinfo filtered by default types=('response',)
    got = {r["target_uri"]: r for r in rows}
    assert got["https://x.org/doc/7"]["text"] == "text 7"
    assert got["https://x.org/doc/7"]["http_status"] == 200
    assert all(r["err"] is None for r in rows)
    # types=None keeps every record
    assert warc.read_warc(spark, str(d), types=None).count() == 15
    # narrow plan: no Exchange anywhere in the read
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    assert "Exchange" not in plan


def test_read_warc_quarantine(spark, tmp_path):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "ok.warc").write_bytes(_rec("response", "https://x.org/ok",
                                     _http(b"fine")))
    (d / "bad.warc").write_bytes(b"WARC/1.0\r\nBroken")
    rows = warc.read_warc(spark, str(d)).collect()
    errs = [r for r in rows if r["err"] is not None]
    oks = [r for r in rows if r["err"] is None]
    assert len(errs) == 1 and "truncated" in errs[0]["err"]
    assert len(oks) == 1 and oks[0]["text"] == "fine"
    with pytest.raises(Exception):  # strict mode surfaces the WarcError
        warc.read_warc(spark, str(d), errors="strict").collect()


def test_pages_from_warc_feeds_pipeline(spark, tmp_path):
    from rdf_spark import extraction

    d = tmp_path / "crawl"
    d.mkdir()
    html = (b"<html><head><script>x=1</script></head>"
            b"<body><p>Alpha Corp announced</p>"
            b"<script type=\"text/turtle\">"
            b"<http://x/s> <http://x/p> \"v\" ."
            b"</script></body></html>")
    (d / "seg.warc").write_bytes(
        _rec("warcinfo", None, b"software: t\r\n")
        + _rec("response", "https://x.org/page",
               _http(html, ct=b"text/html; charset=utf-8")))
    pages = warc.pages_from_warc(warc.read_warc(spark, str(d)))
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"]
    assert pages.schema["warc_ts"].dataType.typeName() == "timestamp"
    row = extraction.extract_stage(pages).collect()[0]
    assert row["url"] == "https://x.org/page"
    assert "Alpha Corp announced" in row["extracted_text"]
    assert "<p>" not in row["extracted_text"]
    assert row["rdf_text"].strip() == '<http://x/s> <http://x/p> "v" .'


def test_kg_construct_job_warc_input(spark, tmp_path):
    """--warc CLI path: crawl segments → pages → full pipeline."""
    import io
    import json as _json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import kg_construct_job

    d = tmp_path / "crawl"
    d.mkdir()
    recs = []
    for i in range(6):
        html = (f"<html><body><p>page {i}</p>"
                f"<script type=\"text/turtle\">"
                f"<http://x/s{i}> <http://x/p> \"v{i}\" ."
                f"</script></body></html>").encode()
        recs.append(_rec("response", f"https://x.org/doc/{i}", _http(
            html, ct=b"text/html; charset=utf-8"), rid=f"<urn:uuid:{i}>"))
    (d / "seg0.warc").write_bytes(b"".join(recs[:3]))
    (d / "seg1.warc").write_bytes(b"".join(recs[3:]))
    out = str(tmp_path / "store")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = kg_construct_job.main(
            ["--warc", str(d), "--out", out, "--shards", "2", "--buckets", "4"])
    assert rc == 0
    summary = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["pages"] == 6
    assert summary["triples"] >= 6  # one embedded-Turtle triple per page
    assert summary["parse_errors"] == 0


def _wet_rec(uri, text, rid="<urn:uuid:w1>"):
    """A WET conversion record: text/plain payload, no HTTP envelope."""
    return warc.encode_warc_record(
        {
            "WARC-Type": "conversion",
            "WARC-Record-ID": rid,
            "WARC-Date": "2026-02-02T03:04:05Z",
            "WARC-Target-URI": uri,
            "Content-Type": "text/plain",
        },
        text.encode("utf-8"),
    )


def test_read_wet_and_pages_from_wet(spark, tmp_path):
    """WET shard → pages: payload text passes through VERBATIM as the
    extraction (html null), warcinfo records are filtered, and the
    fused pipeline stage links mentions without any invariant
    violation rows."""
    from rdf_spark import extraction

    d = tmp_path / "wet"
    d.mkdir()
    # odd spacing must survive: WET text is the reference extraction,
    # never re-squashed by the HTML whitespace rules
    t0 = "Ada Lovelace  wrote   notes"
    t1 = "Alan Turing & Ada Lovelace"
    data = (
        _rec("warcinfo", None, b"software: wetgen\r\n")
        + _wet_rec("https://x.org/p0", t0, rid="<urn:uuid:w0>")
        + _wet_rec("https://x.org/p1", t1, rid="<urn:uuid:w1>")
    )
    (d / "seg.wet.gz").write_bytes(gzip.compress(data))
    pages = warc.pages_from_wet(warc.read_wet(spark, str(d)))
    rows = {r.url: r for r in pages.collect()}
    assert set(rows) == {"https://x.org/p0", "https://x.org/p1"}
    assert all(r.html is None for r in rows.values())
    assert rows["https://x.org/p0"].text == t0
    assert rows["https://x.org/p0"].warc_ts is not None
    # extract_stage passes the text through byte-identically
    ext = {r.url: r.extracted_text
           for r in extraction.extract_stage(pages).collect()}
    assert ext == {"https://x.org/p0": t0, "https://x.org/p1": t1}
    # fused stage: mentions linked from provided text, zero quarantine
    from rdf_spark import datagen

    alias_rows = [(r.surface, r.entity_iri, r.prior)
                  for r in datagen.aliases(spark).collect()]
    tagged = extraction.fused_extract_parse_link(pages, alias_rows)
    assert tagged.filter("err IS NOT NULL").count() == 0
    links = {(r.s, r.o) for r in tagged.filter("err IS NULL").collect()}
    assert ("https://x.org/p0",
            "http://kg.example/entity/Ada_Lovelace") in links
    assert ("https://x.org/p1",
            "http://kg.example/entity/Alan_Turing") in links


def test_kg_construct_job_wet_input(spark, tmp_path):
    """--wet CLI path: extracted-text segments → pages → full pipeline."""
    import io
    import json as _json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import kg_construct_job

    d = tmp_path / "wet"
    d.mkdir()
    recs = [_wet_rec(f"https://x.org/doc/{i}",
                     f"doc {i} mentions Grace Hopper today",
                     rid=f"<urn:uuid:{i}>")
            for i in range(4)]
    (d / "seg0.wet").write_bytes(b"".join(recs[:2]))
    (d / "seg1.wet.gz").write_bytes(gzip.compress(b"".join(recs[2:])))
    out = str(tmp_path / "store")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = kg_construct_job.main(
            ["--wet", str(d), "--out", out, "--shards", "2", "--buckets", "4"])
    assert rc == 0
    summary = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["pages"] == 4
    assert summary["triples"] == 4  # one Grace Hopper link per page
    assert summary["parse_errors"] == 0
