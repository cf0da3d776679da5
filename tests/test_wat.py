"""WAT metadata sidecar: envelope JSON → outlinks/titles.  All inputs
synthesized (no external data)."""

import gzip
import json

from rdf_spark import warc


def _envelope(links=None, title=None):
    html_meta = {}
    if links is not None:
        html_meta["Links"] = links
    if title is not None:
        html_meta["Head"] = {"Title": title}
    return json.dumps({
        "Envelope": {
            "WARC-Header-Length": "333",
            "Payload-Metadata": {
                "Actual-Content-Type": "application/http; msgtype=response",
                "HTTP-Response-Metadata": {
                    "Headers-Length": "123",
                    "HTML-Metadata": html_meta,
                },
            },
        },
    })


def _wat_rec(uri, payload: str):
    return warc.encode_warc_record(
        {
            "WARC-Type": "metadata",
            "WARC-Record-ID": "<urn:uuid:9>",
            "WARC-Date": "2026-01-01T00:00:00Z",
            "WARC-Target-URI": uri,
            "Content-Type": "application/json",
        },
        payload.encode(),
    )


def _wat_file(tmp_path, recs, gz=False):
    data = b"".join(recs)
    p = tmp_path / ("f.wat.gz" if gz else "f.wat")
    p.write_bytes(gzip.compress(data) if gz else data)
    return str(p)


def test_wat_links_resolve_and_drop(spark, tmp_path):
    recs = [
        _wat_rec("http://a.test/dir/page.html", _envelope(links=[
            {"path": "A@/href", "url": "http://b.test/x", "text": "to b"},
            {"path": "A@/href", "url": "rel.html"},
            {"path": "A@/href", "url": "/rooted"},
            {"path": "A@/href", "url": "#frag-only"},
            {"path": "A@/href", "url": "mailto:x@y.z"},
        ], title="Page A")),
        _wat_rec("http://c.test/", _envelope()),       # no links
        _wat_rec("http://d.test/", "{not json"),        # malformed
    ]
    path = _wat_file(tmp_path, recs, gz=True)
    records = warc.read_wat(spark, path)
    got = sorted(
        (r.url, r.href, r.anchor) for r in warc.wat_links(records).collect()
    )
    assert got == [
        ("http://a.test/dir/page.html", "http://a.test/dir/rel.html", None),
        ("http://a.test/dir/page.html", "http://a.test/rooted", None),
        ("http://a.test/dir/page.html", "http://b.test/x", "to b"),
    ]
    titles = {(r.url, r.title) for r in warc.wat_page_titles(records).collect()}
    assert titles == {("http://a.test/dir/page.html", "Page A")}


def test_wat_links_unresolved(spark, tmp_path):
    recs = [_wat_rec("http://a.test/", _envelope(links=[
        {"path": "A@/href", "url": "rel.html", "text": "x"},
    ]))]
    records = warc.read_wat(spark, _wat_file(tmp_path, recs))
    got = [(r.href, r.link_path)
           for r in warc.wat_links(records, resolve=False).collect()]
    assert got == [("rel.html", "A@/href")]


def test_wat_feeds_host_graph(spark, tmp_path):
    from rdf_spark.ops.html import host_link_graph

    recs = [
        _wat_rec("http://a.test/p1", _envelope(links=[
            {"path": "A@/href", "url": "http://b.test/x"},
            {"path": "A@/href", "url": "http://b.test/y"},
        ])),
        _wat_rec("http://b.test/p2", _envelope(links=[
            {"path": "A@/href", "url": "http://a.test/"},
        ])),
    ]
    records = warc.read_wat(spark, _wat_file(tmp_path, recs))
    links = warc.wat_links(records).select("url", "href")
    hosts = {(r.src, r.dst, r.n_links)
             for r in host_link_graph(links, pre_resolved=True).collect()}
    assert hosts == {("a.test", "b.test", 2), ("b.test", "a.test", 1)}
