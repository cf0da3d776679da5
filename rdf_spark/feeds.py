"""RSS 2.0 / Atom feed XML → entry rows — the fourth crawl-bootstrap
source next to WARC segments (warc.py), robots (ops/robots.py), and
sitemaps (sitemap.py): feeds are how fresh pages announce themselves,
so a recurring crawl seeds its frontier from them.

``<rss><channel><item>…`` and ``<feed><entry>…`` both yield one row
per entry: title, resolved link, the RAW published/updated string
(RFC 822 for RSS, RFC 3339 for Atom — downstream uses
``try_to_timestamp`` on whichever it needs, same policy as sitemap
lastmod), entry id (guid / atom:id), and summary (description /
atom:summary).  Atom links prefer ``rel="alternate"`` (absent rel
counts as alternate, per the spec), ignoring self/hub plumbing links.
Malformed XML quarantines the document (err row), never the batch.

Scale shape: Arrow-batched ``mapInPandas`` over per-feed documents —
narrow, no shuffle; one feed is one small document, the file/host is
the natural split exactly like robots bodies and sitemaps.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _text(el) -> str | None:
    t = el.text
    return t.strip() if t and t.strip() else None


def parse_feed_xml(xml: str) -> tuple[str, list[tuple]]:
    """(kind, [(title, link, published, entry_id, summary), …]) where
    kind is 'rss' or 'atom'.  Raises on malformed XML / an unexpected
    root (caller quarantines)."""
    root = ET.fromstring(xml)
    kind = _local(root.tag)
    rows: list[tuple] = []
    if kind == "rss":
        channel = next((c for c in root if _local(c.tag) == "channel"), None)
        for item in (channel if channel is not None else ()):
            if _local(item.tag) != "item":
                continue
            f = {"title": None, "link": None, "pubDate": None,
                 "guid": None, "description": None}
            for c in item:
                name = _local(c.tag)
                if name in f and f[name] is None:
                    f[name] = _text(c)
            rows.append((f["title"], f["link"], f["pubDate"], f["guid"],
                         f["description"]))
        return "rss", rows
    if kind == "feed":
        for entry in root:
            if _local(entry.tag) != "entry":
                continue
            title = pub = eid = summary = None
            link = fallback_link = None
            for c in entry:
                name = _local(c.tag)
                if name == "title" and title is None:
                    title = _text(c)
                elif name == "link":
                    href = c.get("href")
                    rel = c.get("rel") or "alternate"
                    if href:
                        if rel == "alternate" and link is None:
                            link = href
                        elif fallback_link is None:
                            fallback_link = href
                elif name in ("published", "updated"):
                    # published wins; updated fills in when absent
                    if name == "published" or pub is None:
                        pub = _text(c)
                elif name == "id" and eid is None:
                    eid = _text(c)
                elif name == "summary" and summary is None:
                    summary = _text(c)
            rows.append((title, link or fallback_link, pub, eid, summary))
        return "atom", rows
    raise ValueError(f"unexpected feed root <{kind}>")


def parse_feeds(
    docs: DataFrame,
    xml_col: str = "xml",
    url_col: str = "url",
) -> DataFrame:
    """``(url, kind, title, link, published, entry_id, summary, err)``
    rows — one per feed entry; malformed documents yield one err row."""
    import pandas as pd

    cols = ("url", "kind", "title", "link", "published", "entry_id",
            "summary", "err")

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {k: [] for k in cols}

            def push(url, kind=None, title=None, link=None, published=None,
                     entry_id=None, summary=None, err=None):
                for k, v in zip(cols, (url, kind, title, link, published,
                                       entry_id, summary, err)):
                    out[k].append(v)

            for url, xml in zip(pdf[url_col], pdf[xml_col]):
                url = "" if url is None else str(url)
                if xml is None:
                    continue
                if isinstance(xml, (bytes, bytearray, memoryview)):
                    xml = bytes(xml).decode("utf-8", errors="replace")
                try:
                    kind, rows = parse_feed_xml(str(xml))
                except Exception as e:
                    push(url, err=f"feed: {e}")
                    continue
                for title, link, pub, eid, summary in rows:
                    push(url, kind, title, link, pub, eid, summary)
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        run,
        "url string, kind string, title string, link string, "
        "published string, entry_id string, summary string, err string",
    )
