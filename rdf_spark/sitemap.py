"""Sitemap XML → URL seed rows (sitemaps.org protocol).

The third leg of crawl bootstrapping next to WARC segments (warc.py)
and the robots gate (ops/robots.py): ``<urlset>`` documents yield one
row per ``<url>`` entry (loc, lastmod, changefreq, priority), and
``<sitemapindex>`` documents yield one row per child ``<sitemap>``
(kind='sitemapindex') whose locs the caller fetches and feeds back —
index recursion is a driver-side loop over *fetches*, not rows, so it
stays out of this operator.

``lastmod`` is kept as the raw W3C-datetime string (granularity varies
from YYYY to full timestamps); downstream callers use
``try_to_timestamp`` on whatever precision they need.  Malformed XML
quarantines the document (err row), never the batch.  Arrow-batched
``mapInPandas`` — narrow, no shuffle; one sitemap is one small
document, so the file/host is the natural split exactly like robots
bodies.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap_xml(xml: str) -> tuple[str, list[tuple]]:
    """(kind, [(loc, lastmod, changefreq, priority), …]) where kind is
    'urlset' or 'sitemapindex'.  Raises on malformed XML or an
    unexpected root element (caller quarantines)."""
    root = ET.fromstring(xml)
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"unexpected sitemap root <{kind}>")
    child_tag = "url" if kind == "urlset" else "sitemap"
    rows = []
    for el in root:
        if _local(el.tag) != child_tag:
            continue
        fields = {"loc": None, "lastmod": None, "changefreq": None, "priority": None}
        for f in el:
            name = _local(f.tag)
            if name in fields and f.text is not None:
                fields[name] = f.text.strip()
        if not fields["loc"]:
            continue  # a url entry without loc is meaningless
        prio = None
        if fields["priority"] is not None:
            try:
                prio = float(fields["priority"])
            except ValueError:
                prio = None
        rows.append((fields["loc"], fields["lastmod"], fields["changefreq"], prio))
    return kind, rows


def parse_sitemaps(
    docs: DataFrame,
    xml_col: str = "xml",
    url_col: str = "url",
) -> DataFrame:
    """``(url, kind, loc, lastmod, changefreq, priority, err)`` rows —
    one per sitemap entry; malformed documents yield a single err row."""
    import pandas as pd

    cols = ("url", "kind", "loc", "lastmod", "changefreq", "priority", "err")

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out = {k: [] for k in cols}

            def push(url, kind=None, loc=None, lastmod=None,
                     changefreq=None, priority=None, err=None):
                for k, v in zip(cols, (url, kind, loc, lastmod,
                                       changefreq, priority, err)):
                    out[k].append(v)

            for url, xml in zip(pdf[url_col], pdf[xml_col]):
                url = "" if url is None else str(url)
                if xml is None:
                    continue
                if isinstance(xml, (bytes, bytearray, memoryview)):
                    xml = bytes(xml).decode("utf-8", errors="replace")
                try:
                    kind, rows = parse_sitemap_xml(str(xml))
                except Exception as e:
                    push(url, err=f"sitemap: {e}")
                    continue
                for loc, lastmod, changefreq, prio in rows:
                    push(url, kind, loc, lastmod, changefreq, prio)
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        run,
        "url string, kind string, loc string, lastmod string, "
        "changefreq string, priority double, err string",
    )
