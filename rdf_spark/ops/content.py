"""Main-content extraction: the article text of an HTML page, with
nav/footer/sidebar boilerplate dropped (boilerpipe/trafilatura-style
block scoring, stdlib-only and fully deterministic).

A crawl→corpus pipeline needs this between the raw page and every
text-quality stage: quality scoring, dedup shingles, language ID and
token counts are all meaningless over cookie banners and nav menus.
The reference is a parser library with no extraction layer (SURVEY
§2.5) — this is a beyond-parity webtext operator.

Algorithm (two passes over block-level text segments):

1. Walk the DOM with the same browser-loose ``html.parser`` state
   machine the microdata/RDFa extractors use (never raises).  Subtrees
   of non-content tags (``script style noscript template svg nav footer
   aside header form iframe``) are skipped outright; every block-level
   boundary (``p div li h1-h6 td …``) flushes the accumulated text into
   a *block* carrying (text, link-chars, boilerplate-hinted).  A block
   is *hinted* when an enclosing element's class/id matches the
   boilerplate lexicon (menu, sidebar, comment, cookie, share, …).
2. Score each block: KEEP iff not hinted, text length ≥ ``min_len``,
   and link density (link-chars / chars) ≤ ``max_link_density`` — long
   low-link prose is content, short linky runs are chrome.  A short
   un-hinted low-link block immediately BEFORE a kept block is promoted
   too (headings belong to their article; boilerpipe's neighbour rule).

The result joins kept blocks with ``\\n`` (whitespace inside a block is
collapsed to single spaces).  Pure function of the html string —
partitioning-invariant and replayable, so it can sit inside a resumable
pipeline.

Scale shape: one Arrow-batched ``mapInPandas`` projection (the walk is
O(page bytes) with an O(1) tag stack), zero shuffle, narrow.  Soundness
policy matches ops.html: static HTML only — javascript-rendered content
is out of scope by design.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from pyspark.sql import Column, DataFrame, functions as F

_SKIP_TAGS = frozenset(
    "script style noscript template svg nav footer aside header form "
    "iframe button select option title".split()
)
# NOT in the skip set: <head> — sloppy real-world pages leave it
# unclosed and html.parser does not auto-close at <body> the way
# browsers do, so skipping it would swallow the whole page; its only
# text-bearing child is <title>, which IS skipped.
_BLOCK_TAGS = frozenset(
    "p div li h1 h2 h3 h4 h5 h6 td th tr table ul ol dl dt dd article "
    "section main blockquote pre figure figcaption body br hr".split()
)
# class/id tokens that mark an element subtree as page chrome; matched
# per hyphen/underscore-separated token so 'download' never hits 'ad'
_BOILER_HINT = re.compile(
    r"(?:^|[\s_-])(nav|menu|footer|header|sidebar|side-bar|comment|"
    r"comments|share|sharing|social|cookie|banner|breadcrumb|breadcrumbs|"
    r"related|widget|ad|ads|advert|advertisement|promo|popup|modal|"
    r"subscribe|newsletter|pagination|pager|skip|masthead)(?:$|[\s_-])",
    re.I,
)
_WS = re.compile(r"\s+")
# void elements never get an end tag: do not push them on the tag stack
_VOID = frozenset("br hr img input meta link area base col embed source "
                  "track wbr".split())


class _Blocks(HTMLParser):
    """Collect (text, link_chars, hinted) block triples from a page."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, bool]] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._skip = 0     # depth inside non-content subtrees
        self._a = 0        # depth inside <a>
        self._hint = 0     # depth inside boilerplate-hinted subtrees
        # parallel stack of (is_skip, is_hint) so end tags unwind exactly
        self._stack: list[tuple[str, bool, bool]] = []

    def _flush(self):
        text = _WS.sub(" ", "".join(self._buf)).strip()
        if text:
            self.blocks.append((text, self._link_chars, self._hint > 0))
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _VOID:
            if tag in ("br", "hr"):
                self._flush()
            return
        skip = tag in _SKIP_TAGS
        hint = False
        if not skip:
            for k, v in attrs:
                if k in ("class", "id") and v and _BOILER_HINT.search(v):
                    hint = True
                    break
        if tag in _BLOCK_TAGS:
            self._flush()
        self._stack.append((tag, skip, hint))
        if skip:
            self._skip += 1
        if hint:
            self._hint += 1
        if tag == "a":
            self._a += 1

    def handle_endtag(self, tag):
        if tag in _VOID:
            return
        # browser-loose recovery: unwind to the nearest matching open tag
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                if tag in _BLOCK_TAGS:
                    self._flush()
                for t, skip, hint in self._stack[i:]:
                    if skip:
                        self._skip -= 1
                    if hint:
                        self._hint -= 1
                    if t == "a":
                        self._a -= 1
                del self._stack[i:]
                break

    def handle_data(self, data):
        if self._skip or not data:
            return
        self._buf.append(data)
        if self._a:
            self._link_chars += len(_WS.sub(" ", data).strip())


def main_text(
    html: str | None,
    min_len: int = 25,
    max_link_density: float = 0.33,
) -> str | None:
    """The page's main content text (see module docstring); None in,
    None out; a page with no kept block yields ""."""
    if html is None:
        return None
    p = _Blocks()
    try:
        p.feed(html)
        p.close()
    except Exception:  # html.parser is loose, but never let one page kill a job
        pass
    p._flush()
    blocks = p.blocks
    keep = [False] * len(blocks)
    for i, (text, link_chars, hinted) in enumerate(blocks):
        if hinted:
            continue
        if link_chars / max(len(text), 1) > max_link_density:
            continue
        keep[i] = len(text) >= min_len
    # neighbour promotion: a short clean block right before a kept one
    # (headings/bylines belong to their article)
    for i in range(len(blocks) - 2, -1, -1):
        text, link_chars, hinted = blocks[i]
        if (not keep[i] and keep[i + 1] and not hinted and text
                and len(text) < min_len
                and link_chars / max(len(text), 1) <= max_link_density):
            keep[i] = True
    return "\n".join(b[0] for b, k in zip(blocks, keep) if k)


def extract_main_text(
    pages: DataFrame,
    html_col: str = "html",
    out_col: str = "main_text",
    min_len: int = 25,
    max_link_density: float = 0.33,
) -> DataFrame:
    """Add ``out_col`` with each page's extracted main content.

    Arrow-batched ``mapInPandas`` (one narrow projection, zero shuffle);
    a ``binary`` html column is decoded utf-8-replace first (run
    :func:`rdf_spark.ops.html.decode_html` upstream when the crawl is
    not known-utf-8).
    """
    from pyspark.sql.types import StringType, StructField, StructType

    is_bin = dict(pages.dtypes).get(html_col) == "binary"
    schema = StructType(
        list(pages.schema.fields) + [StructField(out_col, StringType())]
    )
    cols = [f.name for f in pages.schema.fields]

    def run(batches):
        for pdf in batches:
            src = pdf[html_col]
            if is_bin:
                src = src.map(
                    lambda b: None if b is None
                    else bytes(b).decode("utf-8", "replace")
                )
            pdf = pdf[cols].copy()
            pdf[out_col] = src.map(
                lambda h: main_text(h, min_len, max_link_density)
            )
            yield pdf

    return pages.mapInPandas(run, schema=schema)


class _Tables(HTMLParser):
    """Collect (table_idx, row_idx, col_idx, cell_text) from a page;
    nested tables are flattened into their own table ordinals (the cell
    that contains them keeps only its direct text)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.cells: list[tuple[int, int, int, str]] = []
        self._next_table = 0
        # stack of [table_idx, row_idx(-1 before first tr), col_idx]
        self._tables: list[list[int]] = []
        self._cell_buf: list[str] | None = None

    def _close_cell(self):
        if self._cell_buf is not None and self._tables:
            t, r, c = self._tables[-1]
            text = _WS.sub(" ", "".join(self._cell_buf)).strip()
            self.cells.append((t, r, c, text))
            self._tables[-1][2] += 1
            self._cell_buf = None

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self._close_cell()
            self._tables.append([self._next_table, -1, 0])
            self._next_table += 1
        elif tag == "tr" and self._tables:
            self._close_cell()
            self._tables[-1][1] += 1
            self._tables[-1][2] = 0
        elif tag in ("td", "th") and self._tables:
            self._close_cell()
            if self._tables[-1][1] < 0:  # browser-loose: tr-less row
                self._tables[-1][1] = 0
            self._cell_buf = []

    def handle_endtag(self, tag):
        if tag in ("td", "th"):
            self._close_cell()
        elif tag == "tr" and self._tables:
            self._close_cell()
        elif tag == "table" and self._tables:
            self._close_cell()
            self._tables.pop()

    def handle_data(self, data):
        if self._cell_buf is not None:
            self._cell_buf.append(data)


def page_tables(html: str | None) -> list[tuple[int, int, int, str]]:
    """(table, row, col, cell) tuples of every ``<td>/<th>`` cell on the
    page (0-based ordinals, whitespace collapsed, entities decoded);
    None/parse-chaos yields []."""
    if html is None:
        return []
    p = _Tables()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    p._close_cell()
    return p.cells


def extract_tables(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Every HTML table cell as a row: ``(url, table, row, col, cell)``
    — the web's second structured-data carrier after schema.org markup
    (infobox/statistics mining feeds KG construction directly).

    0-based ordinals in document order; nested tables become their own
    table ordinal; loose markup (missing ``</td>``, ``tr``-less cells)
    recovers the way browsers do.  Arrow-batched ``mapInPandas``
    (O(page bytes) walk), zero shuffle; exploding to one cell per row
    keeps the output scalar-typed so plain SQL can pivot/filter it.
    """
    import pandas as pd

    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType,
    )

    is_bin = dict(pages.dtypes).get(html_col) == "binary"
    schema = StructType([
        StructField("url", StringType()),
        StructField("table", IntegerType()),
        StructField("row", IntegerType()),
        StructField("col", IntegerType()),
        StructField("cell", StringType()),
    ])

    def run(batches):
        for pdf in batches:
            out = {"url": [], "table": [], "row": [], "col": [], "cell": []}
            for u, h in zip(pdf[url_col], pdf[html_col]):
                if h is not None and is_bin:
                    h = bytes(h).decode("utf-8", "replace")
                for t, r, c, text in page_tables(h):
                    out["url"].append(u)
                    out["table"].append(t)
                    out["row"].append(r)
                    out["col"].append(c)
                    out["cell"].append(text)
            yield pd.DataFrame(out)

    return pages.mapInPandas(run, schema=schema)


def _pred_slug(cell: Column) -> Column:
    """Header text → predicate local name: lowercase, non-alphanumeric
    runs collapsed to ``_``, leading/trailing ``_`` stripped — the
    deterministic slug every engine's regexp_replace reproduces."""
    slug = F.lower(F.regexp_replace(F.trim(cell), "[^A-Za-z0-9]+", "_"))
    return F.regexp_replace(slug, "^_+|_+$", "")


def table_to_triples(
    cells: DataFrame,
    pred_base: str = "urn:table:p:",
    subject_from_first_col: bool = False,
    subj_base: str | None = None,
) -> DataFrame:
    """Infobox mining: header-row HTML tables → canonical triple rows.

    Input is :func:`extract_tables` output (``url, table, row, col,
    cell``).  Row 0 of each table is read as the header: each header
    cell names a predicate (``pred_base`` + slug), and every later row
    becomes one entity whose cell under that column is the literal
    object.  Output: ``(url, s, s_kind, p, o, o_kind, o_datatype,
    o_lang)`` in the canonical schema (§1.4; o_datatype null ⇒
    xsd:string).

    Subjects: by default one fresh row entity per data row
    (``<url>#table-T-row-R``).  With ``subject_from_first_col=True``
    the first column is the entity-key column (subject = ``subj_base or
    url+'#'`` + slug of the row's column-0 cell; column 0 then emits no
    triple, and rows with an empty key are dropped whole).

    Dropped, not guessed: empty header cells (their whole column),
    empty data cells, header-only / single-row tables (no data rows).

    Scale shape: one self-equi-join of the cells table (data rows ×
    header row on ``(url, table, col)``, plus the key-cell join on
    ``(url, table, row)`` in key mode) — both sides are the same scan,
    co-partitioned by the join keys' common prefix, and the header side
    is ~1/rows of the data side so AQE sizes it; no windows, no Python
    beyond the upstream extract.
    """
    from rdf_spark.ops.planutil import materialize_for_fanout
    from rdf_spark.terms import KIND_IRI, KIND_LITERAL

    # both join sides (headers + data, and keys in key mode) scan the
    # same cells table; when it is the usual extract_tables python
    # stage, materialize it once instead of re-parsing the HTML per side
    cells = materialize_for_fanout(cells)
    headers = (
        cells.filter(F.col("row") == 0)
        .select(
            "url", "table", "col",
            _pred_slug(F.col("cell")).alias("_pred"),
        )
        .filter(F.col("_pred") != "")
    )
    data = cells.filter((F.col("row") > 0) & (F.trim(F.col("cell")) != ""))
    if subject_from_first_col:
        keys = (
            cells.filter((F.col("row") > 0) & (F.col("col") == 0))
            .select(
                "url", "table", "row",
                _pred_slug(F.col("cell")).alias("_key"),
            )
            .filter(F.col("_key") != "")
        )
        base = (
            F.lit(subj_base) if subj_base is not None
            else F.concat(F.col("url"), F.lit("#"))
        )
        data = data.filter(F.col("col") > 0).join(
            keys, ["url", "table", "row"]
        )
        subject = F.concat(base, F.col("_key"))
    else:
        subject = F.concat(
            F.col("url"), F.lit("#table-"), F.col("table"),
            F.lit("-row-"), F.col("row"),
        )
    joined = data.join(headers, ["url", "table", "col"])
    return joined.select(
        "url",
        subject.alias("s"),
        F.lit(KIND_IRI).cast("tinyint").alias("s_kind"),
        F.concat(F.lit(pred_base), F.col("_pred")).alias("p"),
        F.col("cell").alias("o"),
        F.lit(KIND_LITERAL).cast("tinyint").alias("o_kind"),
        F.lit(None).cast("string").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
    )
