"""HTML structured-data and hyperlink extraction — the crawl-side triple
sources of a web→KG pipeline.

Real Common-Crawl pages carry their machine-readable facts in embedded
``<script type="application/ld+json">`` islands (schema.org JSON-LD; by
far the dominant structured-data carrier on the public web) and, less
often, ``<script type="text/turtle">`` blocks.  ``parse_html_structured``
turns a ``pages(url, html, …)`` table into canonical triples by routing
each island through the existing document parsers
(:func:`rdf_spark.sources.parse_documents`), and ``extract_links`` /
``host_link_graph`` turn ``<a href>`` anchors into a host-level link
graph ready for :func:`rdf_spark.ops.graph.pagerank`.

Scale shape: island/anchor extraction is a single JVM projection
(``regexp_extract_all`` → ``explode``) — zero Python, zero shuffle, and
whole-stage codegen applies; only the RDF parse itself runs in the
Arrow-batched ``mapInPandas`` stage the other decoders already use.  The
link-graph aggregation shuffles 8-byte-ish host pairs, never HTML.

Soundness policy (same as the arrow fast paths / ops.url): regex HTML
scanning is sound-not-complete — islands with a literal ``</script>``
inside a JSON string, or anchors produced by javascript, are missed, and
relative-href resolution does not collapse ``..`` dot-segments.  Blank
node scope follows the established pipeline convention
(extraction.extract_turtle_blocks): all same-format islands of one page
form ONE document (one ``_:b…`` scope per page per format), so
skolemization (keyed by url) stays collision-free.

JSON-LD islands are combined per page as a single top-level array
``[island1, island2, …]`` — the parser flattens nested node arrays, so
array-valued islands compose too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdf_spark import sources
from rdf_spark.ops.url import normalize_url_col, DEFAULT_DROP_PARAMS

# mime-type patterns per supported island format; attribute order and
# quoting vary in the wild, so match type= anywhere inside the open tag
_MIMES = {
    "jsonld": r"application/ld\+json",
    "turtle": r"text/turtle",
}

_HREF_PAT = r"""(?is)<a\b[^>]*?\bhref\s*=\s*["']([^"'<>]*)["']"""


def _block_pat(fmt: str) -> str:
    try:
        mime = _MIMES[fmt]
    except KeyError:
        raise ValueError(f"unsupported embedded format {fmt!r}; one of {sorted(_MIMES)}")
    return (
        r"""(?is)<script\b[^>]*?\btype\s*=\s*["']""" + mime
        + r"""["'][^>]*>(.*?)</script>"""
    )


def _html_str(df: DataFrame, html_col: str) -> Column:
    """html as a string column (the pages contract stores utf-8 bytes)."""
    col = F.col(html_col)
    if dict(df.dtypes).get(html_col) == "binary":
        col = F.decode(col, "UTF-8")
    return col


def extract_script_blocks(
    pages: DataFrame,
    fmt: str = "jsonld",
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """One row per embedded ``<script>`` island: ``(url, block, text)``.

    ``block`` is the 0-based island ordinal within the page (document
    order).  Pure JVM (regexp_extract_all → posexplode): row-local, no
    shuffle, no Python.
    """
    blocks = F.regexp_extract_all(_html_str(pages, html_col), F.lit(_block_pat(fmt)), 1)
    return pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(blocks).alias("block", "text"),
    )


def _combined_docs(
    pages: DataFrame, fmt: str, html_col: str, url_col: str
) -> DataFrame:
    """(url, text) with all same-format islands combined into ONE document
    per page (blank-node scope = page, matching extract_turtle_blocks);
    pages with no island for ``fmt`` produce no row."""
    raw = F.regexp_extract_all(_html_str(pages, html_col), F.lit(_block_pat(fmt)), 1)
    # drop empty/whitespace-only islands: real pages carry blank
    # <script type="application/ld+json"></script> stubs, and for jsonld
    # an empty member would make the combined array malformed and
    # quarantine the whole page
    blocks = F.filter(raw, lambda x: F.trim(x) != "")
    kept = F.col("_blocks")
    if fmt == "jsonld":
        # a bare concatenation of JSON objects is not valid JSON — wrap
        # the islands as one top-level array (parser flattens nesting)
        text = F.concat(F.lit("["), F.array_join(kept, ","), F.lit("]"))
    else:
        text = F.array_join(kept, "\n")
    return (
        pages.select(F.col(url_col).alias("url"), blocks.alias("_blocks"))
        .filter(F.size("_blocks") > 0)
        .select("url", text.alias("text"))
    )


def parse_html_structured(
    pages: DataFrame,
    fmts: tuple[str, ...] = ("jsonld", "turtle"),
    html_col: str = "html",
    url_col: str = "url",
    base_from_url: bool = True,
    errors: str = "quarantine",
) -> DataFrame:
    """Parse every supported structured-data island of ``pages`` into the
    canonical quad schema (+``fmt`` tag, +``err``).

    Narrow end-to-end: extraction is a JVM projection, parsing the usual
    Arrow-batched per-document stage; no shuffle is introduced.  Feed the
    result to :func:`rdf_spark.canonical.skolemize` before any
    cross-document merge, exactly like the other decoders.
    """
    outs = []
    for fmt in fmts:
        docs = _combined_docs(pages, fmt, html_col, url_col)
        tri = sources.parse_documents(
            docs, fmt=fmt, base_from_url=base_from_url, errors=errors
        )
        if "graph" not in tri.columns:  # lift triple formats to the quad schema
            tri = tri.withColumn("graph", F.lit(None).cast("string")).withColumn(
                "graph_kind", F.lit(None).cast("tinyint")
            )
        cols = [c for c in tri.columns if c != "err"]
        outs.append(tri.select(*cols, F.lit(fmt).alias("fmt"), "err"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def extract_links(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    resolve: bool = True,
) -> DataFrame:
    """One row per ``<a href>`` anchor: ``(url, href)``.

    With ``resolve=True`` the href is resolved against the page URL by
    JVM-side RFC-3986-lite rules — absolute kept, ``//authority`` gets
    the page scheme, ``/rooted`` gets the page origin, relative paths
    resolve against the page path's directory (no ``..`` collapsing —
    sound-not-complete), fragment-only and non-http(s) results dropped.
    Pure projection + filter: zero shuffle, codegen-friendly.
    """
    hrefs = F.regexp_extract_all(_html_str(pages, html_col), F.lit(_HREF_PAT), 1)
    out = pages.select(
        F.col(url_col).alias("url"), F.explode(hrefs).alias("href")
    )
    if not resolve:
        return out
    # materialize the fragment-stripped href in its own projection: the
    # when-chain in _resolve_href references it from several branch
    # conditions, and without the projection boundary the regexp_replace
    # re-evaluates per reference (measured 2.4× on the resolve stage)
    bare = out.select(
        "url", F.regexp_replace("href", r"#.*$", "").alias("_bare")
    )
    return (
        bare.select(
            "url", _resolve_bare(F.col("url"), F.col("_bare")).alias("href")
        )
        .filter(F.col("href").rlike("^https?://"))
    )


def _resolve_bare(page: Column, bare: Column) -> Column:
    """RFC-3986-lite resolution of an already-fragment-stripped href
    against ``page`` (see extract_links docstring); null for
    fragment-only/empty hrefs.  ``bare`` should be a plain column
    reference (callers project the strip first — see extract_links)."""
    scheme = F.regexp_extract(page, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    origin = F.regexp_extract(page, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    # directory of the page path, always ending in '/'
    dirpath = F.regexp_extract(page, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*/)", 1)
    dirpath = F.when(dirpath == "", F.lit("/")).otherwise(dirpath)
    return (
        F.when(bare.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:"), bare)  # absolute (any scheme)
        .when(bare.startswith("//"), F.concat(scheme, F.lit(":"), bare))
        .when(bare.startswith("/"), F.concat(origin, bare))
        .when(bare == "", F.lit(None).cast("string"))  # fragment-only / empty
        .otherwise(F.concat(origin, dirpath, bare))
    )


def _resolve_href(page: Column, href: Column) -> Column:
    """Single-expression resolve (fragment strip + _resolve_bare) for
    callers composing further column logic on top (anchor_link_priors);
    prefer the projected two-step shape of extract_links in hot paths."""
    return _resolve_bare(page, F.regexp_replace(href, r"#.*$", ""))


_ANCHOR_PAT = (
    r"""(?is)<a\b[^>]*?\bhref\s*=\s*["']([^"'<>]*)["'][^>]*>(.*?)</a>"""
)


def extract_anchor_texts(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """``(url, href, anchor_text)`` per anchor — the classic
    entity-linking prior source (anchor text ≈ a human-written surface
    form for the link target; feed it to the gazetteer/mention stage or
    aggregate (anchor_text, href) counts into a link-prior dictionary).

    ``anchor_text`` is the anchor's inner HTML with tags stripped and
    whitespace squashed.  Both captures come from the SAME regex applied
    twice (group 1 / group 2), so the arrays align by construction and
    ``arrays_zip`` recombines them — still a single JVM projection, no
    Python, no shuffle.  Anchors without closing tags (or hrefs
    introduced by scripts) are missed: sound-not-complete, same policy
    as the rest of this module.
    """
    html = _html_str(pages, html_col)
    hrefs = F.regexp_extract_all(html, F.lit(_ANCHOR_PAT), 1)
    inners = F.regexp_extract_all(html, F.lit(_ANCHOR_PAT), 2)
    pair = F.explode(F.arrays_zip(hrefs.alias("href"), inners.alias("inner")))
    out = pages.select(F.col(url_col).alias("url"), pair.alias("a"))
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("a.inner"), r"<[^>]*>", " "), r"\s+", " "
        )
    )
    return out.select("url", F.col("a.href").alias("href"), text.alias("anchor_text"))


def anchor_link_priors(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    drop_params: tuple[str, ...] = DEFAULT_DROP_PARAMS,
    min_count: int = 1,
) -> DataFrame:
    """Anchor-text link priors: ``(surface, entity_iri, n, prior)``.

    The classic web-mined entity-linking dictionary — for each anchor
    text (surface form), how often the corpus links it to each
    canonicalized target, and the within-surface fraction ``prior``
    (= n / Σn over the surface).  The output schema deliberately matches
    the gazetteer contract of :func:`rdf_spark.pipeline.run_pipeline`
    (surface, entity_iri, prior), so a crawl can bootstrap its own
    linking dictionary.

    Scale shape: extraction is the JVM projection of
    :func:`extract_anchor_texts`; counting is a map-side-combinable
    groupBy on (surface, target) pairs; the prior is a window over
    ``surface`` — the shuffle moves counted pairs, never HTML, and a
    hot surface costs one window partition, not a driver collect.
    ``min_count`` prunes the long noise tail AFTER the prior is
    computed (denominator stays honest).
    """
    from pyspark.sql.window import Window

    a = extract_anchor_texts(pages, html_col=html_col, url_col=url_col)
    # projection boundaries between strip → resolve → normalize keep
    # each regexp evaluated once (see extract_links)
    bare = a.select(
        F.col("anchor_text").alias("surface"), "url",
        F.regexp_replace("href", r"#.*$", "").alias("_bare"),
    )
    resolved = bare.select(
        "surface", _resolve_bare(F.col("url"), F.col("_bare")).alias("_target")
    )
    pairs = (
        resolved.select(
            "surface",
            normalize_url_col(F.col("_target"), drop_params).alias("entity_iri"),
        )
        .filter(
            (F.col("surface") != "") & F.col("entity_iri").rlike("^https?://")
        )
        .groupBy("surface", "entity_iri")
        .agg(F.count("*").alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy("surface"))
    return (
        pairs.withColumn("prior", F.col("n") / total)
        .filter(F.col("n") >= min_count)
    )


def host_link_graph(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    drop_params: tuple[str, ...] = DEFAULT_DROP_PARAMS,
    keep_self: bool = False,
    pre_resolved: bool = False,
) -> DataFrame:
    """Host-level link graph ``(src, dst, n_links)`` from anchor tags.

    Targets are URL-canonicalized (ops.url rules) before hosts are taken,
    so lookalike spellings collapse map-side.  The only shuffle moves
    (src, dst) host pairs — bytes per edge, never HTML — into a
    map-side-combinable count aggregation.  Output feeds
    :func:`rdf_spark.ops.graph.pagerank` (src/dst columns) directly.

    ``pre_resolved=True`` skips HTML extraction: ``pages`` is already a
    ``(url, href)`` link table with absolute hrefs — e.g.
    :func:`rdf_spark.warc.wat_links` output, the way the real
    Common-Crawl host graph is built (from the WAT sidecar, never
    re-parsing the response corpus).
    """
    links = (pages if pre_resolved
             else extract_links(pages, html_col=html_col, url_col=url_col))
    norm = normalize_url_col(F.col("href"), drop_params)
    src = F.lower(F.regexp_extract(F.col("url"), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1))
    dst = F.lower(F.regexp_extract(norm, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1))
    edges = links.select(src.alias("src"), dst.alias("dst"))
    if not keep_self:
        edges = edges.filter(F.col("src") != F.col("dst"))
    return edges.groupBy("src", "dst").agg(F.count("*").alias("n_links"))


# --------------------------------------------------------------- charset

# WHATWG Encoding Standard label fixups (the ones that matter on real
# crawls): HTML mandates that latin-1-family labels decode as
# windows-1252 (0x80-0x9F are the smart-quote/€ block, not C1 controls)
# and gb2312 as its gbk superset.  Everything else resolves through
# Python's codec registry, unknown labels fall back to UTF-8.
_CHARSET_ALIASES = {
    "iso-8859-1": "cp1252", "iso8859-1": "cp1252", "latin-1": "cp1252",
    "latin1": "cp1252", "us-ascii": "cp1252", "ascii": "cp1252",
    "windows-1252": "cp1252", "gb2312": "gbk", "x-sjis": "shift_jis",
}

# the WHATWG meta prescan, regex-simplified: <meta charset=...> or the
# http-equiv Content-Type form, within the first scan window
_META_CHARSET_PAT = None  # compiled lazily per worker


def _sniff_charset(head: bytes) -> str:
    """BOM > meta prescan > UTF-8.  ``head`` is the first window of the
    page bytes (1024 per the WHATWG prescan)."""
    import re as _re

    global _META_CHARSET_PAT
    if head.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if head.startswith(b"\xff\xfe") or head.startswith(b"\xfe\xff"):
        # the 'utf-16' codec reads endianness from the BOM and strips it
        # (per WHATWG, the BOM is not content)
        return "utf-16"
    if _META_CHARSET_PAT is None:
        _META_CHARSET_PAT = _re.compile(
            rb"""(?is)<meta[^>]+charset\s*=\s*["']?\s*([a-z0-9_\-]+)"""
        )
    m = _META_CHARSET_PAT.search(head)
    if not m:
        return "utf-8"
    label = m.group(1).decode("ascii", "replace").lower()
    label = _CHARSET_ALIASES.get(label, label)
    import codecs

    try:
        codecs.lookup(label)
    except LookupError:
        return "utf-8"
    # a UTF-16 meta label on byte content is self-contradicting (the
    # prescan itself read ASCII-compatible bytes): WHATWG says use UTF-8
    if label.replace("_", "-").startswith("utf-16"):
        return "utf-8"
    return label


def decode_html(
    pages: DataFrame,
    html_col: str = "html",
    out_col: str = "html_text",
    scan_bytes: int = 1024,
) -> DataFrame:
    """Decode a ``binary`` HTML column to a string column with charset
    sniffing: BOM first, then a WHATWG-style ``<meta charset>`` /
    ``http-equiv`` prescan over the first ``scan_bytes`` bytes, then
    UTF-8; all decodes use replacement (never raise) so one mojibake
    page cannot kill a 10^12-page job.  Normalizes an arbitrary-charset
    crawl INTO the pages contract (utf-8 text) the rest of the pipeline
    assumes — run it once at ingest, before parse_html_structured /
    extract_links.

    Scale shape: one Arrow-batched ``pandas_udf`` projection (the
    per-row work is C-level ``bytes.decode``), zero shuffle, narrow —
    partitioning and pushed filters pass straight through.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    def _decode_fn(b):
        def one(raw):
            if raw is None:
                return None
            enc = _sniff_charset(bytes(raw[:scan_bytes]))
            return bytes(raw).decode(enc, "replace")

        return b.map(one)

    _decode = pandas_udf(_decode_fn, StringType())

    if dict(pages.dtypes).get(html_col) != "binary":
        raise ValueError(f"decode_html needs a binary column, "
                         f"{html_col!r} is {dict(pages.dtypes).get(html_col)}")
    return pages.withColumn(out_col, _decode(F.col(html_col)))


# ------------------------------------------------------------- page meta

# attribute order varies in the wild (name before content and the
# reverse), so each field gets both orders, coalesced
_TITLE_PAT = r"(?is)<title[^>]*>(.*?)</title>"


def _meta_pat(attr: str, value: str) -> tuple[str, str]:
    v = value
    return (
        rf"""(?is)<meta\b[^>]*\b{attr}\s*=\s*["']{v}["'][^>]*\bcontent\s*=\s*["']([^"']*)["']""",
        rf"""(?is)<meta\b[^>]*\bcontent\s*=\s*["']([^"']*)["'][^>]*\b{attr}\s*=\s*["']{v}["']""",
    )


_CANON_PATS = (
    r"""(?is)<link\b[^>]*\brel\s*=\s*["']canonical["'][^>]*\bhref\s*=\s*["']([^"']*)["']""",
    r"""(?is)<link\b[^>]*\bhref\s*=\s*["']([^"']*)["'][^>]*\brel\s*=\s*["']canonical["']""",
)


def _first_of(html: Column, pats: tuple[str, ...]) -> Column:
    """First non-empty capture across the patterns ('' when none —
    RE2/Java regexp_extract semantics)."""
    cols = [F.regexp_extract(html, p, 1) for p in pats]
    out = cols[0]
    for c in cols[1:]:
        out = F.when(out != "", out).otherwise(c)
    return F.when(out != "", out)  # '' → NULL: absent field


def _decode_basic_entities(c: Column) -> Column:
    """The five XML entities plus numeric &#39; — the documented subset
    (full HTML5 entity tables stay in the Python parsers)."""
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def canonical_col(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> Column:
    """The page's resolved ``<link rel=canonical>`` target as a Column
    (NULL when undeclared) — a pure projection, so callers
    (dedup_by_canonical) can use it without joining the meta table
    back onto the pages."""
    canon = _first_of(_html_str(pages, html_col), _CANON_PATS)
    return F.when(canon.isNotNull(), _resolve_href(F.col(url_col), canon))


def extract_page_meta(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Per-page head metadata: ``(url, title, description, canonical,
    og_title)`` — the fields a crawl-side KG wants as page-level triples
    (dct:title, schema:description) and the canonical URL that
    deduplicates mirrored pages BEFORE content hashing.

    ``title`` is whitespace-collapsed with the basic XML entities
    decoded; ``description``/``og_title`` come from either attribute
    order of their <meta> tags; ``canonical`` is resolved against the
    page URL (RFC-3986-lite, same resolver as extract_links).  Missing
    fields are NULL, never ''.  Pure JVM projection — zero Python, zero
    shuffle, whole-stage codegen end-to-end.
    """
    html = _html_str(pages, html_col)
    title = F.regexp_extract(html, _TITLE_PAT, 1)
    title = F.trim(F.regexp_replace(title, r"\s+", " "))
    title = _decode_basic_entities(F.when(title != "", title))
    desc = _first_of(html, _meta_pat("name", "description"))
    og = _first_of(html, _meta_pat("property", "og:title"))
    canon = canonical_col(pages, html_col, url_col)
    return pages.select(
        F.col(url_col).alias("url"),
        title.alias("title"),
        _decode_basic_entities(desc).alias("description"),
        canon.alias("canonical"),
        _decode_basic_entities(og).alias("og_title"),
    )
