"""Extraction stages: html → text (byte-identical invariant), embedded-RDF
block extraction, mention detection, entity-link scoring (SURVEY.md §2.6).

All text work is vectorized pandas string ops inside ``mapInPandas`` /
JVM regex columns — no per-row Python (BASELINE.json input_hint mandate).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCRIPT_RE = re.compile(r"<script\b[^>]*>.*?</script>", re.S | re.I)
_STYLE_RE = re.compile(r"<style\b[^>]*>.*?</style>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_TTL_BLOCK_RE = re.compile(
    r'<script\s+type="text/turtle"\s*>(.*?)</script>', re.S | re.I
)


def extract_text(html: bytes | str) -> str:
    """THE reference text extractor: drop script/style blocks, strip tags,
    collapse whitespace, trim.  Deterministic and pure — the per-url
    byte-identical invariant (BASELINE.json:15) is against this function.
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", html)
    s = _STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    return _WS_RE.sub(" ", s).strip()


def extract_turtle_blocks(html: bytes | str) -> str:
    """Concatenate all embedded ``<script type="text/turtle">`` blocks."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    return "\n".join(m.group(1) for m in _TTL_BLOCK_RE.finditer(html))


def extract_stage(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) → + extracted_text, rdf_text columns.

    Narrow stage (no shuffle); vectorized via pandas ``str`` ops over
    Arrow batches.

    Pages with a null ``html`` but a non-null ``text`` column (WET
    shards — Common Crawl's pre-extracted plain text, see
    rdf_spark.warc.pages_from_wet) pass ``text`` through as the
    extracted text verbatim: WET ships no markup, so the payload IS
    the extraction and the byte-identical invariant holds trivially.
    """
    out_ddl = "url string, extracted_text string, rdf_text string"

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raw = pdf["html"]
            html = raw.map(
                lambda b: b if isinstance(b, str)
                else bytes(b).decode("utf-8", errors="replace")
                if b is not None else ""
            )
            no_script = html.str.replace(_SCRIPT_RE, " ", regex=True)
            no_style = no_script.str.replace(_STYLE_RE, " ", regex=True)
            no_tags = no_style.str.replace(_TAG_RE, " ", regex=True)
            text = no_tags.str.replace(_WS_RE, " ", regex=True).str.strip()
            if "text" in pdf.columns:
                provided = raw.isna() & pdf["text"].notna()
                if provided.any():
                    text = text.mask(provided, pdf["text"])
            rdf = html.str.extractall(_TTL_BLOCK_RE)[0].groupby(level=0).agg("\n".join)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "extracted_text": text,
                    "rdf_text": rdf.reindex(pdf.index).fillna(""),
                }
            )

    return pages.mapInPandas(run, out_ddl)


def _nonnested_overlaps(surfaces: list[str]) -> bool:
    """True when two surfaces can overlap in text WITHOUT one containing
    the other — i.e. a non-empty proper suffix of one equals a prefix of
    the other (e.g. 'ab'/'bc' across 'abc').  Containment-nested
    gazetteers (a ⊂ ab ⊂ abc) return False."""
    for s in surfaces:
        for t in surfaces:
            if s == t or s in t or t in s:
                continue
            for k in range(1, min(len(s), len(t))):
                if s[-k:] == t[:k]:
                    return True
    return False


#: Above this many distinct surfaces the single alternation regex stops
#: being viable (Python re alternation of literals is O(|alternatives|)
#: per scan position, and the compiled pattern itself grows unbounded);
#: detect_mentions switches to the Aho-Corasick automaton, which matches
#: in O(|text|) regardless of dictionary size.
AHO_THRESHOLD = 10_000


def detect_mentions(text_df: DataFrame, aliases: DataFrame,
                    text_col: str = "extracted_text",
                    engine: str = "auto",
                    surfaces: list[str] | None = None) -> DataFrame:
    """Candidate mention detection: count occurrences of every gazetteer
    surface per document → (url, surface, n_hits).

    The gazetteer is broadcast into the UDF closure once per executor.
    Two engines with IDENTICAL match semantics (leftmost scan, longest
    surface wins at each position, matches never overlap):

    - ``regex`` — one compiled longest-first alternation over the batch
      (vectorized ``str.extractall``).  Fastest for small dictionaries,
      but Python re alternation degrades superlinearly with dictionary
      size: unusable at real entity-linking scale (10^5-10^7 surfaces).
    - ``aho`` — Aho-Corasick automaton (rdf_spark.automaton, pure
      Python, no external dep): O(|text|) matching independent of
      dictionary size; all-occurrence hits are reduced to the regex's
      non-overlapping-longest-first semantics by a greedy interval pass.

    ``engine="auto"`` picks regex below :data:`AHO_THRESHOLD` distinct
    surfaces and aho at or above it.  Equivalence between engines is
    asserted by tests on overlapping-surface gazetteers.

    ``surfaces`` (optional) skips the dictionary collect when the caller
    already holds the surface list — :func:`rdf_spark.pipeline.run_pipeline`
    collects the gazetteer exactly once per run and reuses it here.
    """
    if surfaces is None:
        surfaces = [r.surface for r in aliases.select("surface").distinct().collect()]
    else:
        surfaces = list(dict.fromkeys(surfaces))
    # longest-first alternation so overlapping surfaces prefer the longest match
    surfaces.sort(key=len, reverse=True)
    if engine not in ("auto", "regex", "aho"):
        raise ValueError(f"detect_mentions engine must be auto|regex|aho, got {engine!r}")
    use_aho = engine == "aho" or (engine == "auto" and len(surfaces) >= AHO_THRESHOLD)

    if use_aho:
        from rdf_spark.automaton import AhoCorasick

        # broadcast, not closure-capture: a 10^5–10^7-surface automaton
        # ships to each executor once instead of once per task
        ac_bc = text_df.sparkSession.sparkContext.broadcast(AhoCorasick(surfaces))

        def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ac = ac_bc.value
            for pdf in it:
                urls, hit_surfaces, n_hits = [], [], []
                for url, text in zip(pdf["url"], pdf[text_col].fillna("")):
                    for surface, c in ac.count_nonoverlapping(text).items():
                        urls.append(url)
                        hit_surfaces.append(surface)
                        n_hits.append(c)
                yield pd.DataFrame(
                    {"url": urls, "surface": hit_surfaces, "n_hits": n_hits}
                )

        return text_df.mapInPandas(run, "url string, surface string, n_hits long")

    pattern = re.compile("(" + "|".join(re.escape(s) for s in surfaces) + ")")

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hits = pdf[text_col].str.extractall(pattern)
            if len(hits) == 0:
                yield pd.DataFrame({"url": [], "surface": [], "n_hits": []})
                continue
            hits = hits.rename(columns={0: "surface"}).reset_index(level=1, drop=True)
            hits["url"] = pdf["url"].reindex(hits.index)
            agg = hits.groupby(["url", "surface"], sort=False).size().reset_index(name="n_hits")
            yield agg[["url", "surface", "n_hits"]]

    return text_df.mapInPandas(run, "url string, surface string, n_hits long")


def link_entities(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """Entity-link scoring: mention × candidate → best entity per
    (url, surface).

    Broadcast hash join (alias dictionaries are small — SURVEY.md §2.5
    joins row); score = prior * log1p(hits); deterministic top-1 via a
    window ordered by (score desc, entity_iri) so ties break stably.
    """
    scored = mentions.join(F.broadcast(aliases), "surface").withColumn(
        "score", F.col("prior") * F.log1p(F.col("n_hits"))
    )
    w = Window.partitionBy("url", "surface").orderBy(
        F.desc("score"), F.asc("entity_iri")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .drop("rank")
    )


def disambiguate_mentions(mentions: DataFrame, aliases: DataFrame,
                          relatedness: DataFrame,
                          coherence_weight: float = 1.0) -> DataFrame:
    """Collective entity disambiguation: re-rank each mention's candidate
    entities by document-context coherence, not prior popularity alone.

    :func:`link_entities` scores ``prior * log1p(n_hits)`` — context-free,
    so an ambiguous surface always resolves to its highest-prior sense in
    every document.  This pass adds the standard coherence signal
    (Milne-Witten style relatedness voting): candidates that are related
    to entities the document UNAMBIGUOUSLY mentions elsewhere score
    higher, flipping e.g. "Paris" to the Texan city on pages that also
    mention unambiguous Texas entities.

    Inputs
      mentions:    (url, surface, n_hits) from :func:`detect_mentions`
      aliases:     (surface, entity_iri, prior) candidate dictionary —
                   e.g. :func:`rdf_spark.ops.html.anchor_link_priors`
      relatedness: (entity_a, entity_b) undirected entity-relatedness
                   edges (KG adjacency, anchor co-occurrence, …);
                   symmetrized here, self-loops ignored

    Scoring: ``score = prior * log1p(n_hits) * (1 + w * coherence)``
    where ``coherence`` = number of DISTINCT context entities of the
    same document related to the candidate, and a context entity is the
    single sense of any surface that is unambiguous in ``aliases``.
    Top-1 per (url, surface) with deterministic (score desc, entity_iri)
    tie-break, like :func:`link_entities`.

    Scale shape (100 TB crawl, 10^7-entity dictionary): ``aliases`` is
    broadcast twice (candidate join + ambiguity split); the relatedness
    join runs context-first — ``context ⋈ relatedness`` shuffles on
    entity BEFORE any per-mention fan-out, then collapses to one
    ``(url, entity, coherence)`` row per supported candidate, so the
    wide (url × surface × candidate) table only ever joins per-url
    aggregates, never raw edges.  All joins/aggs are plain Catalyst
    ops — AQE handles hot-entity skew.
    """
    n_senses = aliases.groupBy("surface").agg(
        F.count(F.lit(1)).alias("_n_senses")
    )
    alias_tagged = aliases.join(F.broadcast(n_senses), "surface")

    cand = mentions.join(F.broadcast(alias_tagged), "surface")

    # context = the unique sense of every unambiguous surface, per url
    context = (
        cand.filter(F.col("_n_senses") == 1)
        .select("url", F.col("entity_iri").alias("_ctx"))
        .distinct()
    )

    # symmetrize edges, drop self-loops, then count distinct supporting
    # context entities per (url, candidate entity)
    rel = (
        relatedness.select(F.col("entity_a").alias("_e"),
                           F.col("entity_b").alias("_nbr"))
        .unionByName(relatedness.select(
            F.col("entity_b").alias("_e"), F.col("entity_a").alias("_nbr")))
        .filter(F.col("_e") != F.col("_nbr"))
        .distinct()
    )
    support = (
        context.join(rel, context["_ctx"] == rel["_nbr"])
        .select("url", F.col("_e").alias("entity_iri"), "_ctx")
        .groupBy("url", "entity_iri")
        .agg(F.count_distinct("_ctx").alias("coherence"))
    )

    scored = (
        cand.join(support, ["url", "entity_iri"], "left")
        .withColumn("coherence",
                    F.coalesce(F.col("coherence"), F.lit(0)))
        .withColumn(
            "score",
            F.col("prior") * F.log1p(F.col("n_hits"))
            * (F.lit(1.0) + F.lit(float(coherence_weight)) * F.col("coherence")),
        )
    )
    w = Window.partitionBy("url", "surface").orderBy(
        F.desc("score"), F.asc("entity_iri")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select("url", "surface", "entity_iri", "n_hits", "prior",
                "coherence", "score")
    )


MENTIONS_PREDICATE = "http://kg.example/vocab#mentions"


class _GazetteerContext:
    """Precomputed gazetteer matching state for the fused link stage.

    Holds the per-surface best entity (score = prior*log1p(n) with n
    identical across a surface's candidates ⇒ argmax is max prior, tie
    broken by min entity — a pure per-surface constant: no join, no
    window) plus one of three matching engines with IDENTICAL
    non-overlapping longest-first semantics:

    - ``vectorized`` (default, < :data:`AHO_THRESHOLD` surfaces):
      per-surface RE2 ``count_substring`` with containment-nested
      subtraction — O(|surfaces|·|text|) but zero per-row Python.
    - ``exact_fallback`` (small dictionaries whose surfaces overlap
      WITHOUT nesting, e.g. 'ab'/'bc' across 'abc', where the subtract
      scheme would double-count): the alternation regex per batch,
      bit-identical to detect_mentions by construction.
    - ``aho`` (≥ AHO_THRESHOLD surfaces): the Aho-Corasick automaton —
      O(|text|) matching independent of dictionary size, exact
      non-overlapping longest-first by the same greedy interval pass as
      detect_mentions' aho engine.

    Built lazily ONCE PER WORKER from a broadcast (see
    :func:`_gazetteer_ctx`) so a 10^5–10^7-surface dictionary ships to
    each executor once instead of re-serializing into every task closure.
    """

    def __init__(self, alias_rows: list[tuple[str, str, float]],
                 engine: str = "auto"):
        if engine not in ("auto", "aho", "vectorized"):
            raise ValueError(
                f"gazetteer engine must be auto|aho|vectorized, got {engine!r}"
            )
        tmp: dict[str, tuple[str, float]] = {}
        for s, e, p in alias_rows:
            cur = tmp.get(s)
            if cur is None or p > cur[1] or (p == cur[1] and e < cur[0]):
                tmp[s] = (e, p)
        self.best_entity = {s: ep[0] for s, ep in tmp.items()}
        self.surfaces = sorted(self.best_entity, key=len, reverse=True)
        self.use_aho = engine == "aho" or (
            engine == "auto" and len(self.surfaces) >= AHO_THRESHOLD
        )
        self.automaton = None
        self.containers: dict[str, list[tuple[str, int]]] = {}
        self.exact_fallback = False
        self.alt_pattern = None
        if self.use_aho:
            from rdf_spark.automaton import AhoCorasick

            self.automaton = AhoCorasick(self.surfaces)
        else:
            # surface → [(longer surface containing it, occurrences inside)]
            self.containers = {
                s: [(t, t.count(s)) for t in self.surfaces if t != s and s in t]
                for s in self.surfaces
            }
            self.exact_fallback = _nonnested_overlaps(self.surfaces)
            self.alt_pattern = (
                re.compile(
                    "(" + "|".join(re.escape(s) for s in self.surfaces) + ")"
                )
                if self.exact_fallback and self.surfaces
                else None
            )


#: per-worker memo: broadcast → built _GazetteerContext (the automaton /
#: containment tables are O(dictionary) to build; do it once per python
#: worker process, not once per task)
_GAZ_CTX_CACHE: dict = {}


def _gazetteer_ctx(source, engine: str = "auto") -> _GazetteerContext:
    from pyspark.broadcast import Broadcast

    if isinstance(source, Broadcast):
        key = (getattr(source, "_path", None) or id(source), engine)
        ctx = _GAZ_CTX_CACHE.get(key)
        if ctx is None:
            ctx = _GazetteerContext(source.value, engine)
            _GAZ_CTX_CACHE[key] = ctx
        return ctx
    return _GazetteerContext(source, engine)


def fused_extract_parse_link(
    pages: DataFrame,
    alias_rows,
    predicate: str = MENTIONS_PREDICATE,
    engine: str = "auto",
) -> DataFrame:
    """ONE narrow stage: html → extracted text → Turtle parse → mention
    scoring → tagged row stream.

    Why fused: splitting extract/parse/link into separate DataFrame branches
    makes Spark recompute the (expensive) extraction once per consumer, and
    the broadcast-join + window top-1 adds a shuffle that pure per-document
    scoring doesn't need — the gazetteer is global, so the best entity per
    (url, surface) is computable inside the batch.  At 10^12 pages this is
    the difference between one scan and three.

    ``alias_rows`` is either a list of ``(surface, entity_iri, prior)``
    tuples (small dictionaries; precomputed driver-side and shipped via
    closure) or a ``pyspark.Broadcast`` of that list — the scale path:
    the dictionary ships to each executor once and the matching state
    (:class:`_GazetteerContext`, including the Aho-Corasick automaton at
    ≥ AHO_THRESHOLD surfaces) is built once per worker process.

    Output rows are tagged: err=null → triple row (link triples use
    ``predicate``); err!=null → quarantine row.  Also emits a per-page
    extraction-invariant violation row (err='extract mismatch') when the
    pages table carries a reference ``text`` column that differs from the
    extractor output (BASELINE.json byte-identical invariant).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from rdf_spark import parsing
    from pyspark.broadcast import Broadcast

    gaz_source = alias_rows
    # plain list → build eagerly (driver-side, shipped in the closure,
    # exactly the pre-round-5 behavior); Broadcast → defer to the workers.
    # ``engine`` ("auto"|"aho"|"vectorized") forces the matching engine —
    # it travels in the closure, so it reaches the worker-side build too.
    eager_ctx = (
        None if isinstance(gaz_source, Broadcast)
        else _GazetteerContext(gaz_source, engine)
    )

    out_ddl = (
        "url string, s string, s_kind tinyint, p string, o string, "
        "o_kind tinyint, o_datatype string, o_lang string, err string"
    )
    out_fields = [
        ("url", pa.string()), ("s", pa.string()), ("s_kind", pa.int8()),
        ("p", pa.string()), ("o", pa.string()), ("o_kind", pa.int8()),
        ("o_datatype", pa.string()), ("o_lang", pa.string()), ("err", pa.string()),
    ]
    out_schema = pa.schema(out_fields)
    _TTL_FIRST = r'(?s)<script\s+type="text/turtle"\s*>(?P<block>.*?)</script>'

    def run(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        ctx = eager_ctx if eager_ctx is not None else _gazetteer_ctx(gaz_source, engine)
        for batch in it:
            tbl = pa.Table.from_batches([batch])
            names = tbl.column_names
            html = pc.cast(tbl.column("html"), pa.string())
            # RE2 replace chain: drop script/style, strip tags, squash ws
            s1 = pc.replace_substring_regex(html, pattern=r"(?is)<script\b[^>]*>.*?</script>", replacement=" ")
            s2 = pc.replace_substring_regex(s1, pattern=r"(?is)<style\b[^>]*>.*?</style>", replacement=" ")
            s3 = pc.replace_substring_regex(s2, pattern=r"<[^>]*>", replacement=" ")
            s4 = pc.replace_substring_regex(s3, pattern=r"\s+", replacement=" ")
            text = pc.utf8_trim_whitespace(s4)

            urls = tbl.column("url").to_pylist()
            n = len(urls)

            parts: list[pa.Table] = []

            # 1. extraction invariant rows.  WET pages (null html,
            #    non-null text — warc.pages_from_wet) use the provided
            #    text AS the extraction: WET ships no markup, so the
            #    payload is the extraction by definition and the
            #    invariant below is trivially satisfied (text == ref).
            if "text" in names:
                ref = pc.cast(tbl.column("text"), pa.string())
                text = pc.if_else(html.is_valid(), text, ref)
                bad_mask = pc.and_kleene(ref.is_valid(), pc.not_equal(text, ref))
                bad_urls = pc.filter(tbl.column("url"), pc.fill_null(bad_mask, False))
                nb = len(bad_urls)
                if nb:
                    parts.append(pa.table({
                        "url": bad_urls,
                        "s": pa.nulls(nb, pa.string()), "s_kind": pa.nulls(nb, pa.int8()),
                        "p": pa.nulls(nb, pa.string()), "o": pa.nulls(nb, pa.string()),
                        "o_kind": pa.nulls(nb, pa.int8()),
                        "o_datatype": pa.nulls(nb, pa.string()),
                        "o_lang": pa.nulls(nb, pa.string()),
                        "err": pa.array(["extract mismatch"] * nb),
                    }, schema=out_schema))

            # 2. embedded Turtle parse (first block vectorized; rare
            #    multi-block pages via findall fallback)
            first_block = pc.extract_regex(html, pattern=_TTL_FIRST)
            n_blocks = pc.count_substring_regex(html, pattern='<script\\s+type="text/turtle"')
            blocks = first_block.combine_chunks() if isinstance(first_block, pa.ChunkedArray) else first_block
            block_list = pc.struct_field(blocks, "block").to_pylist() if len(blocks) else []
            multi = pc.greater(n_blocks, 1).to_pylist()
            html_list = None
            recs: list[tuple] = []
            for i in range(n):
                rdf = block_list[i] if i < len(block_list) else None
                if multi[i]:
                    if html_list is None:
                        html_list = html.to_pylist()
                    rdf = "\n".join(_TTL_BLOCK_RE.findall(html_list[i]))
                if not rdf:
                    continue
                url = urls[i]
                try:
                    for r in parsing.parse_turtle(rdf, base=url):
                        recs.append((url,) + tuple(r) + (None,))
                except parsing.QUARANTINE_ERRORS as e:
                    recs.append((url,) + (None,) * 7 + (str(e),))
            if recs:
                parts.append(pa.table(
                    [pa.array([r[i] for r in recs], type=f.type)
                     for i, f in enumerate(out_schema)],
                    schema=out_schema,
                ))

            # 3. link triples.  Engine per _GazetteerContext (identical
            #    non-overlapping longest-first semantics in all three):
            #    - aho: O(|text|) automaton scan per doc, dictionary-size
            #      independent — the ≥AHO_THRESHOLD scale path
            #    - vectorized: per-surface RE2 count; occurrences of a
            #      shorter surface inside a longer surface's (already-
            #      adjusted) matches are subtracted, longest-first, so
            #      nesting chains (a ⊂ ab ⊂ abc) resolve correctly
            #    - exact alternation fallback for non-nested-overlapping
            #      gazetteers where the subtract scheme would double-count
            if ctx.use_aho:
                u_l: list[str] = []
                o_l: list[str] = []
                for i, t in enumerate(text.to_pylist()):
                    if not t:
                        continue
                    for surface in ctx.automaton.count_nonoverlapping(t):
                        u_l.append(urls[i])
                        o_l.append(ctx.best_entity[surface])
                if u_l:
                    nm = len(u_l)
                    parts.append(pa.table({
                        "url": pa.array(u_l), "s": pa.array(u_l),
                        "s_kind": pa.array([1] * nm, pa.int8()),
                        "p": pa.array([predicate] * nm),
                        "o": pa.array(o_l),
                        "o_kind": pa.array([1] * nm, pa.int8()),
                        "o_datatype": pa.nulls(nm, pa.string()),
                        "o_lang": pa.nulls(nm, pa.string()),
                        "err": pa.nulls(nm, pa.string()),
                    }, schema=out_schema))
                adjusted = None
            elif ctx.exact_fallback:
                ts = pd.Series(text.to_pylist())
                counts = {s: [0] * n for s in ctx.surfaces}
                hits = ts.str.extractall(ctx.alt_pattern) if ctx.alt_pattern else pd.DataFrame()
                if len(hits):
                    grouped_hits = hits[0].groupby(
                        [hits.index.get_level_values(0), hits[0]]
                    ).size()
                    for (row_i, surface), c in grouped_hits.items():
                        counts[surface][row_i] = int(c)
                adjusted = {s: pa.array(v, pa.int64()) for s, v in counts.items()}
            else:
                raw = {s: pc.count_substring(text, pattern=s) for s in ctx.surfaces}
                adjusted = {}
                for surface in ctx.surfaces:  # sorted longest-first
                    cnt = raw[surface]
                    for longer, mult in ctx.containers[surface]:
                        cnt = pc.subtract(cnt, pc.multiply(adjusted[longer], mult))
                    adjusted[surface] = cnt
            if adjusted is not None:
                for surface in ctx.surfaces:
                    mask = pc.greater(adjusted[surface], 0)
                    m_urls = pc.filter(tbl.column("url"), mask)
                    nm = len(m_urls)
                    if nm == 0:
                        continue
                    parts.append(pa.table({
                        "url": m_urls,
                        "s": m_urls,
                        "s_kind": pa.array([1] * nm, pa.int8()),
                        "p": pa.array([predicate] * nm),
                        "o": pa.array([ctx.best_entity[surface]] * nm),
                        "o_kind": pa.array([1] * nm, pa.int8()),
                        "o_datatype": pa.nulls(nm, pa.string()),
                        "o_lang": pa.nulls(nm, pa.string()),
                        "err": pa.nulls(nm, pa.string()),
                    }, schema=out_schema))

            if not parts:
                continue
            out = pa.concat_tables(parts).combine_chunks()
            for ob in out.to_batches():
                if len(ob):
                    yield ob

    return pages.mapInArrow(run, out_ddl)


def emit_link_triples(links: DataFrame,
                      predicate: str = MENTIONS_PREDICATE) -> DataFrame:
    """Linked entities → canonical triple rows (pure projection)."""
    return links.select(
        F.col("url").alias("s"),
        F.lit(1).cast("tinyint").alias("s_kind"),
        F.lit(predicate).alias("p"),
        F.col("entity_iri").alias("o"),
        F.lit(1).cast("tinyint").alias("o_kind"),
        F.lit(None).cast("string").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.col("url"),
    )
