"""Text-analysis operators for training-data pipelines (graft additions —
no reference analogue; SURVEY.md §2.5 notes the gaps these fill).

Everything here is pure JVM column expressions (whole-stage codegen): at
100 TB these run inside the scan stage with zero Python and zero shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny, fixed stopword lists — a deterministic heuristic, not a model.
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "was", "for", "on"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"]

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (empty-safe)."""
    return F.split(F.trim(text), r"\s+")


def token_count_col(text: Column) -> Column:
    return F.when(F.trim(text) == "", 0).otherwise(F.size(tokens_col(text)))


def bpe_token_count_col(text: Column) -> Column:
    """Sub-word-ish token count via the BPE-style regex."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def _stopword_hits(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def lang_id_col(text: Column) -> Column:
    """n-gram/stopword language heuristic → 'en' | 'de' | 'und' (unknown).

    Deterministic and cheap; a real model would be a pandas UDF behind the
    same column contract.
    """
    en = _stopword_hits(text, EN_STOPWORDS)
    de = _stopword_hits(text, DE_STOPWORDS)
    return (
        F.when((en > de) & (en > 0), "en")
        .when((de > en) & (de > 0), "de")
        .otherwise("und")
    )


# Character-trigram profiles (most-frequent trigrams per language, from
# published frequency tables; spaces mark word boundaries).  One compiled
# alternation per language keeps scoring a handful of JVM regexp_count
# calls — no Python in the hot path, argmax via greatest().
_TRIGRAM_PROFILES: dict[str, list[str]] = {
    "en": [" th", "the", "he ", "ing", "nd ", " an", "and", "ion", "ed ",
           " to", "to ", " of", "of ", "er ", "at ", " in", "hat", "is "],
    "de": ["der", "ein", "sch", " de", "die", "und", " di", "en ", "ich",
           "cht", " un", "ch ", "nde", "ung", "das", "ie ", "gen", "ne "],
    "fr": [" de", "de ", "es ", " le", "le ", "ent", "nt ", "que", " qu",
           "la ", " la", "ion", "re ", " pa", "ous", "ait", "eur", " et"],
    "es": [" de", "de ", "os ", " la", "la ", "el ", " el", "que", " qu",
           "ión", "ent", "as ", " en", "ado", "los", " co", "es ", "ar "],
}


# final alternation string per language — shared verbatim with the DuckDB
# oracle so both sides count exactly the same matches
TRIGRAM_PATTERNS = {
    lang: "|".join(re.escape(g) for g in grams)
    for lang, grams in _TRIGRAM_PROFILES.items()
}


def lang_id_ngram_col(text: Column) -> Column:
    """Character-trigram language heuristic → 'en'|'de'|'fr'|'es'|'und'.

    Scores each language by occurrences of its top trigrams (one RE2
    alternation per language over the lowercased text, space-padded so
    boundary trigrams fire) and takes the argmax; ties and zero scores
    fall to 'und'.  Pure JVM expressions — no Python, no shuffle — the
    n-gram counterpart of the stopword heuristic :func:`lang_id_col`.
    """
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = {
        lang: F.regexp_count(padded, F.lit(pat))
        for lang, pat in TRIGRAM_PATTERNS.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # deterministic tie-break: first language (insertion order) wins;
    # built in reverse so earlier langs override later ones on ties
    for lang in reversed(list(scores)):
        out = F.when((scores[lang] == best) & (best > 0), lang).otherwise(out)
    return out


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality signals + a composite score.

    Score formula (fixed, documented so the DuckDB oracle can mirror it):
      0.4 * clamp(n_tokens/64)            # enough content
    + 0.3 * (1 - punct_ratio)             # not symbol soup
    + 0.3 * clamp(stopword_ratio * 8)     # natural-language-ish
    """
    t = F.coalesce(F.col(text_col), F.lit(""))  # null text scores like empty
    n_chars = F.length(t)
    n_tokens = token_count_col(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    n_stop = _stopword_hits(t, EN_STOPWORDS)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(0.0)
    score = (
        0.4 * F.least(n_tokens / F.lit(64.0), F.lit(1.0))
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * F.least(stop_ratio * 8.0, F.lit(1.0))
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(stop_ratio, 6).alias("q_stopword_ratio"),
        F.round(score, 6).alias("q_score"),
    )


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (A content-defined rolling-hash variant lives in ops.dedup.simhash.)"""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_token_frac: float = 0.60,
    word_len_range: tuple[float, float] = (2.0, 12.0),
) -> DataFrame:
    """Gopher-style within-document repetition signals + keep flag.

    Web text that repeats itself (boilerplate nav lines, keyword-stuffed
    pages, template spam) poisons training corpora; the Gopher / MassiveWeb
    rules filter on duplicate-line/paragraph fractions and token stats.
    All signals here are pure JVM array expressions — they run inside the
    scan stage with zero Python and zero shuffle, so the filter costs one
    pass at any corpus size.

    Emitted columns (fractions rounded to 6 so a SQL oracle can mirror
    them digit-for-digit):

    - ``rep_lines`` / ``rep_dup_line_frac`` — non-blank lines, and the
      fraction of them that duplicate an earlier line.
    - ``rep_dup_para_frac`` — same over ``\\n\\n``-separated paragraphs.
    - ``rep_dup_token_frac`` — 1 − distinct/total whitespace tokens.
    - ``rep_mean_word_len`` — mean token length.
    - ``rep_keep`` — true iff every signal is inside the documented
      thresholds (defaults follow the published rules, loosened for
      short docs: token-repetition naturally rises as docs shrink).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0, (n_lines - F.size(F.array_distinct(lines))) / n_lines
    ).otherwise(0.0)
    paras = F.filter(F.split(t, "\n\n"), lambda x: F.trim(x) != "")
    n_paras = F.size(paras)
    dup_para = F.when(
        n_paras > 0, (n_paras - F.size(F.array_distinct(paras))) / n_paras
    ).otherwise(0.0)
    toks = tokens_col(t)
    n_tokens = token_count_col(t)
    dup_tok = F.when(
        n_tokens > 0, (n_tokens - F.size(F.array_distinct(toks))) / n_tokens
    ).otherwise(0.0)
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_wl = F.when(n_tokens > 0, sum_len / n_tokens).otherwise(0.0)
    lo, hi = word_len_range
    keep = (
        (dup_line <= max_dup_line_frac)
        & (dup_para <= max_dup_para_frac)
        & (dup_tok <= max_dup_token_frac)
        & (mean_wl >= lo)
        & (mean_wl <= hi)
    )
    return df.select(
        "*",
        n_lines.alias("rep_lines"),
        F.round(dup_line, 6).alias("rep_dup_line_frac"),
        F.round(dup_para, 6).alias("rep_dup_para_frac"),
        F.round(dup_tok, 6).alias("rep_dup_token_frac"),
        F.round(mean_wl, 6).alias("rep_mean_word_len"),
        keep.alias("rep_keep"),
    )


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text profile: tokens, language guess, fingerprint,
    quality, and a total PII-hit count (the triage signal for routing a
    document through :func:`redact_pii`)."""
    out = quality_features(df, text_col)
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_pii = sum(
        (F.size(F.regexp_extract_all(t, F.lit(pat), 0)) for _, pat, _ in
         PII_PATTERNS),
        F.lit(0),
    )
    return (
        out.withColumn("lang_guess", lang_id_col(t))
        .withColumn("fingerprint", fingerprint_col(t))
        .withColumn("n_pii", n_pii.cast("long"))
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window RAG chunking: fixed-size token windows with
    overlap, stable per-document chunk ordinals.

    Graft addition — no reference analogue.  The retrieval-indexing
    twin of :func:`rdf_spark.ops.pack.pack_sequences`: packing
    concatenates *across* documents for training; chunking windows
    *within* a document for retrieval, so every chunk carries its
    source identity.

    Window ``i`` (0-based) covers tokens
    ``[i·stride, i·stride + chunk_tokens)`` with
    ``stride = chunk_tokens − overlap``; the last window is the first
    one that reaches the end of the document (it may be short).
    Tokens are the whitespace tokens of :func:`tokens_col` and chunk
    text re-joins them with single spaces — runs of whitespace do not
    survive chunking (the standard RAG-chunker normalization; token
    counts are what the retriever budget sees).  Documents with zero
    tokens produce zero chunks.

    Purely row-local JVM expressions (split / sequence / explode /
    slice) — a narrow map over the corpus, zero shuffle at any scale;
    chunk explosion multiplies rows ≈ n_tokens/stride per doc, the
    same fan-out the downstream embedder pays anyway.

    Returns the input row (minus ``text_col``) plus
    ``chunk_ix, begin_token, n_tokens, chunk_text``.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.when(F.trim(t) == "", F.array().cast("array<string>")) \
        .otherwise(tokens_col(t))
    keep = [c for c in df.columns if c != text_col]
    # n_chunks = 1 + ceil(max(n − chunk_tokens, 0) / stride), in exact
    # integer arithmetic (floor((extra + stride − 1) / stride))
    out = (
        df.withColumn("_toks", toks)
        .filter(F.size("_toks") > 0)
        .withColumn(
            "_n_chunks",
            (F.lit(1) + F.floor(
                (F.greatest(F.size("_toks") - chunk_tokens, F.lit(0))
                 + F.lit(stride - 1)) / F.lit(stride))).cast("int"))
        .withColumn("chunk_ix",
                    F.explode(F.sequence(F.lit(0),
                                         F.col("_n_chunks") - 1)))
        .withColumn("begin_token",
                    (F.col("chunk_ix").cast("long") * stride))
        .withColumn("_slice",
                    F.slice(F.col("_toks"),
                            F.col("begin_token").cast("int") + 1,
                            chunk_tokens))
        .withColumn("n_tokens", F.size("_slice").cast("long"))
        .withColumn("chunk_text", F.array_join("_slice", " "))
    )
    return out.select(
        *keep, "chunk_ix", "begin_token", "n_tokens", "chunk_text")


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 5,
) -> DataFrame:
    """Cross-corpus line-level boilerplate removal (the CCNet/RefinedWeb
    cleaning step): a line whose trimmed form appears in ``min_docs`` or
    more DISTINCT documents is navigation/footer chrome, not content —
    drop it from every document, preserving the order of surviving lines.

    Scale shape (100 TB): lines are keyed by ``xxhash64`` of the trimmed
    line so every shuffle moves 8-byte longs, never line text.  The
    distinct-doc count is two map-side-combinable aggregations —
    ``(hash, doc) distinct`` then ``count per hash`` — NOT
    ``countDistinct`` (whose per-group state concentrates a hot line's
    millions of doc ids on one reducer).  Reassembly is
    ``collect_list(struct(line_no, line))`` bounded by a single
    document's line count.  Hash collisions would merge two distinct
    lines' counts (~2^-64 per pair — accepted and documented; the exact
    variant would key by the line text itself).

    Returns one row per input document: ``(id_col, clean_text, n_kept,
    n_removed)`` — documents whose every line is boilerplate survive
    with an empty ``clean_text``.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(t, "\n")).alias("_ln", "_line"),
    ).withColumn("_tl", F.trim(F.col("_line")))
    hashed = lines.withColumn("_h", F.xxhash64(F.col("_tl")))
    counts = (
        hashed.filter(F.col("_tl") != "")
        .select("_h", id_col)
        .distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_nd"))
    )
    boiler = counts.filter(F.col("_nd") >= min_docs).select("_h")
    kept = hashed.join(
        boiler.withColumn("_bp", F.lit(True)), "_h", "left"
    ).filter(F.col("_bp").isNull() | (F.col("_tl") == ""))
    reassembled = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_ln", "_line"))),
                lambda s: s["_line"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n_total"))
    return (
        totals.join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("_n_total") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


# PII scrub patterns: shared verbatim with the DuckDB oracle, so they use
# only the regex subset Java and RE2 agree on (char classes, bounded
# quantifiers, \b — no lookaround/backrefs).  Applied IN ORDER: the
# email pattern must run before the IP pattern can see a bare host part.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{9,15}\b", "<PHONE>"),
]


def redact_col(text: Column) -> Column:
    """The PII replacement chain as a column expression (shared by
    :func:`redact_pii` and the curation cascade's ``scrub_pii`` stage —
    one definition, one oracle)."""
    red = F.coalesce(text, F.lit(""))
    for _, pat, rep in PII_PATTERNS:
        red = F.regexp_replace(red, pat, rep)
    return red


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-data PII scrub: emails, IPv4 addresses, and international
    phone numbers replaced with typed placeholders, plus per-category
    match counts for the audit trail.

    Pure JVM ``regexp_replace``/``regexp_extract_all`` — runs inside the
    scan with zero shuffle and zero Python at any corpus size.  The
    pattern list is deliberately conservative-deterministic (a
    placeholder regex set, not a PII *detector*): recall tuning belongs
    in the pattern table, the plumbing and audit contract stay fixed.
    Counts are measured on the ORIGINAL text; replacements are chained
    in :data:`PII_PATTERNS` order.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long").alias(
            f"n_{name}"
        )
        for name, pat, _ in PII_PATTERNS
    ]
    return df.select(
        F.col(id_col), redact_col(F.col(text_col)).alias("clean_text"), *counts
    )


_UNICODE_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def unicode_normalize_col(text: Column, form: str = "NFC") -> Column:
    """Unicode normalization of a string column (default NFC — the W3C
    "Character Model" canonical form the reference's conformance inputs
    are already in).  Byte-different but canonically-equivalent spellings
    ("e" + COMBINING ACUTE vs the precomposed "é") collapse, which is a
    prerequisite for exact dedup / URL-keying over real web text.

    Spark has no JVM normalizer expression, so this is the documented
    Arrow-batched Python path (pandas_udf) — never per-row.  Inside each
    batch, rows that contain only ASCII (the overwhelming majority of
    web corpora) are proven-NFC and skipped; only the non-ASCII subset
    pays the normalizer, so at 100 TB the Python cost tracks the foreign
    -script fraction, not the corpus size.
    """
    if form not in _UNICODE_FORMS:
        raise ValueError(f"form must be one of {_UNICODE_FORMS}, got {form!r}")
    import pandas as pd  # noqa: F401  (worker-side import)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):  # type: ignore[no-untyped-def]
        # ASCII is closed under every normalization form: skip those rows
        mask = s.notna() & s.str.contains(r"[^\x00-\x7F]", regex=True)
        if not mask.any():
            return s
        out = s.copy()
        out[mask] = out[mask].str.normalize(form)
        return out

    return _norm(text)


def unicode_normalize(
    df: DataFrame,
    text_col: str = "text",
    out: str = "text_nfc",
    form: str = "NFC",
) -> DataFrame:
    """Add ``out`` = the ``form``-normalized text (see
    :func:`unicode_normalize_col`).  Row-local, zero shuffle."""
    return df.withColumn(out, unicode_normalize_col(F.col(text_col), form))


def hashed_classifier_score(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    out_col: str = "clf_score",
    bias: float = 0.0,
) -> DataFrame:
    """fastText-style hashed linear classifier scoring —
    ``sigmoid(bias + mean(weights[h(token) % D]))`` per document.

    The production quality-filter shape (CCNet/DCLM-style fastText
    models): a trained weight vector indexed by hashing-trick buckets,
    applied corpus-wide.  Everything is row-local JVM (split → md5
    bucket → weight lookup → fold) — zero shuffle, zero Python, the
    whole 100 TB pass is a narrow projection over the text scan.

    Reproducible-numerics contract: per-token weights are cast to
    DECIMAL(20,10) and folded with exact decimal addition, so the sum
    is token-order- and partitioning-independent; the mean and sigmoid
    are then single IEEE ops rounded to 6 dp (the repo's standard
    cross-engine pattern — supply weights with ≤10 decimal places, e.g.
    multiples of 1/64, for bit-exact DuckDB replay).  The bucket hash
    is the first 15 hex digits of md5 (fits a signed 64-bit int; both
    engines parse hex identically), NOT xxhash64 — DuckDB has no
    xxhash64, and determinism beats speed for an audit-replayable
    score.  Empty/blank documents score ``sigmoid(bias)``.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    d = len(weights)
    warr = F.array(*[F.lit(float(w)) for w in weights])
    toks = F.filter(tokens_col(F.col(text_col)), lambda t: t != "")

    def _contrib(t: Column) -> Column:
        b = F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint") % d
        return F.element_at(warr, (b + 1).cast("int")).cast("decimal(20,10)")

    zero = F.lit(0).cast("decimal(20,10)")
    # decimal + decimal widens to (21,10); the fold must return the
    # accumulator type — cast back each step (scale is preserved, and
    # per-token weights keep any real sum far from 10^10 overflow)
    ssum = F.aggregate(
        toks, zero, lambda acc, t: (acc + _contrib(t)).cast("decimal(20,10)")
    )
    n = F.size(toks)
    z = F.when(n > 0, F.lit(float(bias)) + ssum.cast("double") / n).otherwise(
        F.lit(float(bias))
    )
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return df.withColumn(out_col, score)


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_lines: int = 3,
) -> DataFrame:
    """C4-style line and page cleaning (Raffel et al. 2020, §2.2) →
    ``(id, clean_text, n_lines_kept, n_lines_dropped, keep)``.

    Line rules (a line survives only if ALL hold):
    * ends in terminal punctuation — ``.``, ``!``, ``?`` or a closing
      double quote after one — after trailing-whitespace trim;
    * has at least ``min_words_per_line`` whitespace words.

    Page rules (``keep``): at least ``min_lines`` surviving lines, no
    ``lorem ipsum``, and no ``{`` anywhere (code page heuristic) —
    evaluated on the ORIGINAL text, as in C4.  ``clean_text`` is the
    surviving lines re-joined in order.

    Pure JVM array expressions (split → filter lambda → re-join): zero
    shuffle, zero Python, streaming-microbatch safe — and every rule is
    a list-function one-liner a SQL engine replays verbatim.
    """
    cols = c4_cols(F.col(text_col), min_words_per_line, min_lines)
    return df.select(
        F.col(id_col),
        cols["clean_text"].alias("clean_text"),
        cols["n_lines_kept"].alias("n_lines_kept"),
        cols["n_lines_dropped"].alias("n_lines_dropped"),
        cols["keep"].alias("keep"),
    )


def c4_cols(
    text: Column, min_words_per_line: int = 5, min_lines: int = 3
) -> dict[str, Column]:
    """The :func:`c4_clean` rule expressions over an arbitrary text
    column — row-local, so the curation cascade (and any streaming
    micro-batch) can splice them in without a join-back."""
    raw = F.coalesce(text, F.lit(""))
    line_ok = lambda ln: (  # noqa: E731
        F.size(
            F.filter(F.split(F.trim(ln), r"\s+"), lambda w: w != "")
        ) >= min_words_per_line
    ) & F.rtrim(ln).rlike('[.!?]"?$')
    kept = F.filter(F.split(raw, "\n"), line_ok)
    n_all = F.size(F.split(raw, "\n"))
    page_ok = (
        (F.size(kept) >= min_lines)
        & ~F.lower(raw).contains("lorem ipsum")
        & ~raw.contains("{")
    )
    return {
        "clean_text": F.array_join(kept, "\n"),
        "n_lines_kept": F.size(kept).cast("long"),
        "n_lines_dropped": (n_all - F.size(kept)).cast("long"),
        "keep": page_ok,
    }
