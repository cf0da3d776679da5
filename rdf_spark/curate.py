"""Composed corpus curation: the end-to-end "web crawl → training mix"
selection pipeline (graft addition — the reference, rdf.go:14-22, stops
at parsing; a 100 TB pipeline must also decide which documents to keep).

Stage order (fixed, documented — the audit column says exactly why each
document left):

1. ``lang``        — language not in the allow-list (ops.text.lang_id
                     or a trusted upstream column).
2. ``quality``     — composite quality score below threshold
                     (ops.text.quality_features).
3. ``repetition``  — Gopher-style within-doc repetition filter
                     (ops.text.repetition_features).
4. ``duplicate``   — exact content duplicate (normalized-text md5) of a
                     *surviving* earlier document; the smallest doc_id in
                     each duplicate class is kept.  Dedup runs among
                     stage-1..3 survivors so a filtered-out page can
                     never shadow a keepable one.
5. ``near_dup``    — OPTIONAL (``near_dup={...}``): MinHash-LSH
                     near-duplicate clustering (ops.dedup.
                     near_dup_clusters) among the exact-dedup survivors;
                     each cluster keeps its smallest doc_id, the rest
                     drop as ``near_dup``.  Off by default — it is the
                     most expensive stage (signature pass + band shuffle
                     + verify join + iterative CC) and, like boilerplate
                     stripping, has no streaming twin (cross-batch
                     near-dup state is unbounded).
6. ``dsir``        — OPTIONAL (``dsir=dict(target=..., min_logw=...)``):
                     DSIR importance gate (ops.dsir) — documents whose
                     hashed-n-gram log importance weight against the
                     target corpus falls below ``min_logw`` drop; the
                     weight itself stays on the output (``dsir_logw``)
                     as a downstream mixing signal.  Corpus-wide, no
                     streaming twin.
7. ``sampled_out`` — deterministic md5-threshold sample (ops.sample):
                     the reproducible training-mix knob.
8. ``host_capped`` — OPTIONAL (``host_cap=(col, N)``): at most N kept
                     rows per distinct ``col`` value (per-host/domain
                     quota — a hot domain must not dominate the mix);
                     survivors chosen by md5 rank of the key, so
                     parallelism-invariant and SQL-replayable.

Scale shape: stages 1-3 and 5 are row-local JVM expressions fused into
the scan (zero shuffle, zero Python).  Stage 4 is the pipeline's ONLY
shuffle — a partial-aggregated ``groupBy(fingerprint).min(doc_id)``
joined back on fingerprint.  min-per-key is chosen over a window
``row_number`` deliberately: the aggregate combines map-side, so a hot
fingerprint (a boilerplate page duplicated 10^6×) arrives at one reducer
as per-mapper partial minima, not 10^6 buffered rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_spark.ops import sample as smp
from rdf_spark.ops import text as txt


def curation_flags(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    classifier: dict | None = None,
) -> DataFrame:
    """Row-local stage flags: quality/repetition feature columns plus
    ``_fp`` (content fingerprint), ``_lang_ok``/``_qual_ok``/``_rep_ok``
    (and ``_clf_ok`` when a classifier gate is configured) and their
    conjunction ``_eligible``.  Pure JVM expressions — shared by the
    batch cascade and the streaming variant (row-local ⇒ trivially
    valid per micro-batch).

    ``classifier=dict(weights=[...], min_score=s[, bias=b])`` adds a
    model-based quality gate: ops.text.hashed_classifier_score (the
    fastText-style hashed linear scorer) on the same text the heuristic
    flags see; docs scoring below ``min_score`` gain reason
    ``classifier``.
    """
    feat = txt.repetition_features(txt.quality_features(df, text_col), text_col)
    feat = feat.withColumn(
        "_fp", txt.fingerprint_col(F.coalesce(F.col(text_col), F.lit("")))
    )
    # isin over a NULL lang yields NULL, which would slip through every
    # NOT-guard in the reason cascade and KEEP an allow-list-violating
    # doc — coalesce the flag to a real boolean (null lang = not allowed)
    lang_ok = F.coalesce(F.col(lang_col).isin(*langs), F.lit(False))
    qual_ok = F.col("q_score") >= min_quality
    rep_ok = F.col("rep_keep")
    eligible = lang_ok & qual_ok & rep_ok
    feat = (
        feat.withColumn("_lang_ok", lang_ok)
        .withColumn("_qual_ok", qual_ok)
        .withColumn("_rep_ok", rep_ok)
    )
    if classifier is not None:
        clf = dict(classifier)
        min_score = clf.pop("min_score")
        feat = txt.hashed_classifier_score(feat, text_col=text_col, **clf)
        clf_ok = F.col("clf_score") >= min_score
        feat = feat.withColumn("_clf_ok", clf_ok)
        eligible = eligible & clf_ok
    return feat.withColumn("_eligible", eligible)


def curate_report(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    sample_rate: float = 1.0,
    key_col: str = "doc_id",
    c4: dict | bool | None = None,
    strip_boilerplate: int | None = None,
    scrub_pii: bool = False,
    span_dedup_ngram: int | None = None,
    near_dup: dict | None = None,
    host_cap: tuple[str, int] | None = None,
    classifier: dict | None = None,
    dsir: dict | None = None,
) -> DataFrame:
    """Audit view: every input row with ``drop_reason`` (null = kept).

    ``dsir=dict(target=<DataFrame>, min_logw=x[, n=, n_buckets=,
    alpha=])`` adds a DSIR importance gate (ops.dsir.dsir_weights):
    every document is scored against the target corpus's hashed n-gram
    distribution (the raw distribution is THIS corpus, post
    text-preprocessing) and rows below ``min_logw`` drop with reason
    ``dsir`` — after ``near_dup``, before ``sampled_out``.  The
    ``dsir_logw`` column is kept on the output as a mixing signal.
    Corpus-wide (two bounded bucket aggregates), so like boilerplate /
    span-dedup it has no streaming twin; documents with no n-grams
    score 0.0; null-keyed rows fall through unscored (kept), mirroring
    the dedup stages.

    ``classifier=dict(weights=[...], min_score=s[, bias=b])`` adds a
    model-based quality gate (hashed linear scorer, see
    :func:`curation_flags`) with reason ``classifier`` — evaluated
    after the heuristic quality floor, before repetition.  Row-local
    JVM like the other flags, so it is free at scale and valid in a
    streaming micro-batch.

    ``near_dup={...}`` enables the optional MinHash near-duplicate stage
    (kwargs forwarded to :func:`rdf_spark.ops.dedup.near_dup_clusters`,
    e.g. ``dict(threshold=0.95)``): clusters are computed among the
    exact-dedup survivors only, each keeps its minimum ``key_col``
    member, and the others drop with reason ``near_dup`` — after
    ``duplicate`` and before ``sampled_out`` in the cascade.

    ``c4=True`` (or ``c4=dict(min_words_per_line=…, min_lines=…)``)
    enables the C4 line/page rules (ops.text.c4_cols) as the FIRST
    stage, before every other transform — Raffel et al.'s original
    order: lines failing the word-count/terminal-punctuation rules are
    removed from the text every later stage sees (so chrome lines stop
    feeding fingerprints), and pages failing the page rules (too few
    surviving lines, 'lorem ipsum', '{') drop with reason ``c4_page``.
    Row-local JVM expressions — free at scale, micro-batch safe.

    ``strip_boilerplate=N`` enables an optional stage 0: cross-corpus
    line-level boilerplate removal (ops.text.remove_boilerplate_lines,
    lines in ≥N distinct docs) BEFORE any flag is computed — chrome
    lines then stop inflating repetition fractions and stop gluing
    near-identical pages into distinct fingerprints.  Off by default:
    it is the only stage needing a corpus-wide shuffle besides dedup,
    and (unlike every other stage) it cannot run in the streaming twin,
    which sees one micro-batch of the corpus at a time.

    ``scrub_pii=True`` replaces the text with its PII-redacted form
    (ops.text.redact_pii placeholders) after the boilerplate stage and
    before any flag — so dedup fingerprints match on redacted content
    (two pages differing only in a contact email collapse) and the kept
    corpus never carries the raw identifiers.  Row-local JVM: free at
    any scale, and valid per micro-batch in a streaming setting.

    ``span_dedup_ngram=N`` enables exact SUBSTRING dedup
    (ops.dedup.remove_duplicate_spans, the Lee-et-al ExactSubstr step):
    every ≥N-token span that occurs elsewhere in the corpus is removed
    from all but its globally-first occurrence.  Runs AFTER the PII
    scrub so spans differing only in redacted identifiers collapse,
    and BEFORE the flags so de-spanned text drives quality/repetition/
    fingerprints.  Corpus-wide shuffle (like boilerplate, no streaming
    twin); duplicate keys merge into one document, as in any keyed
    corpus-wide stage.

    ``host_cap=(col, N)`` enables a FINAL quota stage: among the rows
    every earlier stage kept, at most N per distinct value of ``col``
    (the standard per-host/per-domain cap — one hot domain must not
    dominate the mix); excess rows drop as ``host_capped``.  Which rows
    survive is the md5 rank of ``key_col`` (ops.sample.cap_per_key's
    rule), so the quota is deterministic at any parallelism and replays
    verbatim in SQL.  Dropped-earlier rows never consume quota.

    Deterministic on any cluster at any parallelism: every stage is a
    pure function of row content except dedup, whose keep-the-smallest-id
    rule is order-free.
    """
    if c4:
        from rdf_spark.ops.text import c4_cols

        cols = c4_cols(F.col(text_col), **({} if c4 is True else dict(c4)))
        df = df.withColumn("_c4_ok", cols["keep"]).withColumn(
            text_col, cols["clean_text"]
        )
    if strip_boilerplate is not None:
        # null-safe left join back: a null-keyed row must still appear in
        # the audit (plain equality would drop it — the round-2 gotcha);
        # duplicate keys are treated as one document by the corpus-wide
        # line counting (their cleaned texts merge), as any keyed
        # corpus-wide stage must
        cleaned = txt.remove_boilerplate_lines(
            df, text_col=text_col, id_col=key_col,
            min_docs=strip_boilerplate,
        ).select(
            F.col(key_col).alias("_bp_key"),
            F.col("clean_text").alias("_bp_text"),
        )
        df = (
            df.drop(text_col)
            .join(cleaned, F.col(key_col).eqNullSafe(F.col("_bp_key")), "left")
            .withColumn(text_col, F.coalesce(F.col("_bp_text"), F.lit("")))
            .drop("_bp_key", "_bp_text")
        )
    if scrub_pii:
        df = df.withColumn(text_col, txt.redact_col(F.col(text_col)))
    if span_dedup_ngram is not None:
        from rdf_spark.ops.dedup import remove_duplicate_spans

        # same null-safe join-back shape as the boilerplate stage
        despanned = remove_duplicate_spans(
            df, text_col=text_col, id_col=key_col, ngram=span_dedup_ngram
        ).select(
            F.col(key_col).alias("_sd_key"),
            F.col("dedup_text").alias("_sd_text"),
        )
        df = (
            df.drop(text_col)
            .join(despanned, F.col(key_col).eqNullSafe(F.col("_sd_key")), "left")
            .withColumn(text_col, F.coalesce(F.col("_sd_text"), F.lit("")))
            .drop("_sd_key", "_sd_text")
        )
    feat = curation_flags(
        df, text_col, lang_col, langs, min_quality, classifier=classifier
    )
    if c4:
        # a c4-dropped page must not become a dedup representative
        feat = feat.withColumn(
            "_eligible", F.col("_eligible") & F.col("_c4_ok")
        )
    lang_ok = F.col("_lang_ok")
    qual_ok = F.col("_qual_ok")
    rep_ok = F.col("_rep_ok")

    reps = (
        feat.filter(F.col("_eligible"))
        .groupBy("_fp")
        .agg(F.min(key_col).alias("_rep_id"))
    )
    out = feat.join(reps, on="_fp", how="left")
    nd_cols = []
    if near_dup is not None:
        from rdf_spark.ops.dedup import near_dup_clusters

        # localCheckpoint: the flag pipeline now has FOUR consumers (the
        # clustering's signature pass, verify-join text lookup, final id
        # join, and the report's own reason projection) — checkpoint the
        # flagged frame once so each reads the materialized rows instead
        # of re-running the scan+flags+dedup subtree
        out = out.localCheckpoint()
        survivors = out.filter(
            F.col("_eligible") & (F.col(key_col) == F.col("_rep_id"))
        ).select(key_col, text_col)
        clusters = near_dup_clusters(survivors, text_col, key_col, **near_dup)
        nd = clusters.filter(F.col(key_col) != F.col("cluster")).select(
            F.col(key_col).alias("_nd_id")
        )
        # null keys never match the equi-join → can't be near-dup-dropped,
        # mirroring their fall-through in the duplicate stage
        out = out.join(nd, F.col(key_col) == F.col("_nd_id"), "left")
        nd_cols = ["_nd_id"]
    dsir_min_logw = None
    if dsir is not None:
        from rdf_spark.ops.dsir import dsir_weights

        d = dict(dsir)
        dsir_target = d.pop("target")
        dsir_min_logw = d.pop("min_logw")
        wts = dsir_weights(
            out.select(key_col, text_col), dsir_target,
            text_col=text_col, id_col=key_col, **d,
        ).select(F.col(key_col).alias("_dw_key"), "dsir_logw")
        # plain equi-join: null keys stay unscored and fall through
        out = out.join(
            wts, F.col(key_col) == F.col("_dw_key"), "left"
        ).drop("_dw_key")
    reason = F.when(~lang_ok, "lang")
    if c4:
        reason = F.when(~F.col("_c4_ok"), "c4_page").when(~lang_ok, "lang")
    reason = reason.when(~qual_ok, "quality")
    if classifier is not None:
        reason = reason.when(~F.col("_clf_ok"), "classifier")
    reason = reason.when(~rep_ok, "repetition").when(
        F.col(key_col) != F.col("_rep_id"), "duplicate"
    )
    if near_dup is not None:
        reason = reason.when(F.col("_nd_id").isNotNull(), "near_dup")
    if dsir is not None:
        reason = reason.when(F.col("dsir_logw") < dsir_min_logw, "dsir")
    reason = reason.when(
        ~smp.sample_predicate(F.col(key_col), sample_rate), "sampled_out"
    ).otherwise(F.lit(None).cast("string"))
    out = out.withColumn("drop_reason", reason).drop(
        "_fp", "_eligible", "_lang_ok", "_qual_ok", "_rep_ok", "_rep_id",
        *(["_clf_ok"] if classifier is not None else []),
        *(["_c4_ok"] if c4 else []),
        *nd_cols
    )
    if host_cap is not None:
        from pyspark.sql.window import Window

        cap_col, cap_n = host_cap
        if cap_n < 1:
            raise ValueError(f"host_cap count must be >= 1, got {cap_n}")
        # rank ONLY the so-far-kept rows of each host against each other
        # (dropped rows must not consume quota); md5-of-key order makes
        # the surviving set parallelism-invariant and SQL-replayable
        w = Window.partitionBy(
            F.col(cap_col), F.col("drop_reason").isNull()
        ).orderBy(
            F.md5(F.col(key_col).cast("string")).asc(),
            F.col(key_col).cast("string").asc(),
        )
        out = out.withColumn("_cap_rn", F.row_number().over(w)).withColumn(
            "drop_reason",
            F.when(
                F.col("drop_reason").isNull() & (F.col("_cap_rn") > cap_n),
                "host_capped",
            ).otherwise(F.col("drop_reason")),
        ).drop("_cap_rn")
    return out


def curate_corpus(df: DataFrame, **kwargs) -> DataFrame:
    """The kept rows only (original columns + quality/repetition signals)."""
    return curate_report(df, **kwargs).filter(F.col("drop_reason").isNull()).drop(
        "drop_reason"
    )


def curate_stats(df: DataFrame, **kwargs) -> DataFrame:
    """Per-stage drop counters — the pipeline's audit aggregate."""
    return (
        curate_report(df, **kwargs)
        .groupBy(F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("stage"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def curate_stream(
    docs_stream: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    sample_rate: float = 1.0,
    key_col: str = "doc_id",
    n_key_buckets: int = 1024,
    state_timeout_minutes: int | None = None,
    classifier: dict | None = None,
    c4: dict | bool | None = None,
) -> DataFrame:
    """Streaming corpus curation over a docs readStream.

    ``classifier`` is the same model-based quality gate as the batch
    cascade (row-local JVM ⇒ trivially valid per micro-batch), and
    ``c4`` the same C4 line/page first stage (also row-local: failing
    pages are filtered, surviving texts line-cleaned before any flag —
    so dedup state keys the CLEANED fingerprints, exactly like batch).

    The row-local stages (lang, quality, repetition, sample) are the SAME
    JVM expressions as the batch cascade, applied per micro-batch.
    Cross-batch exact dedup is a stateful operator
    (``applyInPandasWithState``) keyed by a fingerprint hash-bucket whose
    state is the set of fingerprints already emitted — so a document seen
    in any earlier batch never re-enters the corpus.

    Documented semantic differences from :func:`curate_report`:

    - streaming dedup keeps the FIRST-SEEN member of each duplicate class
      (arrival order), not the smallest ``key_col`` — a global min-id
      rule would require retracting already-emitted rows, which
      append-mode streams cannot do;
    - the sample predicate runs BEFORE dedup (it is row-local, so
      filtering early shrinks state), which means a duplicate class whose
      would-be representative is sampled out can still contribute a
      different member — the batch cascade drops the whole class.

    State is bounded by ``n_key_buckets``-way sharding plus the optional
    processing-time timeout (same contract and caveats as
    streaming.stateful_dedup_stream; exactness within the timeout
    window).  Fingerprints are stored as 60-bit prefixes of the md5 —
    collisions (false drops) are ~0.2% cumulative at 10^8 docs per
    bucket; raise ``n_key_buckets`` for larger corpora.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    if c4:
        from rdf_spark.ops.text import c4_cols

        cols = c4_cols(
            F.col(text_col), **({} if c4 is True else dict(c4))
        )
        docs_stream = docs_stream.filter(cols["keep"]).withColumn(
            text_col, cols["clean_text"]
        )
    flagged = curation_flags(
        docs_stream, text_col, lang_col, langs, min_quality,
        classifier=classifier,
    )
    kept = flagged.filter(
        F.col("_eligible") & smp.sample_predicate(F.col(key_col), sample_rate)
    )
    out_cols = [
        c for c in kept.columns
        if c not in ("_fp", "_eligible", "_lang_ok", "_qual_ok", "_rep_ok",
                     "_clf_ok")
    ]
    keyed = kept.withColumn(
        "_kb", F.pmod(F.xxhash64("_fp"), F.lit(n_key_buckets)).cast("int")
    )
    out_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in kept.select(*out_cols).schema.fields
    )
    use_timeout = state_timeout_minutes is not None

    def dedup_fn(key, pdf_iter, state):
        if use_timeout and state.hasTimedOut:
            state.remove()
            return
        seen = set(state.get[0]) if state.exists else set()
        out = []
        for pdf in pdf_iter:
            fh = pdf["_fp"].map(lambda x: int(x[:15], 16))  # 60-bit prefix
            fresh = ~fh.isin(list(seen)) & ~fh.duplicated()
            seen.update(int(x) for x in fh[fresh])
            out.append(pdf.loc[fresh, out_cols])
        state.update((list(seen),))
        if use_timeout:
            state.setTimeoutDuration(state_timeout_minutes * 60 * 1000)
        result = pd.concat(out) if out else None
        if result is not None and len(result):
            yield result

    return keyed.groupBy("_kb").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_ddl,
        stateStructType="seen array<long>",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
