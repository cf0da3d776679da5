"""Deterministic sampling for reproducible training-data mixes (graft
addition — no reference analogue; the reference stops at parsing,
rdf.go:14-22, while a 100 TB corpus pipeline must also SELECT data).

Why not ``df.sample()``: Spark's sampler is seeded per-partition, so the
selected set changes whenever partitioning, file order, or cluster size
changes — useless for resumable pipelines and for auditing exactly which
documents entered a training mix.  Hash-threshold sampling is a pure
row-local predicate: the same row is selected on ANY cluster, at ANY
parallelism, in ANY run — and the filter is a JVM expression pushed into
the scan stage (no shuffle, no Python, no state).

The rule: keep a row iff ``md5(key) < hex_threshold(rate)``.  md5 of the
stringified key is uniform over [0, 16^32); comparing the lowercase hex
digest against a fixed-point hex threshold selects an expected ``rate``
fraction.  Lexicographic comparison of equal-length lowercase hex strings
is numeric comparison, and every SQL engine produces the identical md5
hex digest — so a DuckDB oracle mirrors the predicate verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hex digits of precision for the threshold (12 nibbles = 48 bits —
#: rate granularity ~3.6e-15, plenty for any real mix weight)
_NIBBLES = 12


def md5_threshold(rate: float) -> str:
    """32-char lowercase hex threshold selecting an expected `rate` slice.

    ``rate=1.0`` returns 'g…' ( > every hex digest, keeps all rows);
    ``rate=0.0`` returns '0…' (keeps none).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sample rate must be in [0,1], got {rate}")
    scaled = int(round(rate * 16**_NIBBLES))
    if scaled >= 16**_NIBBLES:
        return "g" * 32  # 'g' > 'f': sorts after every md5 digest
    return format(scaled, f"0{_NIBBLES}x") + "0" * (32 - _NIBBLES)


def sample_predicate(key: Column, rate: float) -> Column:
    """Row-local deterministic keep/drop predicate (JVM, scan-pushable)."""
    return F.md5(key.cast("string")) < F.lit(md5_threshold(rate))


def deterministic_sample(df: DataFrame, rate: float, key_col: str = "doc_id") -> DataFrame:
    """Uniform deterministic sample: same rows on any cluster/partitioning."""
    return df.filter(sample_predicate(F.col(key_col), rate))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic rates — the training-mix operator
    ("keep 100% of en, 30% of de, drop the rest" style recipes).

    One CASE expression picks the stratum's threshold; the md5 is computed
    once.  Still a row-local scan-stage filter: no shuffle, no Python.
    """
    digest = F.md5(F.col(key_col).cast("string"))
    thr: Column = F.lit(md5_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == stratum, F.lit(md5_threshold(rate))).otherwise(thr)
    return df.filter(digest < thr)


def cap_per_key(
    df: DataFrame,
    key_cols: str | list[str],
    max_per_key: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-key quota: keep at most ``max_per_key`` rows per
    key — the standard host/domain cap of a web corpus (one hot domain
    must not dominate a training mix).

    Which rows survive is decided by md5 of ``order_col`` (ties broken
    by the stringified key itself), so the kept set is identical on any
    cluster, at any parallelism — same auditability contract as
    :func:`deterministic_sample`, and the md5 rank replays verbatim in a
    SQL oracle.

    Scale shape: one rank window per key.  Spark compiles the
    ``row_number <= k`` filter to a map-side WindowGroupLimit (the same
    plan shape as the LSH bucket pre-cap, ops/dedup.py), so a hot key's
    excess rows are truncated to k per map task BEFORE the shuffle —
    the skewed-host pathology never crosses the exchange in full.
    """
    from pyspark.sql.window import Window

    if max_per_key < 1:
        raise ValueError(f"max_per_key must be >= 1, got {max_per_key}")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    rank_key = F.md5(F.col(order_col).cast("string"))
    w = Window.partitionBy(*keys).orderBy(
        rank_key.asc(), F.col(order_col).cast("string").asc()
    )
    return (
        df.withColumn("_cap_rn", F.row_number().over(w))
        .filter(F.col("_cap_rn") <= max_per_key)
        .drop("_cap_rn")
    )


def weighted_repeat(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 1.0,
    copy_col: str = "copy",
) -> DataFrame:
    """Deterministic fractional repetition — the upsampling half of a
    training-mix recipe ("3.5 epochs of wiki, 0.3 of crawl"): every row
    of a stratum with rate ``r`` appears ``floor(r)`` times, plus one
    more copy for the md5-selected ``r - floor(r)`` fraction (the same
    digest convention as :func:`deterministic_sample`, so the kept set
    is identical at any parallelism and replays verbatim in SQL).
    Rows gain a 0-based ``copy`` ordinal — downstream shuffles/packing
    treat copies as distinct documents.

    Rates below 1 degenerate to plain stratified sampling (0 or 1
    copies); rates must be finite and >= 0.

    Scale shape: one row-local CASE + ``explode(sequence(...))`` —
    no shuffle, no Python, output size is exactly the mixture's token
    budget.  At 100 TB prefer repeating at the SAMPLER (here) over
    materializing copies only when the sink needs them physically;
    feeding this straight into pack_sequences never stores a copy
    twice on disk.
    """
    import math

    digest = F.md5(F.col(key_col).cast("string"))
    for stratum, rate in rates.items():
        if not (rate >= 0.0 and math.isfinite(rate)):
            raise ValueError(f"rate for {stratum!r} must be finite >= 0")
    if not (default_rate >= 0.0 and math.isfinite(default_rate)):
        raise ValueError("default_rate must be finite >= 0")

    def _parts(rate: float) -> tuple[int, str]:
        n_full = int(rate)
        return n_full, md5_threshold(rate - n_full)

    dn, dthr = _parts(default_rate)
    full: Column = F.lit(dn)
    thr: Column = F.lit(dthr)
    for stratum, rate in sorted(rates.items()):
        n_full, frac_thr = _parts(rate)
        cond = F.col(strata_col) == stratum
        full = F.when(cond, F.lit(n_full)).otherwise(full)
        thr = F.when(cond, F.lit(frac_thr)).otherwise(thr)
    copies = full + (digest < thr).cast("int")
    return (
        df.withColumn("_n_copies", copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            copy_col, F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
        )
        .drop("_n_copies")
    )


def mixture_weights(
    df: DataFrame,
    domain_col: str,
    alpha: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-based domain mixing weights → ``(domain, n_docs,
    weight, repeat_factor)``.

    ``weight_i = n_i^α / Σ_j n_j^α`` — the multinomial temperature
    reweighting used for multilingual/multi-source pretraining mixes
    (α=1 keeps natural proportions, α→0 flattens to uniform; 0.3–0.7
    are the published XLM-R/mT5 settings).  ``repeat_factor_i =
    weight_i · N / n_i`` is the up/down-sampling rate that realizes the
    mix at unchanged total size — feed it to :func:`weighted_repeat`.

    One hash aggregate over domains; the Σ row broadcasts back.
    Reproducible numerics (the bm25 scheme): per-domain ``n^α``
    pre-rounded 9 dp and summed as DECIMAL(28,9) so the denominator is
    domain-order independent; α is injected into the oracle verbatim.
    """
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))
    contrib = F.round(
        F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha))), 9
    )
    with_c = counts.select(
        domain_col, "n_docs", contrib.cast("decimal(28,9)").alias("_c")
    )
    totals = with_c.agg(
        F.sum("_c").alias("_den"), F.sum("n_docs").alias("_n")
    )
    w = F.col("_c").cast("double") / F.col("_den").cast("double")
    return with_c.crossJoin(F.broadcast(totals)).select(
        domain_col,
        "n_docs",
        F.round(w, round_to).alias("weight"),
        F.round(
            w * F.col("_n").cast("double") / F.col("n_docs").cast("double"),
            round_to,
        ).alias("repeat_factor"),
    )
