"""Knowledge fusion / truth discovery over multi-source assertions
(graft addition — no reference analogue; /root/reference stops at
parse/serialize, rdf.go:14-22, but a web-scale KG builder ingests the
SAME fact from many pages and must pick ONE canonical value per
(subject, predicate) plus a confidence, cf. Dong et al., "From Data
Fusion to Knowledge Fusion", VLDB 2014).

Model: an *assertion* row is ``(s, p, o, source, trust)`` — one source
claiming one value for one fact.  Fusion is weighted voting:

1. a source asserting the same (s,p,o) repeatedly counts ONCE (its max
   trust) — crawl duplicates must not inflate support;
2. each candidate value's support is the sum of its voters' trust;
3. the winner per (s,p) is the max-support value, ties broken by the
   lexicographically SMALLEST value so the result is deterministic and
   replays verbatim in a SQL oracle;
4. confidence = winner support / total support over all candidate
   values (IEEE double division of exact decimal sums — identical in
   every engine).

Scale shape: three hash aggregations (``(s,p,o,source)`` →
``(s,p,o)`` → ``(s,p)``), each map-side combinable, no windows, no
Python.  The per-level fan-in is bounded by the number of sources /
distinct values per fact (small constants in practice), so every
shuffle after the first moves already-reduced rows.  Skewed hot facts
(a celebrity entity asserted by millions of pages) reduce map-side at
level 1 before crossing the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: decimal type used for trust accumulation — order-independent exact
#: sums (the reproducible-numerics pattern, see CLAUDE.md round-3)
_TRUST_DECIMAL = "decimal(28,6)"


def _per_value_support(
    assertions: DataFrame,
    s_col: str,
    p_col: str,
    o_col: str,
    source_col: str,
    trust_col: str | None,
) -> DataFrame:
    """(s, p, o, w, n_sources): summed trust + voter count per candidate
    value, after per-source dedup (max trust per (s,p,o,source))."""
    trust = (
        F.col(trust_col).cast(_TRUST_DECIMAL)
        if trust_col is not None
        else F.lit(1).cast(_TRUST_DECIMAL)
    )
    per_source = (
        assertions
        .filter(F.col(o_col).isNotNull())
        .select(
            F.col(s_col).alias("s"),
            F.col(p_col).alias("p"),
            F.col(o_col).alias("o"),
            F.col(source_col).alias("source"),
            trust.alias("trust"),
        )
        .groupBy("s", "p", "o", "source")
        .agg(F.max("trust").alias("trust"))
    )
    return per_source.groupBy("s", "p", "o").agg(
        F.sum("trust").cast(_TRUST_DECIMAL).alias("w"),
        F.count(F.lit(1)).alias("n_sources"),
    )


def fuse_assertions(
    assertions: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    source_col: str = "source",
    trust_col: str | None = "trust",
) -> DataFrame:
    """One canonical value per (s, p) by trust-weighted voting.

    Returns ``(s, p, o, support, total, confidence, n_values,
    n_sources)`` — the winning value, its summed trust, the summed
    trust over ALL candidate values, winner/total as a double, the
    number of distinct candidate values, and the number of
    (value, source) votes that survived per-source dedup.

    ``trust_col=None`` degrades to unweighted majority vote.  Rows with
    a null value are ignored (an absent claim is not a vote).
    """
    support = _per_value_support(
        assertions, s_col, p_col, o_col, source_col, trust_col
    )
    # winner = max support, then smallest value: min over (-w, o) is a
    # single struct-typed agg (stays in HashAggregate, no window)
    agg = support.groupBy("s", "p").agg(
        F.min(F.struct(
            (-F.col("w")).cast(_TRUST_DECIMAL).alias("nw"),
            F.col("o").alias("o"),
        )).alias("_win"),
        F.sum("w").cast(_TRUST_DECIMAL).alias("total"),
        F.count(F.lit(1)).alias("n_values"),
        F.sum("n_sources").alias("n_sources"),
    )
    support_w = (-F.col("_win.nw")).cast(_TRUST_DECIMAL)
    return agg.select(
        "s",
        "p",
        F.col("_win.o").alias("o"),
        support_w.alias("support"),
        "total",
        (support_w.cast("double") / F.col("total").cast("double"))
        .alias("confidence"),
        "n_values",
        "n_sources",
    )


def value_conflicts(
    assertions: DataFrame,
    s_col: str = "s",
    p_col: str = "p",
    o_col: str = "o",
    source_col: str = "source",
    trust_col: str | None = "trust",
) -> DataFrame:
    """Audit view: every candidate value of every CONTESTED fact.

    Returns ``(s, p, o, w, n_sources, n_values)`` for each (s, p) with
    ≥ 2 distinct asserted values — the rows a human (or a functional-
    property check, cf. ops/shacl.py sh:maxCount) reviews.  Same
    aggregation shape as :func:`fuse_assertions`; the conflict filter
    is a map-side-combinable count carried through one extra
    aggregation rather than a window.
    """
    support = _per_value_support(
        assertions, s_col, p_col, o_col, source_col, trust_col
    )
    n_vals = support.groupBy("s", "p").agg(
        F.count(F.lit(1)).alias("n_values")
    )
    return (
        support.join(n_vals, ["s", "p"])
        .filter(F.col("n_values") >= 2)
        .select("s", "p", "o", "w", "n_sources", "n_values")
    )
