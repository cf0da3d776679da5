"""Temporal joins: distributed as-of join and binned range join.

The reference engine has no temporal layer; this is the classic
time-series primitive (pandas ``merge_asof``, DuckDB ``ASOF JOIN``,
kdb+ ``aj``) re-expressed for Spark's shuffle model.  The naive Spark
spelling — a range theta-join ``l.key = r.key AND r.ts <= l.ts`` plus a
max-per-left window — materializes every (left row × earlier right row)
pair before reducing, quadratic per key.  This implementation is the
sorted-merge shape instead: union both sides with a tag and run ONE
window over (key ORDER BY ts, tag) carrying ``last(snapshot,
ignorenulls=True)`` — each key shuffles once, every row is touched once
in sorted order, and nothing is ever wider than (left + right).  A hot
key serializes inside its sort partition exactly as any merge-asof
does; distinct keys spread across reducers and AQE rebalances skewed
partitions.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_TS = "__asof_ts"
_SNAP = "__asof_snap"
_RTS = "__asof_rts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance: Optional[float] = None,
    allow_exact: bool = True,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the single right row with equal ``on``
    keys whose ``right_ts`` is the latest at-or-before ``left_ts``
    (``direction="backward"``) or the earliest at-or-after it
    (``"forward"``).  Left rows keep all columns; unmatched rows get
    nulls (left-join semantics, like ``pandas.merge_asof``).

    ``tolerance`` (seconds, or plain units for numeric ts columns)
    voids matches farther than the bound; ``allow_exact=False``
    excludes ties (``merge_asof(allow_exact_matches=False)``).  Right
    payload columns that collide with a left column name get
    ``suffix``; the matched right timestamp is emitted as
    ``right_ts + suffix``.

    Duplicate right timestamps within a key resolve deterministically
    to the MAX payload struct (field order = right column order): the
    window is ordered (ts, tag, snapshot), so the running ``last()``
    always lands on the greatest payload of a tie group — no dedup
    pre-aggregate, no extra shuffle.  Null-ts rows on either side never
    match (right dropped, left emitted unmatched).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"asof key {k!r} missing from a side")
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    if not payload:
        raise ValueError("right side has no payload columns")

    # carry the matched ts inside the snapshot struct so
    # tolerance/output never re-join
    snaps = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_TAG),
        F.struct(
            F.col(right_ts).alias(_RTS),
            *[F.col(c) for c in payload],
        ).alias(_SNAP),
    )
    snap_type = snaps.schema[_SNAP].dataType.simpleString()
    lefts = left.select(
        "*",
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(snap_type).alias(_SNAP),
    )
    both = lefts.unionByName(snaps, allowMissingColumns=True)

    asc = direction == "backward"
    ts_ord = (
        F.col(_TS).asc_nulls_first() if asc else F.col(_TS).desc_nulls_first()
    )
    # at equal ts the right row must sort before the left row for the
    # match to be visible (allow_exact) and after it to be hidden
    tag_ord = F.col(_TAG).asc() if allow_exact else F.col(_TAG).desc()
    # third key: among duplicate right timestamps the running last()
    # must land on the max payload; (ts, tag) tie groups are all-left
    # or all-right, so left rows (null snap) are unaffected
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_ord, tag_ord, F.col(_SNAP).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn(_SNAP, F.last(_SNAP, ignorenulls=True).over(w))

    out = matched.filter(F.col(_TAG) == 1)
    if tolerance is not None:
        gap = F.col(_TS).cast("double") - F.col(f"{_SNAP}.{_RTS}").cast(
            "double"
        )
        if not asc:
            gap = -gap
        out = out.withColumn(
            _SNAP, F.when(gap <= float(tolerance), F.col(_SNAP))
        )
    taken = set(left.columns)
    cols = [F.col(c) for c in left.columns]
    cols.append(
        F.col(f"{_SNAP}.{_RTS}").alias(
            right_ts + suffix if right_ts in taken else right_ts
        )
    )
    for c in payload:
        cols.append(
            F.col(f"{_SNAP}.{c}").alias(c + suffix if c in taken else c)
        )
    return out.select(*cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point: str,
    start: str,
    end: str,
    on: Union[str, Sequence[str], None] = None,
    bin_width: float = 3600.0,
    suffix: str = "_r",
) -> DataFrame:
    """Inner-join each point row to every interval row with equal
    ``on`` keys and ``start <= point <= end`` (closed bounds) — the
    interval-containment join, without the quadratic per-key theta-join
    Spark would otherwise plan (BroadcastNestedLoop / cartesian +
    filter).

    Shape: every interval is exploded over the fixed-width bins it
    covers, every point maps to exactly ONE bin, and the join is a
    plain equi-join on (keys, bin) plus a residual range filter.  A
    (point, interval) pair can meet in at most one bin — the point's —
    so no post-dedup is needed.  Shuffle volume is |points| +
    |intervals| × (span/bin_width + 1): pick ``bin_width`` near the
    typical interval length (seconds for timestamp columns, plain units
    for numeric).  Null points / null bounds never match; intervals
    with ``end < start`` are empty by construction.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive: {bin_width!r}")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    for k in keys:
        if k not in points.columns or k not in intervals.columns:
            raise ValueError(f"range key {k!r} missing from a side")

    def _bin(c: Column) -> Column:
        return F.floor(c.cast("double") / F.lit(float(bin_width)))

    p = points.filter(F.col(point).isNotNull()).withColumn(
        "__rj_bin", _bin(F.col(point))
    )
    iv = (
        intervals.filter(
            F.col(start).isNotNull()
            & F.col(end).isNotNull()
            & (F.col(start).cast("double") <= F.col(end).cast("double"))
        )
        .withColumn(
            "__rj_bin",
            F.explode(F.sequence(_bin(F.col(start)), _bin(F.col(end)))),
        )
    )
    taken = set(points.columns)
    iv = iv.select(
        "__rj_bin",
        *[F.col(k) for k in keys],
        *[
            F.col(c).alias(c + suffix if c in taken else c)
            for c in intervals.columns
            if c not in keys
        ],
    )
    s_out = start + suffix if start in taken else start
    e_out = end + suffix if end in taken else end
    joined = p.join(iv, ["__rj_bin", *keys]).filter(
        (F.col(point).cast("double") >= F.col(s_out).cast("double"))
        & (F.col(point).cast("double") <= F.col(e_out).cast("double"))
    )
    return joined.drop("__rj_bin")
