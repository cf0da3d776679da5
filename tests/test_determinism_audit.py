"""Whole-contract determinism audit: every queries() entry must produce
IDENTICAL results under different shuffle-partition counts.

Changing ``spark.sql.shuffle.partitions`` changes how rows are grouped
into aggregation/join tasks — any operator whose output depends on
partitioning (order-dependent double summation, collect_list order,
first()/head() semantics, per-partition counters leaking into results)
fails here.  This is the property that makes results reproducible across
cluster sizes, which the reproducible-numerics scheme (decimal sums,
pre-rounded contributions, deterministic re-assembly) exists to
guarantee."""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _q():
    import __spark_entry__ as entry

    return entry.queries()


def _rows(df):
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(tuple(str(v) for v in row) for row in pdf.itertuples(index=False))
    return rows


@pytest.mark.parametrize("name", sorted(_q()))
def test_query_shuffle_partition_invariant(spark, name):
    qs = _q()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = _rows(qs[name](spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = _rows(qs[name](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b, f"{name} output depends on shuffle partitioning"
