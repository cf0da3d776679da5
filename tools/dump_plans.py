"""Dump .explain('formatted') for the named queries into plans/<dir>/.

Usage: python tools/dump_plans.py <out_dir> <suffix> key1 key2 ...
(run from the repo root whose __spark_entry__ should be dumped;
$SPARK_GRAFT_SF_DIR overrides the default sf0.1 data directory)
"""
import os
import sys

from pyspark.sql import SparkSession


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    spark = (
        SparkSession.builder.appName("plan-dump").master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.getcwd())
    import __spark_entry__ as entry

    qs = entry.queries()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    for k in keys:
        df = qs[k](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{k}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print("dumped", k, flush=True)


if __name__ == "__main__":
    main()
