"""Per-stage census for ONE bench key run cold (fresh session, UI on).

Usage: python probe_stages.py <key>
Prints each completed stage's task count and executor-run-time, so
single-task heavy map stages (unspread single-split inputs) stand out.
Diagnostic only — not part of the frozen bench.
"""
import json
import sys
import time
import urllib.request

from pyspark.sql import SparkSession


def main() -> None:
    key = sys.argv[1]
    spark = (
        SparkSession.builder.appName("probe-stages").master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "3000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    q = entry.queries()
    sf = "/root/testdata/sf0.1"

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(q["tpch_q1"](spark, sf))
    url = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(url + "/api/v1/applications"))[0]["id"]
    pre = {
        s["stageId"]
        for s in json.load(
            urllib.request.urlopen(f"{url}/api/v1/applications/{app}/stages")
        )
    }
    t0 = time.time()
    force(q[key](spark, sf))
    wall = time.time() - t0
    stages = json.load(
        urllib.request.urlopen(f"{url}/api/v1/applications/{app}/stages?status=complete")
    )
    new = sorted((s for s in stages if s["stageId"] not in pre),
                 key=lambda s: s["stageId"])
    print(f"== {key} cold wall {wall:.3f}s  ({len(new)} stages)")
    for s in new:
        print(
            f"stage {s['stageId']:>4} tasks {s['numTasks']:>4} "
            f"exec_ms {s['executorRunTime']:>8} in {s['inputRecords']:>9} "
            f"out {s['outputRecords'] if 'outputRecords' in s else '-':>9} "
            f"shw {s['shuffleWriteRecords']:>9}  {s['name'].splitlines()[0][:50]}"
        )


if __name__ == "__main__":
    main()
