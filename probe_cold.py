"""Cold-wall probe: fresh session, bench-style warm-up, then each named
key timed ONCE (cold) in order — the regime the driver's bench measures.

Usage: python probe_cold.py key1 key2 ...   (prints one wall per key)
Not part of the frozen bench; see bench.py for the official harness.
"""
import sys
import time

from rdf_spark.session import get_spark


def main() -> None:
    keys = sys.argv[1:]
    spark = get_spark("probe-cold", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    q = entry.queries()
    sf = "/root/testdata/sf0.1"

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(q["tpch_q1"](spark, sf))
    with open("/proc/loadavg") as fh:
        print("loadavg", fh.read().split()[0], flush=True)
    for name in keys:
        t0 = time.time()
        force(q[name](spark, sf))
        print(name, round(time.time() - t0, 3), flush=True)


if __name__ == "__main__":
    main()
