"""Scaling-efficiency evidence (BASELINE.md): the same job at two
parallelism levels (sandbox proxy for N vs 4N executors).

Runs the two headline jobs — vectorized N-Triples parse (~4.8M lines) and
the fused KG pipeline (60k pages) — in a fresh subprocess per level so
each gets its own JVM with master=local[N] and shuffle partitions scaled
with cores.  Prints one JSON line and rewrites the scaling section of
BASELINE.md.

    eff = (throughput@4N / throughput@N) / 4
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

WORKER = r"""
import json, sys, time
cores = int(sys.argv[1])
sf_dir = sys.argv[2]
from rdf_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("scaling", master=f"local[{cores}]", shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")

from rdf_spark import datagen, pipeline, sources

def force(df):
    df.write.format("noop").mode("overwrite").save()

def best_of(fn, n=5):
    # n=5: kg wall times have ~40% spread run-to-run even on an otherwise
    # quiet box (JIT/GC state); min-of-5 converges where min-of-3 doesn't.
    walls = []
    for _ in range(n):
        t0 = time.time(); fn(); walls.append(time.time() - t0)
    return min(walls)

# NT parse: fully parallel generated input (no scan/shuffle in the plan),
# sized so compute dominates fixed stage costs at 32 cores.
N_LINES = 24_000_000
lines = spark.range(N_LINES, numPartitions=cores * 2).select(
    F.concat(F.lit("<urn:order:"), F.col("id"), F.lit('> <urn:p:qty> "'),
             F.pmod(F.col("id"), F.lit(50)),
             F.lit('"^^<http://www.w3.org/2001/XMLSchema#integer> .')).alias("value"))
parsed = sources.parse_lines_df(lines, "ntriples")
force(parsed)  # warm JVM + python workers
nt_wall = best_of(lambda: force(parsed))

N_PAGES = 240_000
pages = datagen.pages(spark, N_PAGES).repartition(cores * 2)
final, _ = pipeline.build_shard_triples(pages, datagen.aliases(spark))
force(final)  # warm
kg_wall = best_of(lambda: force(final))

print(json.dumps({"cores": cores, "nt_lines": N_LINES, "nt_wall_s": round(nt_wall, 3),
                  "nt_lps": round(N_LINES / nt_wall, 1),
                  "kg_pages": N_PAGES, "kg_wall_s": round(kg_wall, 3),
                  "kg_pps": round(N_PAGES / kg_wall, 1)}))
"""


def run_level(cores: int, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), sf_dir],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=1800,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Each mapInArrow task runs a JVM feeder thread AND a Python worker
    # concurrently, so local[K] consumes up to 2K cores; the high level must
    # still fit the 32-core box or the measurement reports saturation, not
    # scaling.  Defaults: N=2 → 4N=8 (≤16+4 threads, ample headroom).
    lo = int(os.environ.get("SPARK_GRAFT_SCALE_LO", 2))
    hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", 8))
    r_lo = run_level(lo, sf_dir)
    r_hi = run_level(hi, sf_dir)
    eff_nt = (r_hi["nt_lps"] / r_lo["nt_lps"]) / (hi / lo)
    eff_kg = (r_hi["kg_pps"] / r_lo["kg_pps"]) / (hi / lo)
    result = {
        "metric": "scaling_efficiency",
        "levels": {"N": r_lo, "4N": r_hi},
        "nt_parse_efficiency": round(eff_nt, 3),
        "kg_pipeline_efficiency": round(eff_kg, 3),
    }
    print(json.dumps(result))
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(result, f, indent=2)

    section = f"""## Measured scaling (round artifacts — bench_scaling.py)

Same job, same input, local[{lo}] vs local[{hi}] (N vs 4N cores),
`spark.sql.shuffle.partitions` = 2×cores. `eff = (tput@4N / tput@N) / 4`.

| job | tput @ local[{lo}] | tput @ local[{hi}] | efficiency |
|---|---|---|---|
| NT parse ({r_lo['nt_lines']:,} lines) | {r_lo['nt_lps']:,.0f} lines/s | {r_hi['nt_lps']:,.0f} lines/s | {eff_nt:.2f} |
| KG pipeline ({r_lo['kg_pages']:,} pages) | {r_lo['kg_pps']:,.0f} pages/s | {r_hi['kg_pps']:,.0f} pages/s | {eff_kg:.2f} |
"""
    marker = "## Measured scaling"
    with open("BASELINE.md") as f:
        base = f.read()
    if marker in base:
        base = re.split(r"\n## Measured scaling.*", base, flags=re.S)[0] + "\n"
    with open("BASELINE.md", "w") as f:
        f.write(base + "\n" + section)
    return 0


if __name__ == "__main__":
    sys.exit(main())
