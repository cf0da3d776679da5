"""Per-query measurement tool for optimization work (guide §1).

Times individual queries() entries with the noop sink, optionally dumps
.explain("formatted") to plans/r06/<name>_<tag>.txt, and reports the
1-min loadavg before/after each rep so contaminated observations are
identifiable.  bench.py itself stays FROZEN; cite this file's numbers
in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py q1 q2 ...            # time listed queries (3 reps)
  python bench_extra.py --plans before q1 .. # also dump plans/r06/q1_before.txt
  python bench_extra.py --reps 5 q1
  python bench_extra.py --gate 2.0 q1 ...    # wait for loadavg < 2.0
                                             # before each rep (max 600 s)
                                             # — ungated walls on this box
                                             # are contaminated 2-3x
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import sys
import time


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> int:
    args = sys.argv[1:]
    plan_tag = None
    reps = 3
    gate = None
    while args and args[0].startswith("--"):
        if args[0] == "--plans":
            plan_tag = args[1]
            args = args[2:]
        elif args[0] == "--reps":
            reps = int(args[1])
            args = args[2:]
        elif args[0] == "--gate":
            gate = float(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    names = args
    if not names:
        raise SystemExit(
            "usage: bench_extra.py [--plans TAG] [--reps N] [--gate LOAD] "
            "query ..."
        )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from rdf_spark.session import get_spark

    spark = get_spark("rdf_spark-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qfns = entry.queries()
    _force(qfns["tpch_q1"](spark, sf_dir))  # warm JVM + python workers

    out: dict[str, dict] = {}
    for name in names:
        if plan_tag is not None:
            os.makedirs("plans/r06", exist_ok=True)
            df = qfns[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(f"plans/r06/{name}_{plan_tag}.txt", "w") as f:
                f.write(plan)
        walls, loads = [], []
        for _ in range(reps):
            if gate is not None:
                t_gate = time.time()
                while _loadavg1() >= gate and time.time() - t_gate < 600:
                    time.sleep(15)
            l0 = _loadavg1()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            _force(qfns[name](spark, sf_dir))
            walls.append(round(time.time() - t0, 3))
            loads.append(round(l0, 2))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"walls": walls, "min": min(walls), "load_before": loads}
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"summary": {k: v["min"] for k, v in out.items()},
                      "total_min": round(sum(v["min"] for v in out.values()), 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
