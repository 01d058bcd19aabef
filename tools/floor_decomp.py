"""Per-query FIXED-FLOOR decomposition (r11 verdict item 1: the ~0.45 s
per-query plan+schedule floor now dominates the sf0.1 suite wall —
decompose it, then attack the top term).

For every PURE query (no build-time jobs) this measures, at the given
SF (default sf0.001 so data work ≈ 0 and the floor is almost the whole
wall):

  build_ms   fn() wall — py4j plan construction + analysis (paid once
             per session for pure queries: bench's prepared-plan cache)
  replan_ms  fresh QueryExecution → executedPlan() — the Catalyst
             analyze/optimize/physical-plan re-run every write pays
             (Spark re-optimizes per action; DuckDB's per-pass parse is
             microseconds, so this is pure Spark-side floor)
  exec_ms    min-of-N noop-write wall on the cached handle — the bench
             number
  run_ms     Σ executorRunTime over the write's stages (REST API) —
             the part that is actual task execution
  stages / tasks — materialized AQE stage count and task count: each
             sequential stage materialization costs a driver
             re-optimize + job submit + task launch round trip
             (measured 10-30 ms idle, 100-170 ms under tenant load)

  sched_ms = exec_ms − run_ms/parallelism − replan_ms  is NOT printed:
  run_ms sums PARALLEL task walls, so the honest residual is
  exec_ms − replan_ms for 1-task stages only; the table reports raw
  terms and lets the reader aggregate (BASELINE.md does).

Usage: python tools/floor_decomp.py [sf_dir] [top_n]
Writes FLOOR_DECOMP.json next to the repo root and prints the
aggregate + top rows.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from typebus_spark import get_spark, suite
    from typebus_spark.session import load_table

    spark = get_spark(
        app_name="floor-decomp", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    ui, app = sc.uiWebUrl, sc.applicationId

    def rest(path):
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}{path}"
        ) as r:
            return json.load(r)

    for tname in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        load_table(spark, sf_dir, tname)

    # pure-query detection, same probe as bench.py
    from bench import builds_with_jobs

    rows = []
    for name, q in suite.QUERIES.items():
        try:
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            build_ms = (time.perf_counter() - t0) * 1000
            df.write.format("noop").mode("overwrite").save()  # warm
            if builds_with_jobs(spark, q.fn, sf_dir, name):
                continue  # stateful: wall is real work, not floor
        except Exception as e:  # noqa: BLE001
            rows.append({"q": name, "err": str(e)[:80]})
            continue
        # replan: a FRESH QueryExecution over the same logical plan
        df2 = q.fn(spark, sf_dir)
        t0 = time.perf_counter()
        df2._jdf.queryExecution().executedPlan()
        replan_ms = (time.perf_counter() - t0) * 1000
        # exec: min-of-2 noop write on the cached handle, job-grouped
        exec_s = float("inf")
        grp = f"fd_{name}"
        for i in range(2):
            sc.setJobGroup(grp if i == 1 else f"w_{name}", name)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            exec_s = min(exec_s, time.perf_counter() - t0)
            sc.setJobGroup("", "")
        run_ms = n_tasks = n_stages = 0
        try:
            jobs = [j for j in rest("/jobs") if j.get("jobGroup") == grp]
            seen = set()
            for j in jobs:
                for sid in j["stageIds"]:
                    if sid in seen:
                        continue
                    seen.add(sid)
                    try:
                        s = rest(f"/stages/{sid}")[0]
                    except Exception:  # skipped stage
                        continue
                    n_stages += 1
                    n_tasks += s["numCompleteTasks"]
                    run_ms += s["executorRunTime"]
        except Exception:
            pass
        rows.append({
            "q": name,
            "build_ms": round(build_ms, 1),
            "replan_ms": round(replan_ms, 1),
            "exec_ms": round(exec_s * 1000, 1),
            "run_ms": run_ms,
            "stages": n_stages,
            "tasks": n_tasks,
        })
        spark.catalog.clearCache()
        gc.collect()

    ok = [r for r in rows if "err" not in r]
    agg = {
        "sf_dir": sf_dir,
        "n_pure": len(ok),
        "sum_exec_s": round(sum(r["exec_ms"] for r in ok) / 1000, 2),
        "sum_build_s": round(sum(r["build_ms"] for r in ok) / 1000, 2),
        "sum_replan_s": round(sum(r["replan_ms"] for r in ok) / 1000, 2),
        "sum_run_s": round(sum(r["run_ms"] for r in ok) / 1000, 2),
        "sum_stages": sum(r["stages"] for r in ok),
        "sum_tasks": sum(r["tasks"] for r in ok),
    }
    out = {"agg": agg, "rows": rows}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "FLOOR_DECOMP.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(agg), flush=True)
    for r in sorted(ok, key=lambda r: -r["exec_ms"])[:top_n]:
        print(json.dumps(r), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
