"""Replay the full oracle_sql() suite on DuckDB — the like-for-like
side of the pinned engine-pair protocol (BASELINE.md form #2).

Runs every oracle statement against the parquet tables at
$SPARK_GRAFT_SF_DIR (default sf0.1), warm min-of-N per query
(default 2), and prints ONE JSON line mirroring bench.py's shape:
{"metric": "duckdb_oracle_total_wall_sec", "value": N, "unit": "sec",
 "queries": {...}, "sf": ..., "n_queries": K}.

Usage: [SPARK_GRAFT_SF_DIR=...] python tools/duck_replay.py [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    sys.path.insert(0, REPO)
    from bench import _window_stamp

    w = _window_stamp()

    import duckdb

    import __spark_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    osql = m.oracle_sql()
    timings: dict[str, float] = {}
    for name, sql in osql.items():
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"{name}: {timings[name]}", file=sys.stderr, flush=True)
    out = {
        "metric": "duckdb_oracle_total_wall_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
    }
    # Committed next to BENCH_DETAIL.json (r9 verdict item 2): per-query
    # DuckDB replay timings make the weak set COMPUTABLE — any single
    # query drifting past the 2x letter is visible as a ratio instead
    # of estimated from family aggregates. tests/test_bench_harness.py
    # asserts the two detail files share the oracled query key set.
    # same window stamp as BENCH_DETAIL.json (r12 verdict What's-wrong
    # #1): a committed pair must be provably same-window
    w["load_end"] = round(os.getloadavg()[0], 2)
    out["window"] = w
    # same shield as bench.py (r13 verdict item 7): don't shadow the
    # committed stamped pair unless SPARK_GRAFT_COMMIT_DETAIL=1
    from bench import detail_path

    with open(detail_path("DUCK_DETAIL.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
