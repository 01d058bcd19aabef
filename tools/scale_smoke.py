"""Scale smoke: run the heavy operators on N-times replicated input.

Correctness is the oracle gate's job; this tool checks the SCALE story
directly — that the operators' cost curves and plans survive an input
10-30x beyond the bench SF on the same hardware (no OOM, no plan flip
to cartesian/global-sort, wall growing roughly linearly for the
index/bucket-bounded paths).

Replication multiplies ids into fresh key ranges, so dedup candidates
and per-key state GROW with the factor (each replica is a near-dup
family member — the worst realistic case for the pair generators),
not a degenerate all-identical corpus.

Usage: python tools/scale_smoke.py [factor] (default 10, sf0.1 input)
Prints one JSON line per operator: {op, factor, rows_in, rows_out,
wall_sec, plan_ok}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from typebus_spark import get_spark  # noqa: E402
from typebus_spark.session import load_table  # noqa: E402


def replicate(df, id_col: str, factor: int, id_stride: int):
    """factor copies with shifted ids (fresh key ranges per replica)."""
    rep = df.withColumn(
        "_r", F.explode(F.expr(f"sequence(0, {factor - 1})"))
    )
    return rep.withColumn(
        id_col, F.col(id_col) + F.col("_r") * id_stride
    ).drop("_r")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    from typebus_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from typebus_spark.operators.mixing import token_budget_mix
    from typebus_spark.operators.sketch import kmv_distinct
    from typebus_spark.functions.text import tokens
    from typebus_spark.plans.checks import formatted_plan, has_global_sort

    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    big_docs = replicate(docs, "doc_id", factor, 10_000_000).persist()
    big_ev = replicate(ev, "event_id", factor, 100_000_000)
    n_docs = big_docs.count()

    def run(op_name, df, rows_in):
        plan = formatted_plan(df)
        plan_ok = (
            "CartesianProduct" not in plan and not has_global_sort(df)
        )
        t0 = time.perf_counter()
        rows_out = df.count()
        wall = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {
                    "op": op_name,
                    "factor": factor,
                    "rows_in": rows_in,
                    "rows_out": rows_out,
                    "wall_sec": wall,
                    "plan_ok": plan_ok,
                }
            ),
            flush=True,
        )

    run("exact_dedup", exact_dedup(big_docs, "doc_id", "text"), n_docs)
    run(
        "minhash_lsh_pairs",
        minhash_lsh_pairs(big_docs, "doc_id", "text", threshold=0.5),
        n_docs,
    )
    run(
        "simhash_pairs",
        simhash_pairs(big_docs, "doc_id", "text", max_hamming=3),
        n_docs,
    )
    run(
        "token_budget_mix",
        token_budget_mix(
            big_docs.withColumn(
                "n_tok", F.size(tokens("text")).cast("long")
            ),
            "doc_id",
            "source",
            "n_tok",
            50_000,
        ),
        n_docs,
    )
    run(
        "kmv_distinct",
        kmv_distinct(big_ev, "event_type", "user_id", k=64),
        big_ev.count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
