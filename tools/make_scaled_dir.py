"""Materialize an N×-replicated copy of an SF directory for scale-honest
core-ratio measurement (VERDICT r13 item 6).

The 8-vs-32-core sweep at sf0.1 measures the fixed-cost floor, not data
work (ratios < 1 prove it). This tool writes a directory whose FACT
tables (documents, embeddings, lineitem, orders, events) are replicated
``factor``× with shifted ids — the scale_smoke replicate: fresh key
ranges per replica, so dedup/join cardinalities grow with the factor —
while dimension tables are copied as-is. Queries then run unchanged via
``SPARK_GRAFT_SF_DIR=<out>``.

Usage: python tools/make_scaled_dir.py [factor] [out_dir]
Defaults: factor 10, out /dev/shm/typebus-sf0.1x<factor>.

events.parquet is copied raw (byte-identical, TIMESTAMP(NANOS)
preserved) — replicating it would need nanos-safe rewrite; the
streaming family has its own r13 salted-scale evidence in BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from typebus_spark import get_spark  # noqa: E402
from typebus_spark.session import load_table  # noqa: E402
from tools.scale_smoke import replicate  # noqa: E402

ID_STRIDE = 1 << 33

FACT_IDS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}
COPY_RAW = ["events", "nation", "region", "customer", "supplier", "part"]


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/dev/shm/typebus-sf0.1x{factor}"
    )
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="make-scaled-dir")
    spark.sparkContext.setLogLevel("ERROR")
    for tname in COPY_RAW:
        shutil.copyfile(
            os.path.join(src, f"{tname}.parquet"),
            os.path.join(out, f"{tname}.parquet"),
        )
    for tname, id_col in FACT_IDS.items():
        df = load_table(spark, src, tname)
        rep = replicate(df, id_col, factor, ID_STRIDE)
        if tname == "lineitem":
            # keep the FK consistent with the replicated orders: every
            # replica's lineitems point at the same replica's orders
            # (l_orderkey is the replicate column, so already aligned)
            pass
        # one file per table, like the source fixtures: the point is
        # data volume, and ensure_parallelism/maxPartitionBytes decide
        # scan parallelism the same way they do on the source dir
        tmp = os.path.join(out, f"_{tname}_tmp")
        rep.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        os.replace(
            os.path.join(tmp, part), os.path.join(out, f"{tname}.parquet")
        )
        shutil.rmtree(tmp)
        print(f"{tname}: wrote {factor}x", flush=True)
    print(out)


if __name__ == "__main__":
    main()
