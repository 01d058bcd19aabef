"""Engine-portable sketches.

``approx_count_distinct`` (HyperLogLog++) and ``percentile_approx``
(KLL-ish) give constant-memory estimates but their values are
engine-specific — they can only ever be rows-only checked. The KMV
(k-minimum-values) distinct-count estimator (Bar-Yossef et al. 2002;
Beyer et al., SIGMOD 2007) is just as scalable — per group it keeps the
k smallest values of a uniform hash — but built on the repo's portable
60-bit md5 scheme it is DETERMINISTIC: both engines keep the same k
hashes, so the estimate itself hash-checks. Sketch accuracy ~ 1/sqrt(k).

Scale shape: one distinct on (group, hash) (map-side partial), then a
per-group bottom-k via a ranking window — Catalyst's WindowGroupLimit
prunes to k rows per map partition BEFORE the shuffle, so the state per
group in flight is k rows, never the distinct set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

TWO_POW_60 = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = 64,
    seed: str = "kmv",
) -> DataFrame:
    """(group, kmv_estimate bigint) per group.

    Groups with fewer than k distinct ids report the EXACT count (the
    standard KMV small-set rule: the sketch isn't full, so the kept
    hashes ARE the distinct set); otherwise (k-1) / fraction(h_k).
    """
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}:"), F.col(id_col).cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h")
    )
    d = df.select(F.col(group_col).alias("g"), h).distinct()
    w = Window.partitionBy("g").orderBy("h")
    kept = d.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    agg = kept.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("hk")
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(TWO_POW_60)
            / F.col("hk").cast("double"),
            0,
        ).cast("long")
    )
    return agg.select(
        F.col("g").alias(group_col), est.alias("kmv_estimate")
    )
