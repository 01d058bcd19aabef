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


def heavy_hitters(
    keyed: DataFrame,
    key_col: str,
    num: int,
    den: int,
    sketch_support: float | None = None,
) -> DataFrame:
    """EXACT frequent items over an unbounded key domain, two passes:
    ``(key, n)`` for every key with ``n * den > num * total``.

    Pass 1 is the single-scan KSP frequent-items sketch
    (``DataFrame.stat.freqItems`` — Karp/Shenker/Papadimitriou; the
    JVM-side treeAggregate keeps a ~1/support-entry map per partition,
    NO shuffle of the key domain) whose output is guaranteed to be a
    SUPERSET of every key above the support. Pass 2 embeds the
    candidates as plan literals and counts candidate keys exactly in
    one scan (everything else folds into a null group that still feeds
    the exact total) — the groupBy state is bounded by the candidate
    count, never the key domain. False positives from the sketch fall
    out of the final integer-threshold filter, so the result is exact
    and the whole pipeline hash-checks against a plain GROUP BY /
    HAVING oracle.

    This is the vocabulary/heavy-user analysis that a full groupBy over
    a 100 TB token stream cannot do (shuffle state = the vocabulary);
    here the shuffle carries candidate rows only. The threshold is pure
    integer arithmetic (``n*den > num*total``) — no float boundary to
    drift between engines.

    ``sketch_support`` defaults to half the filter fraction so sketch
    boundary behavior (its guarantee is >= support) can never exclude a
    strictly-above-threshold key.

    NOTE: pass 1 runs a Spark job at CALL time (the sketch collects its
    candidate array, like the IVF trainers); bench.py's stateful
    detection handles this.
    """
    frac = num / den
    support = sketch_support if sketch_support is not None else frac / 2
    cands = keyed.stat.freqItems([key_col], support).collect()[0][0]
    # Candidates are bounded by ~1/support entries (the sketch map
    # size), so they embed as plan LITERALS: pass 2 is then ONE scan —
    # non-candidate rows collapse into a single null group that still
    # contributes to the exact total, and the shuffle carries
    # len(cands)+1 rows, never the key domain.
    key_or_null = (
        F.when(F.col(key_col).isin(*cands), F.col(key_col))
        if cands
        else F.lit(None).cast("string")
    )
    counts = keyed.groupBy(key_or_null.alias(key_col)).agg(
        F.count(F.lit(1)).alias("n")
    )
    # Exact total = sum over the aggregated rows (len(cands)+1 of them,
    # null group included) — an unordered single-partition window over
    # that BOUNDED set, so the token stream scans exactly once (a
    # separate counts.agg() subtree would re-scan it pre-AQE).
    total = F.sum("n").over(Window.partitionBy(F.lit(1)))
    return (
        counts.withColumn("_t", total)
        .filter(
            F.col(key_col).isNotNull()
            & (F.col("n") * den > num * F.col("_t"))
        )
        .select(key_col, "n")
    )
