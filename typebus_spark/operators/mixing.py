"""Training-mix construction: the operators between a clean corpus and
a tokenized training run.

- **stratified_sample**: per-stratum keep fractions (rebalance a source/
  language mix) — md5-bucket thresholding, so the sample is exactly
  reproducible on any engine and STABLE as the corpus grows (a kept doc
  stays kept; contrast ``DataFrame.sampleBy``, whose membership changes
  with partitioning and seed plumbing).
- **token_budget_mix**: cap each source at a token budget — docs taken
  in deterministic md5 order until the budget fills. Two-phase prefix
  sum: per-(source, hash-prefix-bucket) token totals are prefix-summed
  on a tiny table and broadcast back, so the per-row cumsum window
  partitions by (source, bucket) — never a whole source. No collects.
- **pack_sequences**: concat-and-chunk sequence packing (the standard
  pretraining shape: shard text is concatenated then split every
  ``max_tokens``). Docs are sharded by id hash, ordered by hash within
  the shard, and each doc learns which sequence range it spans. Shards
  are independent → embarrassingly parallel at 100 TB; the window
  cumsum partitions by shard, never a global order.

All three are pure expression pipelines (md5 + window sums) — exactly
reproducible cross-engine, hence fully oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# The ONE engine-portable uniform hash (60-bit md5 prefix → BIGINT):
# shared with hash_split/hash_sample so the portability-critical scheme
# has a single definition that can't drift.
from typebus_spark.operators.sampling import HASH_BUCKETS as _BUCKETS
from typebus_spark.operators.sampling import hash_bucket as _hash_bucket


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Keep ``fractions[stratum]`` of each stratum, deterministically.

    Membership depends only on (seed, id), so re-runs, engine changes,
    and corpus growth never flip a document's fate — the property a
    training-mix manifest needs.
    """
    bucket = _hash_bucket(id_col, seed)
    thr = F.lit(int(default_fraction * _BUCKETS))
    for value, frac in fractions.items():
        thr = F.when(
            F.col(strata_col) == value, F.lit(int(frac * _BUCKETS))
        ).otherwise(thr)
    return df.filter(bucket < thr)


def token_budget_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    tokens_col: str,
    budget_per_source: int,
    seed: int = 42,
    bucket_chars: int = 2,
) -> DataFrame:
    """Take documents per source, in deterministic md5 order, until the
    source's token budget fills (first doc always admitted).

    Scale shape — a realistic pretraining mix has a HANDFUL of sources,
    so a window partitioned by source alone would absorb an entire
    source's documents into one task. Instead, a two-phase prefix sum:

    1. Bucket every doc by the first ``bucket_chars`` hex chars of its
       md5 ordering hash. Hex-string lexicographic order equals numeric
       prefix order, so sorting by (bucket, hash) == sorting by hash —
       bucket offsets compose exactly with intra-bucket cumsums.
    2. Aggregate per-(source, bucket) token totals (map-side partials;
       the result is ~n_sources × 16^bucket_chars rows), prefix-sum
       that tiny table per source, and broadcast it back.
    3. Buckets whose offset already exceeds the budget are dropped
       BEFORE the per-row window — when budget ≪ corpus (the usual
       case) most data never reaches the sort.
    4. The per-row cumsum window partitions by (source, bucket): each
       task sorts ~1/16^bucket_chars of one source, bounded state.

    Result rows are identical to the naive whole-source window; only
    the plan changes. ``budget_per_source`` can be a dict at the call
    site by unioning per-source calls; the uniform cap stays one pass.
    """
    h = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    ).alias("_h")
    d = df.withColumn("_h", h).withColumn(
        "_b", F.substring(F.col("_h"), 1, bucket_chars)
    )
    totals = d.groupBy(source_col, "_b").agg(
        F.sum(tokens_col).alias("_btok")
    )
    wb = (
        Window.partitionBy(source_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_boff", F.coalesce(F.sum("_btok").over(wb), F.lit(0))
    ).drop("_btok")
    w = (
        Window.partitionBy(source_col, "_b")
        .orderBy("_h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_cum = (
        d.join(F.broadcast(offsets), [source_col, "_b"])
        .filter(F.col("_boff") < budget_per_source)
        .withColumn(
            "_cum_before",
            F.col("_boff")
            + F.coalesce(F.sum(tokens_col).over(w), F.lit(0)),
        )
    )
    return with_cum.filter(
        F.col("_cum_before") < budget_per_source
    ).drop("_h", "_b", "_boff", "_cum_before")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    max_tokens: int,
    n_shards: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Concat-and-chunk packing: each shard's documents are concatenated
    in hash order and split every ``max_tokens``; each doc reports the
    sequence range it spans.

    Output: (id, shard, start_seq, end_seq, n_tokens) where seq indices
    are shard-local. Shards are independent, so the only window runs
    within a shard partition — the packing of a 100 TB corpus is
    n_shards-way parallel with bounded per-task state.
    """
    shard = (_hash_bucket(id_col, seed) % n_shards).alias("shard")
    h = F.md5(
        F.concat(F.lit(f"pack{seed}:"), F.col(id_col).cast("string"))
    ).alias("_h")
    w = (
        Window.partitionBy("shard")
        .orderBy("_h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_cum = (
        df.select(F.col(id_col), F.col(tokens_col).alias("_tok"), shard, h)
        .withColumn(
            "_cum_before", F.coalesce(F.sum("_tok").over(w), F.lit(0))
        )
    )
    return with_cum.select(
        F.col(id_col),
        F.col("shard").cast("long").alias("shard"),
        F.floor(F.col("_cum_before") / max_tokens).alias("start_seq"),
        F.floor(
            (F.col("_cum_before") + F.col("_tok") - 1) / max_tokens
        ).alias("end_seq"),
        F.col("_tok").cast("long").alias("n_tokens"),
    )


def temperature_mix(
    df: DataFrame,
    id_col: str,
    group_col: str,
    budget: int,
    seed: int = 7,
) -> DataFrame:
    """Temperature-based group sampling at alpha = 1/2: the multilingual
    pretraining recipe (sample group i with probability proportional to
    n_i^alpha, alpha < 1 upweighting low-resource groups — the
    XLM-R/mBERT/T5 mixture scheme). ``rebalance_sources`` is the
    alpha -> 0 limit (uniform); this is the smooth middle.

    alpha is fixed at 1/2 because sqrt is IEEE correctly-rounded on
    every engine while pow(x, alpha) = exp(alpha*ln x) is not
    (CLAUDE.md transcendental rule): sqrt weights are fixed to integer
    NANO-UNITS before normalizing, so the group-weight sum is an
    integer (order-free, exact) and every downstream probability is a
    single division of integer-valued operands — bit-identical across
    engines, no window-order or partial-agg-order hazard.

    Per group: raw count, temperature probability ``p``, per-doc keep
    ``rate`` = min(1, budget*p/n) (budget in documents), and the
    realized ``n_sampled`` under the md5-uniform keep rule
    u(id) < rate (exactly reproducible; membership stable as the
    corpus grows, unlike DataFrame.sample). Two column-pruned scans of
    the input (count pass + sample pass; the group table is k rows and
    broadcast back — the r9 decomposition lesson: narrow scans beat
    carrying both aggregates through one pass at columnar-storage
    scale).
    """
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    wi = F.floor(
        F.sqrt(F.col("n_docs").cast("double")) * F.lit(1000000000.0)
    ).cast("long")
    tot = F.sum("_wi").over(Window.partitionBy())
    rates = (
        counts.withColumn("_wi", wi)
        .withColumn("_p", F.col("_wi").cast("double") / tot.cast("double"))
        .withColumn(
            "_rate",
            F.least(
                F.lit(1.0),
                F.lit(float(budget))
                * F.col("_p")
                / F.col("n_docs").cast("double"),
            ),
        )
        # consumed by BOTH the sample branch (broadcast) and the final
        # report join — persist the k-row frame so the count scan runs
        # once (the r9 double-scan rule; single-reuse persist, not an
        # iterative loop)
        .persist()
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"tm{seed}:"), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    sampled = (
        df.select(F.col(id_col), F.col(group_col))
        .join(
            F.broadcast(rates.select(group_col, "_rate")), group_col
        )
        .filter(u < F.col("_rate"))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))
    )
    return (
        rates.join(sampled, group_col, "left")
        .select(
            F.col(group_col),
            F.col("n_docs"),
            F.round("_p", 6).alias("p"),
            F.round("_rate", 6).alias("rate"),
            F.coalesce(F.col("n_sampled"), F.lit(0).cast("long")).alias(
                "n_sampled"
            ),
        )
    )
