"""Deterministic corpus splitting & sampling for training pipelines.

The reference has no sampling surface (it is an event bus); these are
north-star extensions for the LLM-data path, where the split assignment
must be (a) deterministic — a document keeps its split forever, even as
the corpus grows, so train/test contamination can't creep in across
pipeline runs — and (b) engine-portable, so an offline auditor (or the
DuckDB oracle) can re-derive the exact assignment.

Mechanism: bucket = 60-bit md5 prefix of ``seed:id`` mod ``buckets``
(Spark ``conv(...,16,10)`` ≡ DuckDB ``('0x'||...)::BIGINT``, verified
bit-identical), split chosen by cumulative fraction thresholds. Pure
expression — no shuffle, no UDF, scan-speed at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

HASH_BUCKETS = 10_000


def hash_bucket(
    id_col: str, seed: int = 42, buckets: int = HASH_BUCKETS
) -> F.Column:
    """Stable per-row bucket in [0, buckets) from the row id."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % buckets


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash-bucket thresholds.

    ``splits`` is an ordered {name: fraction} (fractions sum to 1; the
    LAST split absorbs rounding). Assignment is per-row deterministic
    and independent of corpus size/order — adding documents never moves
    an existing document between splits.
    """
    names = list(splits)
    b = hash_bucket(id_col, seed)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        thr = int(round(acc * HASH_BUCKETS))
        expr = (
            F.when(b < thr, name)
            if expr is None
            else expr.when(b < thr, name)
        )
    final = (
        expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1])
    )
    return df.withColumn(split_col, final)


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    seed: int = 42,
) -> DataFrame:
    """Deterministic fraction sample by the same bucket hash — unlike
    ``DataFrame.sample`` the selection is stable across partitionings,
    engines, and reruns (re-derivable row set for audits)."""
    thr = int(round(fraction * HASH_BUCKETS))
    return df.filter(hash_bucket(id_col, seed) < thr)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    threshold_col: str,
    seed: int = 7,
) -> DataFrame:
    """Per-row Bernoulli IMPORTANCE sampling, deterministic & portable:
    keep a row iff ``hash_bucket(id) < threshold_col`` where the
    threshold column holds ``round(keep_probability * HASH_BUCKETS)``.

    Generalizes :func:`hash_sample` from one constant fraction to a
    per-row keep probability (quality weight, domain rebalancing
    factor, importance ratio à la DSIR — Xie et al. 2023). Because the
    coin is the row's own 60-bit md5 bucket, the decision is a pure
    function of (seed, id): reruns, repartitioning, and other engines
    reproduce the exact sample — an auditor can re-derive WHY any row
    was kept or dropped. Pure expression, scan-speed, no shuffle.
    """
    return df.filter(hash_bucket(id_col, seed) < F.col(threshold_col))


def rebalance_sources(
    df: DataFrame,
    id_col: str,
    group_col: str,
    seed: int = 7,
) -> DataFrame:
    """Uniform domain rebalancing (temperature → 0 mix): downsample
    each ``group_col`` domain to ~equal expected size — keep
    probability ``min(1, N / (k·n_g))`` for a domain of ``n_g`` rows
    among ``k`` domains totalling ``N``.

    The per-domain threshold is derived with ONE exact double division
    of integer-valued operands (both engines see identical doubles →
    identical round), then sampling is :func:`weighted_sample` — fully
    deterministic and engine-replayable. Cost: one tiny per-domain
    aggregate broadcast back over the scan; the corpus itself is
    never shuffled. Returns the surviving rows with the per-domain
    ``sample_thr`` attached.
    """
    thr = rebalance_thresholds(df, group_col)
    return weighted_sample(
        df.join(F.broadcast(thr), group_col), id_col, "sample_thr", seed
    )


def rebalance_thresholds(df: DataFrame, group_col: str) -> DataFrame:
    """The ``(group, n_before, sample_thr)`` frame behind
    :func:`rebalance_sources` — exposed so audits can report EVERY
    group's threshold, including groups the sample empties (deriving
    the threshold from surviving rows would drop those)."""
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    totals = counts.agg(
        F.sum("n_before").cast("long").alias("_n"),
        F.count(F.lit(1)).cast("long").alias("_k"),
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        group_col,
        "n_before",
        F.least(
            F.lit(HASH_BUCKETS),
            F.round(
                F.lit(float(HASH_BUCKETS))
                * F.col("_n")
                / (F.col("_k") * F.col("n_before")),
                0,
            ).cast("long"),
        ).alias("sample_thr"),
    )


def shard_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 11,
) -> DataFrame:
    """Deterministic training-order shuffle + shard assignment — the
    last step before writing training shards: every row gets a
    pseudo-random ``shard`` in [0, n_shards) and a reproducible
    within-shard position ``pos`` (0-based), so readers stream shards
    sequentially and still see a uniform global shuffle.

    Mechanism: the row's 60-bit md5 bucket (the corpus-splitting hash)
    doubles as both the shard key (mod) and the within-shard sort key
    (div — the high bits, independent of the shard mod), with ``id`` as
    the total-order tiebreak. Everything is a pure function of
    (seed, id): reruns, engines, and auditors reproduce the exact
    placement — no RNG state, no ``ORDER BY rand()``.

    Scale shape: ONE hash shuffle on ``shard`` + a partition-local sort
    (window row_number per shard ≡ repartition + sortWithinPartitions —
    NO global sort; plan-pinned). At 100 TB this is the minimal
    physical movement any shard writer must do anyway.
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("shard").orderBy(
        F.expr(f"_h DIV {n_shards}"), id_col
    )
    return (
        df.withColumn("_h", h)
        .withColumn("shard", (F.col("_h") % n_shards).cast("long"))
        .withColumn("pos", F.row_number().over(w).cast("long") - F.lit(1))
        .drop("_h")
    )


def rebalance_audit(
    df: DataFrame,
    id_col: str,
    group_col: str,
    seed: int = 7,
) -> DataFrame:
    """Per-group before/after audit of :func:`rebalance_sources` —
    ``(group, n_before, sample_thr, n_after, id_checksum)``.

    Built from the THRESHOLD table, not from surviving rows: a group
    the sample empties still reports its real ``n_before``/
    ``sample_thr`` with ``n_after = id_checksum = 0`` (deriving the
    audit from survivors would emit NULL thresholds for zeroed groups
    and lie about why they vanished). The thresholds are computed once
    and reused for the sample — one counts pass + one sample pass over
    ``df``, and the kept aggregate left-joins onto the tiny threshold
    frame.
    """
    thr = rebalance_thresholds(df, group_col)
    kept = weighted_sample(
        df.join(F.broadcast(thr.select(group_col, "sample_thr")), group_col),
        id_col,
        "sample_thr",
        seed,
    )
    audit = kept.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.sum(id_col).cast("long").alias("id_checksum"),
    )
    return thr.join(audit, group_col, "left").select(
        group_col,
        "n_before",
        "sample_thr",
        F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
        F.coalesce("id_checksum", F.lit(0)).cast("long").alias("id_checksum"),
    )


def reservoir_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int,
    seed: int = 7,
) -> DataFrame:
    """Deterministic k-row 'reservoir' per group: rank rows inside each
    group by the md5 of ``seed:id`` (a stable uniform shuffle) and keep
    the first ``k``. Unlike a true streaming reservoir the selection is
    a pure function of (seed, id, group membership) — reruns and other
    engines reproduce the exact sample, and a row's rank only changes
    if rows HASHED BELOW it enter its group.

    Scale: the rank-then-filter shape is planned as a WindowGroupLimit
    (per-partition partial top-k before the shuffle), so the exchange
    carries O(partitions · k) rows per group, not the whole group —
    the per-group sample of a 100 TB corpus never materializes full
    groups on one node.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
        id_col,
    )
    return (
        df.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )
