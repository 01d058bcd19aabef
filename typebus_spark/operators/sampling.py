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
