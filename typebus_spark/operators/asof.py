"""As-of (point-in-time) and range joins — operators Spark lacks natively.

As-of join: for each left row, the single most recent right row with
``right.ts <= left.ts`` (backward) or earliest with ``>=`` (forward),
per key. Implemented as the union+window trick: tag sides, union, one
window pass ordered by time propagating the last-seen right row — ONE
shuffle on (key), no range-explosion, no per-key driver loop. This is
the scalable pattern (a naive range join is O(n·m) per key; this is
O((n+m) log) via sort within partitions) — at 100 TB the shuffle is on
the join key only, identical to a regular join's.

Range join: inequality-band join expressed so Catalyst can use a
bucketed equi-prejoin on a coarse time bucket, turning the cross into
per-bucket locality.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Point-in-time join; all left columns survive, right columns arrive
    prefixed. ``direction``: 'backward' (default, most recent right at or
    before left ts) or 'forward'."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = left.columns
    rcols = [c for c in right.columns if c not in (on, right_ts)]

    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast("timestamp").alias("_rt"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in rcols],
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            lt.schema["_l"].dataType.simpleString()
        ).alias("_l"),
        F.col(right_ts).alias("_rt"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    u = lt.unionByName(rt)

    if direction == "backward":
        # right rows sort BEFORE a left row at the same ts (inclusive match)
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    filled = u.select(
        "*",
        F.last(F.col("_rt"), ignorenulls=True).over(w).alias("_m_rt"),
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in rcols
        ],
    ).filter(F.col("_is_left") == 1)

    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_timestamp(F.col("_t")) - F.unix_timestamp(F.col("_m_rt"))
        )
        in_tol = F.col("_m_rt").isNotNull() & (gap <= tolerance_seconds)
    else:
        in_tol = F.col("_m_rt").isNotNull()

    return filled.select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        F.when(in_tol, F.col("_m_rt")).alias(f"{right_prefix}{right_ts}"),
        *[
            F.when(in_tol, F.col(f"_m_{c}")).alias(f"{right_prefix}{c}")
            for c in rcols
        ],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
) -> DataFrame:
    """Interval join: pairs where right.ts ∈ [left.ts + lower, left.ts +
    upper], same key. Bucketized: both sides get coarse time buckets of
    width (upper-lower+ε); the join is an equi-join on (key, bucket) over
    the 2-3 candidate buckets, then the exact band filter — avoiding the
    full per-key cross product. Right-side columns colliding with left
    names arrive renamed ``r_<name>``."""
    collide = (set(left.columns) & set(right.columns)) - {on}
    for c in collide:
        right = right.withColumnRenamed(c, f"r_{c}")
    if right_ts in collide:
        right_ts = f"r_{right_ts}"

    width = max(upper_seconds - lower_seconds, 1.0)
    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.array(
                *[
                    (
                        (F.unix_timestamp(F.col(left_ts)) + F.lit(lower_seconds))
                        / F.lit(width)
                    ).cast("long")
                    + F.lit(i)
                    for i in range(
                        int((upper_seconds - lower_seconds) // width) + 2
                    )
                ]
            )
        ),
    )
    rb = right.withColumn(
        "_bucket", (F.unix_timestamp(F.col(right_ts)) / F.lit(width)).cast("long")
    )
    j = lb.join(rb, [on, "_bucket"])
    # Exact band on FULL-precision event time. unix_timestamp truncates
    # to whole seconds — fine for the bucket index above (floor of floor
    # is floor for integer widths, so coverage is unchanged) but wrong
    # for the band edge: a sub-second ts at the boundary would be
    # included/excluded differently than true interval arithmetic.
    # timestamp→double keeps fractional seconds; the intermediate
    # TIMESTAMP cast covers TIMESTAMP_NTZ inputs (any session-timezone
    # shift is identical on both sides and cancels in the band compare).
    def _epoch(c: str) -> F.Column:
        return F.col(c).cast("timestamp").cast("double")

    lo = _epoch(left_ts) + F.lit(lower_seconds)
    hi = _epoch(left_ts) + F.lit(upper_seconds)
    rts = _epoch(right_ts)
    return j.filter((rts >= lo) & (rts <= hi)).drop("_bucket").distinct()
