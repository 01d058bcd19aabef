"""Accuracy gates for the sketch surface.

q_sketch_cardinality is now the PORTABLE profile (KMV distinct + exact
interpolated percentiles) so the driver hash-checks it. The
engine-specific estimators — ``approx_count_distinct`` (HyperLogLog++)
and ``percentile_approx`` (Greenwald-Khanna) — remain the constant-
memory scale path at 100 TB, but their bit patterns can't cross
engines, so their QUALITY is gated here instead, the same way
test_ann_recall.py gates the KMeans codebook: compute the exact answers
locally and assert every estimate lands inside its sketch's published
error bound, per event type.

Bounds under test:
- ``approx_count_distinct(..., rsd=0.02)`` — HyperLogLog++ with a 2%
  target relative standard deviation. We allow 3×rsd (≈3σ) plus an
  absolute floor of 3 for tiny groups, where the sparse-mode estimator
  is exact-ish but integer-granular.
- ``percentile_approx(value, p, 10000)`` — Greenwald-Khanna style with
  rank error ≤ 1/accuracy. The returned value must be an actual data
  value whose RANK is within n/accuracy (+1 for discreteness) of the
  target rank p·(n-1).
- KMV k=128 — relative error ~1/sqrt(k) ≈ 8.8%; we allow 4/sqrt(k)
  (≈4σ) plus the same absolute floor.
"""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from typebus_spark.session import load_table
from typebus_spark.suite import QUERIES

RSD = 0.02
ACCURACY = 10000
KMV_K = 128


def test_hll_kll_estimates_within_bounds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=RSD).alias(
                "approx_users"
            ),
            F.percentile_approx("value", F.lit(0.5), ACCURACY).alias(
                "q50"
            ),
            F.percentile_approx("value", F.lit(0.9), ACCURACY).alias(
                "q90"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert rows, "sketch aggregation returned no groups"
    pdf = ev.select("event_type", "user_id", "value").toPandas()
    for row in rows:
        grp = pdf[pdf.event_type == row.event_type]
        assert row.n == len(grp)  # exact count agrees with pandas

        exact_users = grp.user_id.nunique()
        tol = max(3.0, 3 * RSD * exact_users)
        assert abs(row.approx_users - exact_users) <= tol, (
            row.event_type,
            row.approx_users,
            exact_users,
        )

        vals = np.sort(grp.value.to_numpy())
        n = len(vals)
        for p, est in ((0.5, row.q50), (0.9, row.q90)):
            # the GK sketch returns a member of the dataset
            lo = np.searchsorted(vals, est, side="left")
            hi = np.searchsorted(vals, est, side="right")
            assert lo < hi, (row.event_type, p, est, "not a data value")
            target = p * (n - 1)
            slack = n / ACCURACY + 1.0
            assert lo - slack <= target <= (hi - 1) + slack, (
                row.event_type,
                p,
                est,
                (lo, hi, target, slack),
            )


def test_portable_profile_accuracy(spark, sf_dir):
    """The driver hash-checks the KMV values; this gates that they are
    also ACCURATE (a deterministic-but-wrong estimator would hash-check
    fine)."""
    rows = QUERIES["q_sketch_cardinality"].fn(spark, sf_dir).collect()
    assert rows, "portable profile returned no groups"
    pdf = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id", "value")
        .toPandas()
    )
    rel = 4.0 / math.sqrt(KMV_K)
    for row in rows:
        grp = pdf[pdf.event_type == row.event_type]
        assert row.n == len(grp)

        exact_users = grp.user_id.nunique()
        tol = max(3.0, rel * exact_users)
        assert abs(row.kmv_users - exact_users) <= tol, (
            row.event_type,
            row.kmv_users,
            exact_users,
        )

        # exact interpolated percentiles must match numpy's linear rule
        vals = np.sort(grp.value.to_numpy())
        for p, got in ((0.5, row.q50), (0.9, row.q90)):
            want = float(np.quantile(vals, p))
            assert abs(got - want) <= 1e-9 * max(1.0, abs(want)), (
                row.event_type,
                p,
                got,
                want,
            )
