"""Accuracy gates for the sketch query (q_sketch_cardinality).

The sketch estimates are engine-specific bit patterns, so the driver can
only rows-check them (oracle=None) — which would leave estimate QUALITY
completely unverified. This test closes that hole the same way
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
"""

from __future__ import annotations

import numpy as np

from typebus_spark.session import load_table
from typebus_spark.suite import QUERIES

RSD = 0.02
ACCURACY = 10000


def test_sketch_estimates_within_bounds(spark, sf_dir):
    rows = QUERIES["q_sketch_cardinality"].fn(spark, sf_dir).collect()
    assert rows, "sketch query returned no groups"
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id", "value")
        .toPandas()
    )
    for row in rows:
        grp = ev[ev.event_type == row.event_type]
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
