"""Pin the bench harness's stateful-query auto-detection.

The prepared-plan cache in bench.py must NEVER serve a query whose
fn() executes work during construction (streams, drains, trainers,
iterative loops) — caching their handle would skip the work and
under-report. This pins the detector on one known query of each kind
so a refactor of either the queries or the probe can't silently flip a
classification.
"""

from __future__ import annotations

import pytest

from bench import builds_with_jobs
from typebus_spark.session import load_table
from typebus_spark.suite import QUERIES

PURE = [
    "q1_pricing_summary",      # plain relational
    "q_chunk_overlap",         # scan-side explode
    "q_dedup_near_jaccard",    # lazy persist — no build-time job
    "q_profile_table",         # one-pass aggregate
]
STATEFUL = [
    "q_retry_drain",           # drain rounds execute during fn()
    "q_stream_hourly",         # streaming query runs during fn()
    "q_knn_ivf_kmeans",        # trainer collects centroids
    "q_dedup_clusters",        # iterative convergence loop
]


@pytest.fixture(scope="module", autouse=True)
def _pretouch(spark, sf_dir):
    # first-scan footer/listing jobs would misattribute as stateful
    for t in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t)


@pytest.mark.parametrize("name", PURE)
def test_pure_queries_build_without_jobs(spark, sf_dir, name):
    assert not builds_with_jobs(spark, QUERIES[name].fn, sf_dir, name), (
        f"{name} ran jobs during plan construction — either the query "
        "gained a build-time action (fix it: that cost repeats on every "
        "plan build) or the probe broke"
    )


@pytest.mark.parametrize("name", STATEFUL)
def test_stateful_queries_are_detected(spark, sf_dir, name):
    assert builds_with_jobs(spark, QUERIES[name].fn, sf_dir, name), (
        f"{name} built without jobs — if its execution genuinely moved "
        "out of fn() this pin can be updated, but a detection bug here "
        "means the bench plan-cache would skip its real work"
    )
