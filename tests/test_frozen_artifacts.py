"""Loader-actually-hit pins for every frozen / memoized trained
artifact (r9 verdict item 4).

The canonical failure mode of the freeze strategy is a loader that
SILENTLY falls back to live training while live==frozen keeps every
correctness check green — the r9 frozen-codebook slip (DuckDB 1-based
vs Spark 0-based fingerprint indexing, 803ed88) survived a whole
sub-round that way and was caught by hand-audit. These pins make CI
catch it instead: for each artifact the test asserts the frozen dict /
memo is HIT (not just that outputs match), and that a warm rebuild of
the consuming query runs ZERO jobs — a fallback retrain always runs
jobs at plan-construction time, so ``builds_with_jobs`` (the same
probe bench.py trusts for its plan cache) is the detector.
"""

from __future__ import annotations

import hashlib

import pytest

from bench import builds_with_jobs
from typebus_spark.session import load_table
from typebus_spark.suite import QUERIES


@pytest.fixture(scope="module", autouse=True)
def _pretouch(spark, sf_dir):
    # first-scan footer/listing jobs would read as a loader miss
    for t in ("documents", "embeddings"):
        load_table(spark, sf_dir, t)


def _warm_then_probe(spark, sf_dir, qname):
    QUERIES[qname].fn(spark, sf_dir)
    return builds_with_jobs(spark, QUERIES[qname].fn, sf_dir, f"fz_{qname}")


def _check_ivf_codebook(spark, sf_dir):
    from typebus_spark.queries._ivf_codebook import FROZEN_KMEANS_CODEBOOKS
    from typebus_spark.queries.similarity import (
        _CODEBOOK_FP_CACHE,
        _SETUP_CACHE,
        _frozen_codebook,
    )

    _CODEBOOK_FP_CACHE.clear()
    book = _frozen_codebook(spark, sf_dir)
    fp = _CODEBOOK_FP_CACHE[(spark.sparkContext.applicationId, sf_dir)]
    assert fp in FROZEN_KMEANS_CODEBOOKS, (
        f"fingerprint {fp} not frozen — loader fell back to live "
        "KMeans training (re-run tools/freeze_ivf_codebook.py)"
    )
    assert book == FROZEN_KMEANS_CODEBOOKS[fp]
    # the frozen hit must mean the live-training fallback memo was
    # never exercised for this corpus
    key = (spark.sparkContext.applicationId, sf_dir, "kmeans_book")
    assert key not in _SETUP_CACHE, "fallback memo populated — dict missed"


def _check_langid_profile(spark, sf_dir):
    from typebus_spark.operators import _langid_profile as fz
    from typebus_spark.operators._langid_fixture import LANGID_TRAIN
    from typebus_spark.operators.text_analysis import langid_frozen_profile

    # fingerprint drift = fixture changed under the frozen literals
    assert fz.FIXTURE_FINGERPRINT == hashlib.md5(
        repr(LANGID_TRAIN).encode()
    ).hexdigest(), "fixture changed — re-run tools/freeze_langid_profile.py"
    delta, langs = langid_frozen_profile(spark)
    # literal local relations, exactly the frozen tables — no training
    # subtree in either plan
    assert delta.count() == len(fz.PROFILE_DELTA)
    assert langs.count() == len(fz.PROFILE_LANGS)
    for df in (delta, langs):
        plan = df._jdf.queryExecution().executedPlan().toString()
        # literal frames surface as LocalTableScan or parallelized
        # ExistingRDD depending on size — either way no file scan, no
        # aggregate, no training subtree
        assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan
        assert "FileScan" not in plan and "Aggregate" not in plan, plan


def _check_pq_books(spark, sf_dir):
    from typebus_spark.queries.similarity import _SETUP_CACHE

    assert not _warm_then_probe(spark, sf_dir, "q_knn_pq"), (
        "q_knn_pq ran jobs on a warm build — PQ books memo missed"
    )
    key = (spark.sparkContext.applicationId, sf_dir, "pq_books")
    assert key in _SETUP_CACHE


def _check_prefix_centroids(spark, sf_dir):
    from typebus_spark.queries.similarity import _SETUP_CACHE

    assert not _warm_then_probe(spark, sf_dir, "q_knn_ivf"), (
        "q_knn_ivf ran jobs on a warm build — prefix-centroid memo missed"
    )
    key = (spark.sparkContext.applicationId, sf_dir, "prefix_cen")
    assert key in _SETUP_CACHE


def _check_bpe_merges(spark, sf_dir):
    from typebus_spark.queries.corpus import _BPE_MERGE_MEMO

    assert not _warm_then_probe(spark, sf_dir, "q_bpe_encode"), (
        "q_bpe_encode ran jobs on a warm build — merges memo missed "
        "(retraining per run)"
    )
    key = (spark.sparkContext.applicationId, sf_dir)
    assert key in _BPE_MERGE_MEMO


def _check_topic_balance_frozen(spark, sf_dir):
    # the codebook consumer: a warm rebuild must be job-free (frozen
    # dict hit — no fingerprint re-collect thanks to the fp cache, no
    # KMeans retrain)
    assert not _warm_then_probe(spark, sf_dir, "q_topic_balance"), (
        "q_topic_balance ran jobs on a warm build — frozen codebook "
        "loader fell back to live training (the r9 803ed88 failure)"
    )


def _check_media_fixtures(spark, sf_dir):
    import base64

    from typebus_spark.operators._media_fixtures import PHASH_NEAR_FIXTURES
    from typebus_spark.operators.codecs import average_hash

    for fx in PHASH_NEAR_FIXTURES:
        blob = base64.b64decode(fx["b64"])
        assert average_hash(blob, fx["mime"]) == fx["phash"], (
            "frozen phash literal drifted from the fixture bytes — "
            "re-run tools/gen_media_fixtures.py"
        )


def _check_minhash_stored_index(spark, sf_dir):
    from typebus_spark.queries.dedup import _MINHASH_INDEX_CACHE

    assert not _warm_then_probe(spark, sf_dir, "q_dedup_minhash_incremental"), (
        "q_dedup_minhash_incremental ran jobs on a warm build — stored "
        "minhash index memo missed (re-deriving history per run)"
    )
    key = (spark.sparkContext.applicationId, sf_dir, False)
    assert key in _MINHASH_INDEX_CACHE


def _check_exact_stored_index(spark, sf_dir):
    from typebus_spark.queries.dedup import _EXACT_INDEX_CACHE

    assert not _warm_then_probe(spark, sf_dir, "q_dedup_incremental"), (
        "q_dedup_incremental ran jobs on a warm build — stored exact "
        "index memo missed (re-hashing the corpus per run)"
    )
    key = (spark.sparkContext.applicationId, sf_dir)
    assert key in _EXACT_INDEX_CACHE


def _check_staged_wire(spark, sf_dir):
    from typebus_spark.queries.dataflow import _WIRE_CACHE, staged_wire

    # warm: q_route_counts stages its wire batch on first build
    QUERIES["q_route_counts"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    key = (spark.sparkContext.applicationId, sf_dir, "events_api")
    assert key in _WIRE_CACHE, sorted(_WIRE_CACHE)
    # loader-actually-hit: a poisoned build thunk proves the cached
    # frame is returned WITHOUT re-invoking the encode builder (the
    # route queries stay honestly stateful — their decode checkpoints
    # still run per build — but the fixture ENCODE must not)
    def _poison():
        raise AssertionError("staged_wire re-built a cached wire batch")

    df = staged_wire(spark, sf_dir, "events_api", _poison)
    assert df is _WIRE_CACHE[key]


CASES = {
    "ivf_codebook": _check_ivf_codebook,
    "langid_profile": _check_langid_profile,
    "pq_books": _check_pq_books,
    "prefix_centroids": _check_prefix_centroids,
    "bpe_merges": _check_bpe_merges,
    "topic_balance_frozen": _check_topic_balance_frozen,
    "media_fixtures": _check_media_fixtures,
    "minhash_stored_index": _check_minhash_stored_index,
    "exact_stored_index": _check_exact_stored_index,
    "staged_wire": _check_staged_wire,
}


@pytest.mark.parametrize("artifact", sorted(CASES))
def test_frozen_loader_actually_hits(spark, sf_dir, artifact):
    CASES[artifact](spark, sf_dir)
