"""Approximation-quality gates: the ANN paths must actually be good
approximations of the exact baseline, not just produce rows.

Recall@k is THE figure of merit for an ANN index; a refactor that
silently degrades bucketing (wrong centroid assignment, broken probe
ordering) keeps every rows-only/oracle check green while destroying
result quality. These tests pin a floor.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from typebus_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    train_centroids,
)
from typebus_spark.session import load_table

K = 5
N_QUERIES = 20


def _topk_sets(df, id_col="query_id", n_col="neighbor_id"):
    rows = df.select(id_col, n_col).collect()
    out: dict = {}
    for r in rows:
        out.setdefault(r[0], set()).add(r[1])
    return out


def test_ivf_recall_floor(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    c = e.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("corpus_vec"),
    )
    exact = _topk_sets(cosine_topk(q, c, k=K))
    centroids = train_centroids(
        e, "embedding", n_centroids=8, seed=7, id_col="vec_id", id_prefix=256
    )
    approx = _topk_sets(
        ivf_topk(q, c, k=K, centroids=centroids, nprobe=2)
    )
    hits = sum(len(exact[qid] & approx.get(qid, set())) for qid in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    # nprobe=2 of 8 prefix-picked centroids measures 0.41 on this
    # fixture; random bucket assignment would land near 2/8 = 0.25. The
    # floor sits between — a broken assignment collapses below it while
    # fixture drift across SFs keeps headroom above.
    assert recall >= 0.35, f"IVF recall@{K} = {recall:.2f}"


def test_ivf_recall_improves_with_nprobe(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    c = e.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("corpus_vec"),
    )
    exact = _topk_sets(cosine_topk(q, c, k=K))
    centroids = train_centroids(
        e, "embedding", n_centroids=8, seed=7, id_col="vec_id", id_prefix=256
    )

    def recall(nprobe: int) -> float:
        approx = _topk_sets(
            ivf_topk(q, c, k=K, centroids=centroids, nprobe=nprobe)
        )
        hits = sum(
            len(exact[qid] & approx.get(qid, set())) for qid in exact
        )
        return hits / sum(len(v) for v in exact.values())

    r2, r8 = recall(2), recall(8)
    # probing every bucket is exhaustive search → exact results
    assert r8 == 1.0, r8
    assert r2 <= r8


def test_kmeans_centroids_beat_or_match_prefix_pick(spark, sf_dir):
    """Real Lloyd's iterations must produce buckets at least as good as
    the oracle-checkable prefix pick (they're the production trainer)."""
    from typebus_spark.operators.similarity import train_centroids_kmeans

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    c = e.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("corpus_vec"),
    )
    exact = _topk_sets(cosine_topk(q, c, k=K))

    def recall(centroids):
        approx = _topk_sets(
            ivf_topk(q, c, k=K, centroids=centroids, nprobe=2)
        )
        hits = sum(
            len(exact[qid] & approx.get(qid, set())) for qid in exact
        )
        return hits / sum(len(v) for v in exact.values())

    prefix = recall(
        train_centroids(
            e, "embedding", n_centroids=8, seed=7,
            id_col="vec_id", id_prefix=256,
        )
    )
    kmeans = recall(
        train_centroids_kmeans(e, "embedding", n_centroids=8, seed=7)
    )
    # allow a small tolerance: k-means optimizes quantization error, and
    # on a tiny fixture the tie can break either way by one neighbor
    assert kmeans >= prefix - 0.05, (kmeans, prefix)


def test_lloyd_training_moves_centroids_and_keeps_recall(spark, sf_dir):
    """The Lloyd trainer must actually refine the init (centroids move)
    and must not degrade recall vs the raw prefix-pick codebook."""
    from typebus_spark.operators.similarity import train_centroids_lloyd

    e = load_table(spark, sf_dir, "embeddings")
    init = train_centroids(
        e, "embedding", n_centroids=8, seed=7, id_col="vec_id", id_prefix=256
    )
    trained = train_centroids_lloyd(
        e, "embedding", n_centroids=8, iters=2, seed=7,
        id_col="vec_id", id_prefix=256,
    )
    assert trained != init  # E/M rounds actually moved the codebook
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    c = e.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("corpus_vec"),
    )
    exact = _topk_sets(cosine_topk(q, c, k=K))

    def recall(cens):
        approx = _topk_sets(ivf_topk(q, c, k=K, centroids=cens, nprobe=2))
        hits = sum(len(exact[i] & approx.get(i, set())) for i in exact)
        return hits / sum(len(v) for v in exact.values())

    r_init, r_trained = recall(init), recall(trained)
    # training tightens buckets; allow small fixture noise but never a
    # collapse below the untrained codebook
    assert r_trained >= r_init - 0.05, (r_init, r_trained)


def test_kmeans_codebook_matches_frozen(spark, sf_dir):
    """The q_knn_ivf_kmeans oracle replays the FROZEN codebook
    (tools/freeze_ivf_codebook.py) as literals, betting that
    pyspark.ml KMeans is bit-reproducible for fixed (data, k, seed).
    This pin makes that bet observable locally: if a pyspark upgrade or
    trainer change ever shifts the trained centroids, this goes red
    BEFORE the driver's hash gate does (re-run the freeze tool to
    re-sync)."""
    from tools.freeze_ivf_codebook import fingerprint
    from typebus_spark.operators.similarity import train_centroids_kmeans
    from typebus_spark.queries._ivf_codebook import FROZEN_KMEANS_CODEBOOKS
    from typebus_spark.queries.similarity import IVF_N_CEN, IVF_SEED

    key = fingerprint(sf_dir)
    assert key in FROZEN_KMEANS_CODEBOOKS, (
        f"no frozen codebook for {sf_dir} (fingerprint {key}); "
        "run tools/freeze_ivf_codebook.py"
    )
    e = load_table(spark, sf_dir, "embeddings")
    live = train_centroids_kmeans(
        e, "embedding", n_centroids=IVF_N_CEN, seed=IVF_SEED
    )
    frozen = FROZEN_KMEANS_CODEBOOKS[key]
    assert len(live) == len(frozen)
    for lc, fc in zip(live, frozen):
        assert lc == fc  # bit-exact, not approx — the oracle needs ulps


def test_pq_rerank_recall_floor(spark, sf_dir):
    """Two-stage PQ (ADC shortlist -> exact re-rank) recall gate: recall
    equals the shortlist's containment of the true top-k (survivors are
    re-scored exactly), so a broken encode/reconstruction collapses it
    toward shortlist/corpus (~10% here) while the measured value sits
    near 0.6 on both fixtures."""
    from typebus_spark.operators.similarity import (
        pq_codebooks,
        pq_topk_rerank,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    c = e.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("corpus_vec"),
    )
    exact = _topk_sets(cosine_topk(q, c, k=K))
    books = pq_codebooks(
        e, "embedding", m=8, k_per_sub=16, seed=7,
        id_col="vec_id", id_prefix=256,
    )
    approx = _topk_sets(pq_topk_rerank(q, c, k=K, books=books, shortlist=50))
    hits = sum(len(exact[qid] & approx.get(qid, set())) for qid in exact)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.4, f"PQ re-rank recall@{K} = {recall:.2f}"


def test_pq_rerank_is_exact_on_survivors(spark, sf_dir):
    """Re-ranked cos values must equal the exact brute-force cos for
    every (query, neighbor) the two result sets share — stage 2 scores
    raw vectors, not reconstructions."""
    from typebus_spark.operators.similarity import (
        pq_codebooks,
        pq_topk_rerank,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    c = e.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("corpus_vec"),
    )
    exact = {
        (r.query_id, r.neighbor_id): r.cos
        for r in cosine_topk(q, c, k=K).collect()
    }
    books = pq_codebooks(
        e, "embedding", m=8, k_per_sub=16, seed=7,
        id_col="vec_id", id_prefix=256,
    )
    approx = {
        (r.query_id, r.neighbor_id): r.cos
        for r in pq_topk_rerank(q, c, k=K, books=books, shortlist=50).collect()
    }
    shared = set(exact) & set(approx)
    assert shared, "no overlap between exact and PQ results"
    for key in shared:
        assert exact[key] == approx[key], (key, exact[key], approx[key])


def test_frozen_codebook_loader_hits_frozen_dict(spark, sf_dir):
    """The fingerprint the loader computes in Spark must equal the
    DuckDB-computed key the freeze tool recorded — a mismatch silently
    falls back to live training (correct but retrains per session; the
    r9 1-based/0-based indexing slip hid exactly that way)."""
    from typebus_spark.queries._ivf_codebook import FROZEN_KMEANS_CODEBOOKS
    from typebus_spark.queries.similarity import (
        _CODEBOOK_FP_CACHE,
        _frozen_codebook,
    )

    _CODEBOOK_FP_CACHE.clear()
    book = _frozen_codebook(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    fp = _CODEBOOK_FP_CACHE[key]
    assert fp in FROZEN_KMEANS_CODEBOOKS, fp
    assert book == FROZEN_KMEANS_CODEBOOKS[fp]
