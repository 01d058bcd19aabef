"""Similarity-search inventory queries (north-star) over ``embeddings``.

Cosine arithmetic is double-cast + strictly ordered fold on both engines
(verified bit-identical, 0.0 max abs diff vs DuckDB list_reduce), so the
brute-force top-k is fully oracle-checked. The IVF variant trades recall
for a corpus-linear plan → rows-only check, as declared.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from typebus_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    train_centroids,
)
from typebus_spark.queries.dedup import _DOT, _NORM
from typebus_spark.suite import query, t

K = 5
N_QUERIES = 10


@query(
    "q_knn_cosine_topk",
    oracle=f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
           WHERE vec_id < {N_QUERIES}),
c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
s AS (SELECT qid, cid,
             round({_DOT.format(a='qv', b='cv')}
                   / ({_NORM.format(a='qv')} * {_NORM.format(a='cv')}), 6) AS cos
      FROM q, c WHERE qid <> cid),
r AS (SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
      FROM s)
SELECT qid AS query_id, cid AS neighbor_id, rank, cos
FROM r WHERE rank <= {K}
""",
    doc=(
        "Brute-force cosine top-k: broadcast query set × corpus, window "
        "rank — exact ANN baseline; corpus side never shuffles."
    ),
)
def q_knn_cosine_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk(
        q,
        e.select(
            F.col("vec_id").alias("corpus_id"),
            F.col("embedding").alias("corpus_vec"),
        ),
        k=K,
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.col("rank").cast("long").alias("rank"),
        "cos",
    )


@query(
    "q_lsh_embedding_bucketed",
    oracle=None,  # probabilistic recall by construction → rows-only check
    doc=(
        "Hyperplane-LSH bucketed embedding near-dup: seeded random planes "
        "as plan literals, sign-signature equality as the bucket join — "
        "sub-quadratic pair generation (scale path of q_dedup_embedding)."
    ),
)
def q_lsh_embedding_bucketed(spark, sf_dir):
    import random

    from typebus_spark.operators.dedup import embedding_dup_pairs

    # 4 planes / threshold 0.3, calibrated to the synthetic fixture
    # (same-label cosines top out ≈0.51): collision probability per
    # plane at cos 0.3 is ~0.6 → ~13% bucket recall, enough for a
    # non-trivial rows-only check while staying bucket-join-only
    rng = random.Random(42)
    planes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(4)]
    e = t(spark, sf_dir, "embeddings")
    return embedding_dup_pairs(
        e, "vec_id", "embedding", threshold=0.3, planes=planes
    )


@query(
    "q_knn_ivf",
    oracle=None,  # probabilistic recall by construction → rows-only check
    doc=(
        "IVF-bucketed ANN: corpus partitioned by nearest centroid, queries "
        "probe nprobe buckets — shuffle bounded by corpus size (scale path)."
    ),
)
def q_knn_ivf(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    centroids = train_centroids(e, "embedding", n_centroids=8, seed=42)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_topk(
        q,
        e.select(
            F.col("vec_id").alias("corpus_id"),
            F.col("embedding").alias("corpus_vec"),
        ),
        k=K,
        centroids=centroids,
        nprobe=2,
    )
