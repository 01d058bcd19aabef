"""Approximate / exact nearest-neighbor search over embedding columns.

North-star extension (BASELINE.json). Two strategies:

- **cosine_topk** — brute-force exact top-k: query set (small) is
  broadcast against the corpus; per-corpus-partition scoring, then a
  global top-k per query via window rank. Cost O(|Q|·|C|) — the
  correctness baseline and perfectly fine when |Q| is small (the
  broadcast side) even at 100 TB corpus.
- **ivf_topk** — IVF-style: corpus is bucketed by nearest centroid
  (computed once, seeded, driver-side on a sample), queries probe the
  ``nprobe`` nearest centroids only — cost drops by ~n_centroids/nprobe.
  Recall < 1 by construction (rows-only check).

All scoring is JVM-side (functions.vector); no UDFs.
"""

from __future__ import annotations

from functools import lru_cache

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from typebus_spark.functions.vector import dot, norm


@lru_cache(maxsize=32)
def _side_proj(id_col: str, vec_col: str, out: str) -> tuple:
    """(id AS {out}id, vec AS {out}v, norm AS {out}n) — shared by the
    brute-force and IVF paths; the norm fold is ~15 round trips and the
    trainer loops rebuild these per pass."""
    return (
        F.col(id_col).alias(f"{out}id"),
        F.col(vec_col).alias(f"{out}v"),
        norm(vec_col).alias(f"{out}n"),
    )


@lru_cache(maxsize=1)
def _cos_score_col() -> F.Column:
    return F.round(
        dot("qv", "cv") / (F.col("qn") * F.col("cn")), 6
    ).alias("cos")


@lru_cache(maxsize=16)
def _topk_cols(k: int) -> tuple:
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    return (
        F.row_number().over(w).alias("rank"),
        F.col("rank") <= k,
        (
            F.col("qid").alias("query_id"),
            F.col("cid").alias("neighbor_id"),
            F.col("rank"),
            F.col("cos"),
        ),
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "corpus_id",
    corpus_vec: str = "corpus_vec",
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k neighbors per query.

    Returns (query_id, neighbor_id, rank, cos) — cos rounded to 6 dp and
    ties broken by neighbor id, so results are fully deterministic.
    """
    # norms computed ONCE per row on each join input (they materialize in
    # the exchange), not re-folded per pair — 3× less work per pair
    from typebus_spark.session import ensure_parallelism

    q = queries.select(*_side_proj(query_id, query_vec, "q"))
    # corpus side: spread a small single-file input across cores (the
    # per-pair vector fold is compute-bound); no-op at cluster scale
    c = ensure_parallelism(
        corpus.select(*_side_proj(corpus_id, corpus_vec, "c"))
    )
    scored = F.broadcast(q).crossJoin(c)
    if not include_self:
        scored = scored.filter(F.col("qid") != F.col("cid"))
    scored = scored.select("qid", "cid", _cos_score_col())
    return _topk_per_query(scored, k)


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Exact top-k over (qid, cid, cos) rows.

    Declared as one rank-filtered window; Catalyst compiles it to
    two-phase top-k natively — ``WindowGroupLimit … Partial`` keeps only
    k rows per query PER MAP PARTITION before the exchange, the Final
    pass ranks the survivors — so the per-query shuffle carries
    O(partitions·k), not |C|, rows. Both Sorts are partition-local
    (no global sort). Pinned by tests/test_plans.py
    (test_knn_topk_native_partial_limit)."""
    rank_col, rank_le_k, out_cols = _topk_cols(k)
    return (
        scored.withColumn("rank", rank_col)
        .filter(rank_le_k)
        .select(*out_cols)
    )


def label_centroids(
    df: DataFrame,
    label_col: str,
    vec_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Distributed per-group centroid: mean vector per label, emitted as
    (label, dim, centroid, n_vectors) rows — the E-step/M-step primitive
    of k-means-style IVF training done as ONE posexplode + hash
    aggregate with map-side partials. No vector ever reaches the driver
    (contrast: collecting vectors to average them), so this is the shape
    that trains codebooks over a 100 TB embedding table.

    The mean accumulates in EXACT fixed-point (components quantized to
    1e-6, summed as integers, divided once) — a float sum's result
    depends on partial-aggregation order, so ``round(avg(double))``
    could round differently per engine/partitioning at a digit boundary
    (the functions.money rationale, applied to vectors).
    """
    pe_cols, agg_cols, out_cols = _label_centroid_cols(
        label_col, vec_col, round_to
    )
    pe = df.select(*pe_cols)
    return pe.groupBy("label", "dim").agg(*agg_cols).select(*out_cols)


@lru_cache(maxsize=16)
def _label_centroid_cols(
    label_col: str, vec_col: str, round_to: int
) -> tuple:
    """Cached E/M-step fragments — rebuilt per Lloyd iteration
    otherwise."""
    scale = 10 ** round_to
    q = F.round(F.col("x").cast("double") * scale, 0).cast("long")
    return (
        (
            F.col(label_col).alias("label"),
            F.posexplode(vec_col).alias("dim", "x"),
        ),
        (
            F.sum(q).alias("_s"),
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
        ),
        (
            F.col("label"),
            F.col("dim").cast("long").alias("dim"),
            F.round(
                F.col("_s").cast("double")
                / (F.lit(float(scale)) * F.col("n_vectors")),
                round_to,
            ).alias("centroid"),
            F.col("n_vectors"),
        ),
    )


def _nearest_centroid(vec_col: str, centroids: list[list[float]]) -> F.Column:
    """Argmax centroid by dot product — centroids are plan literals.

    Built as ONE sorted array expression: a chained when/otherwise argmax
    nests every previous comparison, re-inlining each dot product O(n²)
    times through CollapseProject; the array form evaluates each dot once.
    The whole thing is a single parsed SQL string: the Column form costs
    ~130 py4j round trips per centroid (literal arrays dominate), ~10k
    per IVF query — measured as the chattiest plan build in the
    inventory.
    """
    from typebus_spark.functions.vector import dot_lit_sql

    structs = ", ".join(
        f"named_struct('neg', -({dot_lit_sql(vec_col, cen)}), 'i', {i})"
        for i, cen in enumerate(centroids)
    )
    return F.expr(f"element_at(array_sort(array({structs})), 1).i")


def train_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_centroids: int,
    seed: int = 42,
    id_col: str | None = None,
    id_prefix: int = 256,
) -> list[list[float]]:
    """Cheap centroid pick (k-means init without iterations — adequate
    bucketing for IVF routing; swap for pyspark.ml KMeans on a real
    cluster). Two scale-safe modes, neither sorts the corpus:

    - With ``id_col``: FULLY DETERMINISTIC and SQL-expressible — restrict
      to ``id < id_prefix`` (predicate pushdown prunes the scan), order
      that tiny subset by ``md5(seed:id)`` (ids stringify identically on
      every engine), take n. A DuckDB oracle can reproduce the exact
      centroid set, making downstream IVF results oracle-checkable.
    - Without: seeded ``sample`` sized ~50× the centroid count over a
      metadata-only count — layout-dependent but shuffle-free, for
      corpora without a usable id column.
    """
    if id_col is not None:
        rows = (
            corpus.filter(F.col(id_col) < id_prefix)
            .select(F.col(vec_col).alias("v"))
            .orderBy(
                F.md5(
                    F.concat(
                        F.lit(f"{seed}:"), F.col(id_col).cast("string")
                    )
                )
            )
            .limit(n_centroids)
            .collect()
        )
        return [[float(x) for x in r["v"]] for r in rows]
    total = corpus.count()  # parquet count() is metadata-only
    fraction = min(1.0, (n_centroids * 50) / max(total, 1))
    rows = (
        corpus.select(F.col(vec_col).alias("v"))
        .sample(fraction=fraction, seed=seed)
        .orderBy(F.md5(F.concat(F.lit(str(seed)), F.col("v").cast("string"))))
        .limit(n_centroids)
        .collect()
    )
    if len(rows) < n_centroids:  # tiny corpus edge: sample came up short
        rows = (
            corpus.select(F.col(vec_col).alias("v"))
            .limit(n_centroids)
            .collect()
        )
    return [[float(x) for x in r["v"]] for r in rows]


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    centroids: list[list[float]],
    nprobe: int = 2,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "corpus_id",
    corpus_vec: str = "corpus_vec",
) -> DataFrame:
    """IVF-bucketed ANN: corpus rows partitioned by nearest centroid;
    each query probes its ``nprobe`` closest centroid buckets.

    The corpus never moves: the bucket id is a narrow projection, the
    join is (query × probed bucket) equi-join on bucket id — shuffle
    bounded by corpus size, not corpus², surviving a 100× scale-up.
    """
    from typebus_spark.session import ensure_parallelism

    c = ensure_parallelism(
        corpus.select(*_side_proj(corpus_id, corpus_vec, "c"))
    ).withColumn("bucket", _nearest_centroid("cv", centroids))

    from typebus_spark.functions.vector import dot_lit_sql

    # single parsed expression (see _nearest_centroid): nprobe-ranked
    # bucket list per query vector
    structs = ", ".join(
        f"named_struct('neg', -({dot_lit_sql('qv', cen)}), 'i', {i})"
        for i, cen in enumerate(centroids)
    )
    probes = F.expr(
        f"slice(transform(array_sort(array({structs})), x -> x.i), "
        f"1, {int(nprobe)})"
    )
    q = queries.select(*_side_proj(query_id, query_vec, "q")).withColumn(
        "bucket", F.explode(probes)
    )

    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", _cos_score_col())
    )
    return _topk_per_query(scored, k)


def train_centroids_lloyd(
    corpus: DataFrame,
    vec_col: str,
    n_centroids: int,
    iters: int = 2,
    seed: int = 42,
    id_col: str | None = None,
    id_prefix: int = 256,
    round_to: int = 6,
) -> list[list[float]]:
    """Deterministic DISTRIBUTED Lloyd's: prefix-pick init
    (:func:`train_centroids` id mode) + ``iters`` exact E/M rounds.

    E-step: scan-side literal-argmax assignment (``_nearest_centroid``,
    one parsed expression — no shuffle). M-step:
    :func:`label_centroids` — one posexplode + hash aggregate with
    map-side partials accumulating in EXACT fixed-point (1e-6 units),
    so the refined centroids are bit-identical on any engine and the
    whole trained codebook is SQL-reproducible: a DuckDB oracle can
    replay init + every iteration and land on the same doubles. Only
    k x d centroid component rows reach the driver per round; an empty
    bucket keeps its previous centroid (standard Lloyd's).

    This is real k-means training at 100 TB shape (full-corpus E-step
    per round, bounded driver state) with the property pyspark.ml's
    k-means|| cannot give: engine-portable determinism, hence a
    hash-checkable ANN pipeline end to end.
    """
    cens = train_centroids(
        corpus,
        vec_col,
        n_centroids,
        seed=seed,
        id_col=id_col,
        id_prefix=id_prefix,
    )
    dims = len(cens[0]) if cens else 0
    for _ in range(iters):
        assigned = corpus.select(
            F.col(vec_col).alias("_v"),
            _nearest_centroid(vec_col, cens).alias("bucket"),
        )
        rows = label_centroids(
            assigned, "bucket", "_v", round_to=round_to
        ).collect()
        comp: dict[int, dict[int, float]] = {}
        for r in rows:
            comp.setdefault(int(r["label"]), {})[int(r["dim"])] = float(
                r["centroid"]
            )
        cens = [
            [comp[c][d] for d in range(dims)] if c in comp else cens[c]
            for c in range(n_centroids)
        ]
    return cens


def train_centroids_kmeans(
    corpus: DataFrame,
    vec_col: str,
    n_centroids: int,
    seed: int = 42,
    max_iter: int = 4,
    max_train_rows: int = 5000,
) -> list[list[float]]:
    """Production IVF codebook: real Lloyd's iterations via pyspark.ml
    KMeans (k-means|| init) — distributed E/M steps, only the k
    centroid vectors ever reach the driver.

    The prefix-pick :func:`train_centroids` stays the oracle-checkable
    default (deterministic across engines); this trainer gives tighter
    buckets (higher recall at the same nprobe) when engine-portable
    determinism isn't required. Same contract: returns plain
    ``list[list[float]]`` ready for ``ivf_topk``/``semdedup``.
    """
    # max_iter=4: IVF codebooks don't need converged Lloyd's — bucket
    # recall plateaus after a few rounds (gated by tests/test_ann_recall:
    # kmeans must match-or-beat the prefix-pick codebook) while each
    # extra round costs a full corpus pass; FAISS trains IVF with ~10
    # iterations on a SUBSAMPLE for the same reason, and we cap rows
    # via max_train_rows below.
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # Codebooks train fine on a subsample (k << rows): cap the Lloyd's
    # input with a seeded sample so training cost stays bounded as the
    # corpus grows — the standard IVF practice (train on ~1e3-1e6
    # vectors, assign the full corpus).
    total = corpus.count()
    if max_train_rows and total > max_train_rows:
        corpus = corpus.sample(
            fraction=min(1.0, max_train_rows / total), seed=seed
        )
    feats = corpus.select(
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features")
    )
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, initMode="k-means||"
    ).fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def pq_codebooks(
    corpus: DataFrame,
    vec_col: str,
    m: int,
    k_per_sub: int,
    seed: int = 42,
    id_col: str | None = None,
    id_prefix: int = 256,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: ONE deterministic anchor pick
    (:func:`train_centroids` id mode — md5-ordered prefix rows, so a
    DuckDB oracle reproduces the exact set) sliced into ``m`` equal
    subspaces. ``books[j][c]`` is centroid ``c`` of subspace ``j``.

    One ``limit(k)`` collect total — driver traffic is k full vectors
    regardless of corpus size; swap the anchor pick for per-subspace
    KMeans (``train_centroids_kmeans`` on sliced columns) on a real
    cluster when engine-portable determinism isn't required.
    """
    anchors = train_centroids(
        corpus,
        vec_col,
        k_per_sub,
        seed=seed,
        id_col=id_col,
        id_prefix=id_prefix,
    )
    dim = len(anchors[0]) if anchors else 0
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        [a[j * dsub : (j + 1) * dsub] for a in anchors] for j in range(m)
    ]


def _pq_code_sql(
    vec_col: str, subbook: list[list[float]], j: int, dsub: int
) -> str:
    """SQL text of subspace ``j``'s code: argmin-by-L2² over the literal
    sub-centroids (ties → lowest index via first-occurrence
    ``array_position``). The distances are ONE ``transform`` loop over a
    literal array-of-arrays, not k inlined folds — k× smaller generated
    code, which is what dominates this operator's fixed cost (janino
    compile of the projection), with identical ordered-fold arithmetic."""
    from typebus_spark.functions.vector import lit_vec_sql

    sl = f"slice(`{vec_col}`, {j * dsub + 1}, {dsub})"
    book = "array(" + ", ".join(lit_vec_sql(c) for c in subbook) + ")"
    dists = (
        f"transform({book}, b -> aggregate(zip_with({sl}, b, "
        "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "0.0D, (acc, v) -> acc + v))"
    )
    return (
        f"CAST(array_position({dists}, array_min({dists})) AS INT) - 1"
    )


def _fold_normsq(vals: list[float]) -> float:
    """Left-to-right double fold of Σx² — the exact IEEE op sequence of
    the engines' ordered aggregate folds, so the value can be embedded
    as the SAME literal in both the Spark plan and the DuckDB oracle
    (no cross-engine arithmetic at all)."""
    acc = 0.0
    for x in vals:
        acc += float(x) * float(x)
    return acc


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    books: list[list[list[float]]],
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "corpus_id",
    corpus_vec: str = "corpus_vec",
) -> DataFrame:
    """Product-quantization ANN (FAISS ``IndexPQ`` shape): corpus vectors
    are encoded as ``m`` small codes (argmin sub-centroid per subspace),
    queries score against the RECONSTRUCTED vector — mathematically the
    asymmetric-distance computation (ADC) with the lookup tables
    inlined, expressed so every step is a Catalyst scan expression.

    100 TB shape: the codebooks are plan literals (broadcast with the
    plan, k·d doubles); encode is a pure scan projection; what a real
    deployment persists/scans is the (id, m·log₂k bits) code table —
    16-64× smaller than raw vectors — and reconstruction happens at
    scan time from the broadcast codebook, which is exactly what this
    plan does. The reconstructed norm is a literal lookup (Σ over
    subspaces of the sub-centroid's precomputed ‖c‖²), not a re-fold.

    Fully oracle-checkable: anchors are md5-prefix-deterministic, codes
    are ordered-fold argmins, and the per-centroid ‖c‖² literals are
    embedded identically in both engines.
    """
    from typebus_spark.functions.vector import lit_vec_sql
    from typebus_spark.session import ensure_parallelism

    m = len(books)
    dsub = len(books[0][0])
    code_sqls = [
        _pq_code_sql(corpus_vec, books[j], j, dsub) for j in range(m)
    ]
    recon = "concat(" + ", ".join(
        f"element_at(array({', '.join(lit_vec_sql(c) for c in books[j])}), "
        f"{code_sqls[j]} + 1)"
        for j in range(m)
    ) + ")"
    normsq = [[_fold_normsq(c) for c in book] for book in books]
    cn = "sqrt(" + " + ".join(
        f"element_at({lit_vec_sql(normsq[j])}, {code_sqls[j]} + 1)"
        for j in range(m)
    ) + ")"
    c = ensure_parallelism(corpus).selectExpr(
        f"`{corpus_id}` AS cid", f"{recon} AS cv", f"{cn} AS cn"
    )
    q = queries.select(*_side_proj(query_id, query_vec, "q"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", _cos_score_col())
    )
    return _topk_per_query(scored, k)


def pq_topk_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    books: list[list[list[float]]],
    shortlist: int,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "corpus_id",
    corpus_vec: str = "corpus_vec",
) -> DataFrame:
    """Two-stage PQ ANN (the production FAISS pattern): ADC over the
    compressed codes produces a ``shortlist`` of candidates per query,
    then ONLY those candidates are re-scored against their raw vectors
    for the exact top-``k``.

    100 TB shape: stage 1 touches the code table (m·log₂k bits/vector)
    and emits |Q|·shortlist ids; stage 2 is a broadcast semi-join that
    fetches raw vectors for the shortlist alone — the full-precision
    corpus is never scored, only probed. Recall equals the probability
    the true neighbors survive the ADC shortlist (gated in
    tests/test_ann_recall.py); rank/cos of survivors are exact.
    """
    sl = pq_topk(
        queries, corpus, shortlist, books,
        query_id=query_id, query_vec=query_vec,
        corpus_id=corpus_id, corpus_vec=corpus_vec,
    ).select(
        F.col("query_id").alias("qid"),
        F.col("neighbor_id").alias("cid"),
    )
    from typebus_spark.session import ensure_parallelism

    c = ensure_parallelism(
        corpus.select(*_side_proj(corpus_id, corpus_vec, "c"))
    )
    q = queries.select(*_side_proj(query_id, query_vec, "q"))
    scored = (
        c.join(F.broadcast(sl), "cid")
        .join(F.broadcast(q), "qid")
        .select("qid", "cid", _cos_score_col())
    )
    return _topk_per_query(scored, k)
