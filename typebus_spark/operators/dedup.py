"""Deduplication operators for large-scale training-data pipelines.

The reference has no dedup surface (SURVEY.md §2.2); these are the
north-star extensions (BASELINE.json), designed partition-parallel for
100 TB:

- **exact_dedup**: hash-groupBy on a normalized content hash. One shuffle
  on the hash key; map-side partial aggregation; no driver collects.
- **jaccard_pairs**: EXACT n-gram-Jaccard near-dup pairs via an inverted
  shingle index (explode → self-join on shingle → count shared). With
  word-n-gram shingles of n≥5 the index is highly selective, and the
  optional ``max_shingle_freq`` cap drops degenerate hub shingles (the
  standard scalable trick — documents sharing ONLY ultra-common shingles
  can't be near-dups at any meaningful threshold anyway).
- **minhash_lsh_pairs**: MinHash signatures + banded LSH → candidate
  pairs → exact-Jaccard verification. Sub-quadratic; the scale path.
  Hashing is md5-based so signatures are engine-portable (oracle-able).
- **simhash_signatures / simhash_pairs**: 64-bit SimHash via explode +
  single groupBy (64 conditional sums — one aggregation pass), banded by
  16-bit chunks for sub-quadratic candidate generation.
- **embedding_dup_pairs**: cosine-similarity near-dups over an embedding
  column; bucketed by LSH hyperplane signs when ``planes`` given, else
  exact via block-nested join (small-side broadcast).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark import StorageLevel
from pyspark.sql import DataFrame

from typebus_spark.functions.text import (
    norm_text,
    shingles,
    tokens,
)
from typebus_spark.functions.vector import cosine, hyperplane_signs


from functools import lru_cache


@lru_cache(maxsize=64)
def _exact_dedup_cols(id_col: str, text_col: str, normalize: bool) -> tuple:
    content = norm_text(text_col) if normalize else F.col(text_col)
    return (
        (F.col(id_col), F.md5(content).alias("content_hash")),
        (
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        ),
    )


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str, normalize: bool = True
) -> DataFrame:
    """One row per distinct content: canonical (min) id, copy count, and
    the content hash. ``SELECT hash, min(id), count(*) GROUP BY hash``."""
    sel, agg = _exact_dedup_cols(id_col, text_col, normalize)
    return df.select(*sel).groupBy("content_hash").agg(*agg)


def shingle_key(col: F.Column | str) -> F.Column:
    """Portable 60-bit integer key of a shingle string (the repo's
    md5-prefix scheme — bit-identical in DuckDB as
    ``('0x' || substr(md5(s), 1, 15))::BIGINT``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def distinct_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, shingle-key) distinct pairs — the inverted-index rows. The
    shingle is hashed to its 60-bit key AT THE SCAN: every downstream
    distinct / self-join / frequency-cap shuffles 8-byte ints instead of
    ~50-byte n-gram strings (measured ~5x less shuffle volume, the
    dominant cost of the exact-Jaccard family). Collisions are one-in-2^60
    and, because the oracle uses the identical key, engine-symmetric.
    The input is spread across cores first (hash/explode are
    compute-bound and a small file arrives as one partition)."""
    from typebus_spark.session import ensure_parallelism

    from typebus_spark.functions.text import exploded_shingle_rows

    return (
        exploded_shingle_rows(df, id_col, text_col, n)
        .select("_id", _shingle_key_col())
        .distinct()
    )


@lru_cache(maxsize=4)
def _shingle_key_col():
    """Cached hashed-key projection (the md5/conv fragment is ~10 py4j
    round trips and identical across every shingle consumer)."""
    return shingle_key("_s").alias("shingle")


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 8,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
    metric: str = "jaccard",
) -> DataFrame:
    """EXACT shingle-set similarity ≥ threshold pairs (a < b).

    ``metric="jaccard"`` scores |A∩B|/|A∪B| (near-duplicate detection);
    ``metric="containment"`` scores |A∩B|/min(|A|,|B|) — whether the
    smaller document is essentially a SUBSET of the larger (quote /
    excerpt / wrapper-page detection, which Jaccard misses when sizes
    differ a lot). Same index, same plan, different final ratio.

    Any pair with similarity > 0 shares ≥1 shingle, so the
    inverted-index join loses nothing. Plan: explode (narrow) → shuffle
    on shingle → pair-count agg → join per-doc sizes (broadcast-able)
    → filter.
    """
    from pyspark import StorageLevel

    # The shingle index feeds THREE consumers (per-doc sizes + both pair
    # sides); persist it (spills to disk at scale) or the upstream
    # explode + distinct shuffle — and whatever pipeline produced ``df``
    # — re-executes once per consumer.
    sh = distinct_shingles(df, id_col, text_col, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if metric not in ("jaccard", "containment"):
        raise ValueError("metric must be 'jaccard' or 'containment'")
    (
        n_sh_agg,
        a_proj,
        b_proj,
        ab_lt,
        shared_agg,
        sa_proj,
        sb_proj,
    ) = _pair_index_cols()
    sizes = sh.groupBy("_id").agg(n_sh_agg)
    if max_shingle_freq is not None:
        freq_ok = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_freq)
            .select("shingle")
        )
        sh = sh.join(freq_ok, "shingle")
    a = sh.select(*a_proj)
    b = sh.select(*b_proj)
    shared = (
        a.join(b, "shingle").filter(ab_lt).groupBy("a", "b").agg(shared_agg)
    )
    sa = sizes.select(*sa_proj)
    sb = sizes.select(*sb_proj)
    score, rounded = _pair_score_cols(metric)
    # Filter on the RAW ratio (a single IEEE division — bit-identical
    # across engines) and round only the emitted column: filtering the
    # rounded value would keep pairs in [threshold-5e-7, threshold)
    # that a raw-ratio oracle drops.
    return (
        shared.join(sa, "a")
        .join(sb, "b")
        .filter(score >= threshold)
        .withColumn(metric, rounded)
        .select("a", "b", metric)
    )


@lru_cache(maxsize=1)
def _pair_index_cols() -> tuple:
    """Static fragments of the inverted-index pair plan."""
    return (
        F.count(F.lit(1)).alias("n_sh"),
        (F.col("_id").alias("a"), F.col("shingle")),
        (F.col("_id").alias("b"), F.col("shingle")),
        F.col("a") < F.col("b"),
        F.count(F.lit(1)).alias("shared"),
        (F.col("_id").alias("a"), F.col("n_sh").alias("na")),
        (F.col("_id").alias("b"), F.col("n_sh").alias("nb")),
    )


@lru_cache(maxsize=4)
def _pair_score_cols(metric: str) -> tuple:
    if metric == "containment":
        score = F.col("shared") / F.least(F.col("na"), F.col("nb"))
    else:
        score = F.col("shared") / (
            F.col("na") + F.col("nb") - F.col("shared")
        )
    return score, F.round(score, 6)


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 8,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Subset/excerpt detection: pairs where the smaller document's
    shingle set is ≥ ``threshold`` contained in the larger's (see
    :func:`jaccard_pairs` ``metric="containment"``)."""
    return jaccard_pairs(
        df,
        id_col,
        text_col,
        shingle_n=shingle_n,
        threshold=threshold,
        max_shingle_freq=max_shingle_freq,
        metric="containment",
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 8,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH candidates verified by exact Jaccard — sub-quadratic
    near-dup detection (the 100 TB path: cost scales with band-bucket
    collisions, not document pairs).

    Returns (a, b, jaccard) with jaccard ≥ threshold among candidates.
    Recall is probabilistic in the LSH stage (1-(1-J^r)^b).
    """
    ex = _exploded_shingles(df, id_col, text_col, shingle_n)
    with_bands = _minhash_band_rows(ex, num_hashes, bands)

    a = with_bands.select(F.col("_id").alias("a"), "band", "h")
    b = with_bands.select(F.col("_id").alias("b"), "band", "h")
    candidates = (
        a.join(b, ["band", "h"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )

    # exact verification of candidates only; the distinct index derives
    # from the persisted exploded frame (one shuffle, no re-scan) and is
    # itself reused by sizes + both join sides → persist too. Hashed to
    # the 60-bit shingle key first: the verify joins shuffle 8-byte
    # ints, not n-gram strings (same trick as distinct_shingles; the
    # oracle hashes identically, so still value-checked end to end).
    sh_df = (
        ex.select("_id", shingle_key("shingle").alias("shingle"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return _jaccard_verify(candidates, sh_df, sh_df, threshold)


def _exploded_shingles(df, id_col: str, text_col: str, shingle_n: int):
    """ONE exploded shingle frame feeds BOTH minhash stages — raw
    (duplicates kept) for the signature min-aggregates, ``.distinct()``
    of the SAME frame for the verify index. Persisted (spills to disk
    at scale) so the verify stage never re-scans + re-explodes the
    corpus; that second full pass was most of the operator's cost.
    No distinct() here: min() over duplicate shingles is identical and
    dropping it saves a full shuffle. Lambda-free stream (r10):
    functions.text.exploded_shingle_rows."""
    from typebus_spark.functions.text import exploded_shingle_rows

    return (
        exploded_shingle_rows(df, id_col, text_col, shingle_n)
        .withColumnRenamed("_s", "shingle")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def _minhash_band_rows(ex, num_hashes: int, bands: int):
    """Exploded shingles → the (doc, band, hash) LSH index rows.

    Signature via explode + min-aggregates (ONE pass over shingles).
    Building it as a single array expression looks natural but Spark's
    CollapseProject inlines the whole shingle pipeline into every
    element_at of every band — O(num_hashes²) recomputation per row
    (measured 159s vs 2s on 500 docs). The explode form is also the
    shape that scales: shingles shuffle once, partial min() map-side.
    Parsed-expression forms (identical SQL semantics, ~6x fewer py4j
    round trips than per-node Column builders). Persisted: the
    candidate join reads it per side."""
    rows_per_band = num_hashes // bands
    sig = ex.groupBy("_id").agg(
        *[
            F.expr(f"min(md5(concat('{k}:', shingle)))").alias(f"m{k}")
            for k in range(num_hashes)
        ]
    )
    bands_sql = ", ".join(
        "named_struct('band', {b}, 'h', md5(concat_ws('|', {ms})))".format(
            b=b,
            ms=", ".join(
                f"m{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    band_structs = F.expr(f"array({bands_sql})")
    return (
        sig.select("_id", F.explode(band_structs).alias("bh"))
        .select("_id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def _jaccard_verify(candidates, sh_a, sh_b, threshold: float):
    """Exact set-Jaccard over candidate (a, b) pairs given the hashed
    distinct-shingle frames for each side (may be the same frame)."""
    sizes_a = sh_a.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sizes_b = sh_b.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    ash = sh_a.select(F.col("_id").alias("a"), F.col("shingle").alias("s"))
    bsh = sh_b.select(F.col("_id").alias("b"), F.col("shingle").alias("s"))
    shared = (
        candidates.join(ash, "a")
        .join(bsh, ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes_a.select(F.col("_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes_b.select(F.col("_id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        shared.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def build_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 8,
    num_hashes: int = 32,
    bands: int = 8,
    materialize_dir: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The two STORED-TABLE frames a production ingest pipeline keeps
    per corpus (appended per batch): the LSH band index ``(_id, band,
    h)`` and the hashed distinct-shingle index ``(_id, shingle)`` —
    exactly what ``minhash_lsh_incremental`` derives in-plan when no
    pre-built index is passed. Build once per corpus snapshot, feed to
    the ingest queries via ``history_index=``; cost per ingest batch
    then scales with the delta, never the corpus.

    With ``materialize_dir`` the frames are written there as parquet
    (the stored-table form), the build-side caches are released, and
    the returned frames READ the store (explicit schema — steady-state
    plan construction is job-free)."""
    ex = _exploded_shingles(df, id_col, text_col, shingle_n)
    band_rows = _minhash_band_rows(ex, num_hashes, bands)
    sh = ex.select("_id", shingle_key("shingle").alias("shingle")).distinct()
    if materialize_dir is None:
        return band_rows, sh
    import os

    spark = df.sparkSession
    bp = os.path.join(materialize_dir, "bands")
    sp = os.path.join(materialize_dir, "shingles")
    band_rows.write.mode("overwrite").parquet(bp)
    sh.write.mode("overwrite").parquet(sp)
    band_rows.unpersist()
    ex.unpersist()
    return (
        spark.read.schema(band_rows.schema).parquet(bp),
        spark.read.schema(sh.schema).parquet(sp),
    )


def minhash_lsh_incremental(
    history: DataFrame,
    delta: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 8,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    history_index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """NEAR-dup detection for INGEST — the fuzzy twin of
    ``incremental_dedup``: find each NEW document's near-duplicates in
    the existing corpus (and among the new batch itself) without ever
    generating history×history pairs.

    Returns ``(a, b, jaccard, dup_in)`` where ``a`` is always a delta
    doc, ``dup_in`` marks whether ``b`` came from 'history' or 'delta'
    (delta-delta pairs appear once, a < b).

    Scale shape — cost ∝ |delta| + collisions involving delta: the
    delta band rows join the union index on (band, h), so history
    contributes only colliding buckets; the exact-Jaccard verify
    restricts the history shingle index to candidate partners with a
    semi join BEFORE exploding sizes (never the whole history). In
    production the history band index + hashed shingle index are
    PRE-BUILT stored tables appended per ingest batch — pass them as
    ``history_index=(band_rows, hashed_shingles)`` (built by
    ``build_minhash_index``) and the history corpus is never shingled
    here at all (r9-verdict item 3: the two ingest queries re-derived
    the whole history index in-plan every run). With no index passed,
    the frames derive in-plan so the semantics stay oracle-checkable
    end to end (the live-derivation check).

    Precondition: ids are unique per frame and disjoint ACROSS frames
    (a re-ingested doc must be removed from history first). Enforced
    here — history rows whose id appears in delta are anti-joined away
    before shingling (or, with ``history_index``, the stale rows are
    anti-joined out of BOTH stored index frames — the production
    "delete the doc's index rows before re-adding it" step), so an
    updated doc compares against the REST of history, never its own
    stale copy (which would double-count its shingles in the verify
    union and emit a same-id self-pair).
    """
    delta_ids = delta.select(F.col(id_col)).distinct()
    ex_d = _exploded_shingles(delta, id_col, text_col, shingle_n)
    bd = _minhash_band_rows(ex_d, num_hashes, bands)
    if history_index is None:
        history = history.join(delta_ids, id_col, "left_anti")
        ex_h = _exploded_shingles(history, id_col, text_col, shingle_n)
        bh = _minhash_band_rows(ex_h, num_hashes, bands)
        sh_h_all = ex_h.select(
            "_id", shingle_key("shingle").alias("shingle")
        ).distinct()
    else:
        bh, sh_h_all = history_index
        stale = delta_ids.select(F.col(id_col).alias("_id"))
        bh = bh.join(stale, "_id", "left_anti")
        sh_h_all = sh_h_all.join(stale, "_id", "left_anti")

    left = bd.select(F.col("_id").alias("a"), "band", "h")
    right = bd.select(
        F.col("_id").alias("b"), "band", "h", F.lit(True).alias("_bd")
    ).unionByName(
        bh.select(
            F.col("_id").alias("b"), "band", "h", F.lit(False).alias("_bd")
        )
    )
    candidates = (
        left.join(right, ["band", "h"])
        # delta-delta pairs once (a < b); delta-history pairs in the
        # (delta, history) orientation regardless of id order (a != b
        # there is guaranteed by the disjointness anti-join, guarded
        # anyway so a caller bypassing the precondition can't self-pair)
        .filter(
            F.when(F.col("_bd"), F.col("a") < F.col("b")).otherwise(
                F.col("a") != F.col("b")
            )
        )
        .select("a", "b", "_bd")
        .distinct()
    )
    sh_d = (
        ex_d.select("_id", shingle_key("shingle").alias("shingle"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # only history docs that actually collided enter the verify index
    sh_h = sh_h_all.join(
        candidates.filter(~F.col("_bd")).select(F.col("b").alias("_id")).distinct(),
        "_id",
        "left_semi",
    )
    verified = _jaccard_verify(
        candidates.select("a", "b"), sh_d, sh_d.unionByName(sh_h), threshold
    )
    membership = candidates.select("a", "b", "_bd").distinct()
    return verified.join(membership, ["a", "b"]).select(
        "a",
        "b",
        "jaccard",
        F.when(F.col("_bd"), F.lit("delta")).otherwise(F.lit("history")).alias(
            "dup_in"
        ),
    )


# SimHash is 60-bit: the first 15 hex chars of md5(token) parse into a
# signed BIGINT identically on both engines (Spark conv(…,16,10) ==
# DuckDB ('0x'||…)::BIGINT, verified bit-identical), so every stage —
# per-token hash, bit sums, packed signature, banding, hamming — runs as
# fast integer ops AND verifies against a DuckDB oracle end-to-end.
# (xxhash64, the usual pick, is engine-local; 64-bit md5 prefixes would
# overflow the signed range.)
SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash per document: explode distinct tokens → one groupBy
    with 60 plain bit sums + a count (single aggregation pass, fully
    map-side partial), sign per bit → signature packed into a BIGINT.

    The classic ±1 sign sum over bit i is ``2*popcount_i - n``, so its
    sign test ``>= 0`` is ``2*cnt_i >= n`` — plain unconditional
    ``sum((h>>i)&1)`` per bit beats 60 branchy CASE aggregates in
    codegen, identical semantics (and identical to the DuckDB oracle's
    CASE formulation)."""
    from typebus_spark.session import ensure_parallelism

    tok = ensure_parallelism(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("tok"),
    ).withColumn(
        "h",
        F.conv(F.substring(F.md5("tok"), 1, SIMHASH_BITS // 4), 16, 10).cast(
            "long"
        ),
    )

    # ONE parsed aggregate expression: the Column form of 60 aggs + 60
    # when-branches was ~9k py4j round trips of plan construction (the
    # worst in the inventory); a single named_struct aggregate + a
    # single packing expression is ~6.
    agg_sql = "named_struct('n', count(1), " + ", ".join(
        f"'c{i}', sum(shiftright(h, {i}) & 1)"
        for i in range(SIMHASH_BITS)
    ) + ")"
    sums = tok.groupBy("_id").agg(F.expr(agg_sql).alias("s"))
    # disjoint bits → plain sum packs the signature (no overflow: < 2^60)
    sig_sql = " + ".join(
        f"(CASE WHEN s.c{i} * 2 >= s.n THEN {1 << i}L ELSE 0L END)"
        for i in range(SIMHASH_BITS)
    )
    return sums.select(
        F.col("_id").alias(id_col),
        F.expr(f"CAST({sig_sql} AS BIGINT)").alias("simhash"),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ max_hamming.

    Banded by four 15-bit chunks (pigeonhole: distance ≤ 3 ⇒ at least
    one chunk equal) → sub-quadratic candidate join, exact hamming
    verify (bit_count of XOR) on the candidate set only."""
    from typebus_spark.functions.text import hamming64

    from pyspark import StorageLevel

    span = SIMHASH_BITS // SIMHASH_CHUNKS
    mask = (1 << span) - 1
    # One signature row per document — tiny relative to the corpus. The
    # banding self-join consumes it TWICE (both pair sides); without the
    # persist the whole explode+60-bit-sum aggregation runs twice
    # (measured ~2x the operator's wall at sf0.1).
    sig = simhash_signatures(df, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    chunks = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", span * c)
                        .bitwiseAND(F.lit(mask))
                        .alias("v"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("cv"),
    ).select(id_col, "simhash", "cv.chunk", "cv.v")
    a = chunks.select(
        F.col(id_col).alias("a"), F.col("simhash").alias("sig_a"), "chunk", "v"
    )
    b = chunks.select(
        F.col(id_col).alias("b"), F.col("simhash").alias("sig_b"), "chunk", "v"
    )
    cand = (
        a.join(b, ["chunk", "v"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .distinct()
    )
    return cand.select(
        "a", "b", hamming64("sig_a", "sig_b").cast("long").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    planes: list[list[float]] | None = None,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold.

    With ``planes``: LSH-bucketed (hyperplane sign signature equality) —
    sub-quadratic, probabilistic recall; this is the only shape that
    survives a 100x corpus. Without planes the plan is an exact
    all-pairs crossJoin — corpus² at scale — so the bare call RAISES
    unless ``allow_quadratic=True`` is passed explicitly (r10 verdict:
    the default-None footgun invited a quadratic plan from a future
    caller). For scale paths that can't tolerate LSH recall loss, use
    ``semdedup`` (cluster-blocked) or a label/metadata-blocked join
    (queries/dedup.py q_dedup_embedding) instead.
    """
    if planes is None and not allow_quadratic:
        raise ValueError(
            "embedding_dup_pairs without `planes` builds an exact "
            "all-pairs crossJoin (corpus^2). Pass `planes` (hyperplane "
            "LSH buckets), or block on a metadata key, or opt in "
            "explicitly with allow_quadratic=True for a small "
            "baseline/oracle corpus."
        )
    from typebus_spark.functions.vector import dot, norm
    from typebus_spark.session import ensure_parallelism

    # norm per vector computed once pre-join (materializes in the
    # exchange) — the pair stage folds only the dot product
    base = ensure_parallelism(
        df.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            norm(vec_col).alias("_n"),
        )
    )
    if planes is not None:
        bucketed = base.withColumn("bucket", hyperplane_signs("_v", planes))
        a = bucketed.select(
            F.col("_id").alias("a"), F.col("_v").alias("va"),
            F.col("_n").alias("na"), "bucket",
        )
        b = bucketed.select(
            F.col("_id").alias("b"), F.col("_v").alias("vb"),
            F.col("_n").alias("nb"), "bucket",
        )
        pairs = a.join(b, "bucket").filter(F.col("a") < F.col("b"))
    else:
        a = base.select(
            F.col("_id").alias("a"), F.col("_v").alias("va"),
            F.col("_n").alias("na"),
        )
        b = base.select(
            F.col("_id").alias("b"), F.col("_v").alias("vb"),
            F.col("_n").alias("nb"),
        )
        pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    cos = dot("va", "vb") / (F.col("na") * F.col("nb"))
    return (
        pairs.filter(cos >= threshold)
        .select("a", "b", F.round(cos, 6).alias("cos"))
    )


def semdedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float,
    round_to: int = 6,
) -> DataFrame:
    """SemDeDup (semantic dedup, Abbas et al. 2023, arXiv:2303.09540):
    cluster embeddings to a small codebook, then drop near-duplicates
    WITHIN each cluster — pair cost is per-bucket, never corpus².

    Greedy keep-lowest-id: for every intra-bucket pair with cosine ≥
    ``threshold`` the higher id is dropped. Returns per-bucket
    ``(bucket, n_vecs, n_dropped, n_kept)``.

    Scale shape: centroid assignment is a scan-side literal-argmax
    expression (no shuffle, no UDF — ``_nearest_centroid``), the only
    shuffles are the bucket-key self-join and one aggregate; the
    bucketed frame is persisted once for its three consumers. With a
    deterministic centroid pick (train_centroids id-prefix mode) the
    whole pipeline is engine-reproducible and oracle-checkable.
    """
    from pyspark import StorageLevel

    from typebus_spark.operators.similarity import _nearest_centroid
    from typebus_spark.functions.vector import dot, norm
    from typebus_spark.session import ensure_parallelism

    b = (
        ensure_parallelism(df.select(F.col(id_col), F.col(vec_col)))
        .select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            norm(vec_col).alias("_nn"),
            _nearest_centroid(vec_col, centroids).alias("bucket"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    x = b.select(
        "bucket",
        F.col("_id").alias("a"),
        F.col("_v").alias("_va"),
        F.col("_nn").alias("_na"),
    )
    y = b.select(
        "bucket",
        F.col("_id").alias("b"),
        F.col("_v").alias("_vb"),
        F.col("_nn").alias("_nb"),
    )
    drops = (
        x.join(y, ["bucket"])
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "cos",
            F.round(dot("_va", "_vb") / (F.col("_na") * F.col("_nb")), round_to),
        )
        .filter(F.col("cos") >= threshold)
        .select("bucket", "b")
        .distinct()
    )
    d = drops.select(
        F.col("bucket").alias("_dbucket"), F.col("b").alias("_dropped_id")
    )
    return (
        b.join(
            d,
            (b["bucket"] == d["_dbucket"])
            & (b["_id"] == d["_dropped_id"]),
            "left_outer",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.col("_dropped_id").isNotNull().cast("int"))
            .cast("long")
            .alias("n_dropped"),
            F.sum(F.col("_dropped_id").isNull().cast("int"))
            .cast("long")
            .alias("n_kept"),
        )
    )


def dedup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Span-level dedup with text RECONSTRUCTION (the C4-style
    'remove duplicated spans' cleanup, complementing whole-doc dedup):
    documents are split into fixed non-overlapping ``chunk_tokens``-token
    chunks; any chunk appearing in ≥ ``min_docs`` distinct documents is
    cut from every document, and the surviving chunks re-join in
    position order.

    Returns ``(id, n_chunks, n_removed, cleaned_text)``.

    Scale shape: explode → one shuffle on the chunk key (map-side
    partial distinct-count) → broadcast-able dup set joins back →
    per-document regroup. State per reducer is bounded by chunk
    frequency, and reconstruction shuffles each document's chunk list
    once — no driver collects, no UDFs.
    """
    from typebus_spark.session import ensure_parallelism

    # chunk rows feed BOTH the dup aggregate and the reconstruction
    # join — persist so the tokenize+slice explode runs once.
    # Lambda-free stream (r10): start-position explode + slice
    # projection (whole-stage codegen; the transform-lambda array form
    # runs interpreted); pos re-derives posexplode's 0-based index.
    ex = (
        ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col).alias("_id"), tokens(text_col).alias("_t"))
        .select(
            "_id",
            "_t",
            F.expr(
                f"explode(sequence(1, size(_t), {chunk_tokens}))"
            ).alias("_i"),
        )
        .select(
            "_id",
            F.expr(
                f"CAST((_i - 1) DIV {chunk_tokens} AS INT)"
            ).alias("pos"),
            F.expr(
                f"array_join(slice(_t, _i, {chunk_tokens}), ' ')"
            ).alias("chunk"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dup = (
        ex.groupBy("chunk")
        .agg(F.countDistinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("chunk", F.lit(1).alias("_dup"))
    )
    joined = ex.join(dup, "chunk", "left_outer").select(
        "_id", "pos", "chunk", F.col("_dup").isNull().alias("kept")
    )
    cleaned = F.array_join(
        F.transform(
            F.filter(
                F.array_sort(F.collect_list(F.struct("pos", "chunk", "kept"))),
                lambda x: x["kept"],
            ),
            lambda x: x["chunk"],
        ),
        " ",
    )
    return (
        joined.groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum((~F.col("kept")).cast("int")).cast("long").alias(
                "n_removed"
            ),
            cleaned.alias("cleaned_text"),
        )
        .withColumnRenamed("_id", id_col)
    )


def cdc_chunk_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_chunk_tokens: int = 16,
    gram: int = 3,
) -> DataFrame:
    """Content-defined chunking over tokens (Rabin-Karp-style): token
    ``i`` CUTS (ends its chunk) iff the 60-bit md5-prefix key of the
    ``gram``-token window ending at ``i`` is ≡ 0 mod
    ``target_chunk_tokens`` — a boundary decided purely by local
    content, so a span duplicated at ANY offset produces identical
    interior chunks (only the spill-over chunks at the span edges mix
    with surrounding text). Expected chunk length =
    ``target_chunk_tokens``.

    Returns ``(_id, chunk_id, chunk, n_toks)`` — chunk_id is the
    0-based position-order index within the document.

    Scale shape: the grams/cut flags are scan-side array expressions;
    the only non-scan work is one per-DOCUMENT window (prefix sum of
    cut flags → chunk ids, state bounded by doc length) and the
    chunk regroup — both shuffle on `_id`, reusable across the two
    stages.
    """
    from pyspark.sql import Window

    from typebus_spark.session import ensure_parallelism

    # Lambda-free per-token stream (r10): position explode +
    # element_at/slice projections (codegen) instead of posexplode over
    # a transform-built arrays_zip (interpreted lambda per token).
    ex = (
        ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col).alias("_id"), tokens(text_col).alias("_t"))
        .select(
            "_id",
            "_t",
            F.expr("explode(sequence(1, size(_t)))").alias("_i"),
        )
        .select(
            "_id",
            (F.col("_i") - 1).alias("pos"),
            F.expr("element_at(_t, _i)").alias("tok"),
            (
                F.pmod(
                    shingle_key(
                        F.expr(
                            f"concat_ws(' ', slice(_t,"
                            f" greatest(_i - {gram - 1}, 1),"
                            f" least(_i, {gram})))"
                        )
                    ),
                    F.lit(target_chunk_tokens),
                )
                == 0
            ).cast("int").alias("cut"),
        )
    )
    w = (
        Window.partitionBy("_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_chunk = ex.withColumn(
        "chunk_id", F.coalesce(F.sum("cut").over(w), F.lit(0))
    )
    return (
        with_chunk.groupBy("_id", "chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("chunk"),
            F.count(F.lit(1)).alias("n_toks"),
        )
    )


def dedup_substrings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_chunk_tokens: int = 16,
    min_docs: int = 2,
    min_chunk_tokens: int = 4,
    keep_first: bool = False,
) -> DataFrame:
    """Exact-substring dedup at ARBITRARY offsets (the Lee et al.
    'Deduplicating Training Data Makes Language Models Better'
    ExactSubstr case, re-expressed for Spark): content-defined chunk
    boundaries (``cdc_chunk_rows``) align duplicated spans regardless
    of where they start, so repeated substrings that slip through
    ``dedup_spans``' fixed-chunk grid are still caught; any chunk of ≥
    ``min_chunk_tokens`` tokens appearing in ≥ ``min_docs`` distinct
    documents is cut from every document and the survivors re-join in
    position order.

    ``min_chunk_tokens`` guards against cutting spuriously-common tiny
    chunks (a 1-token chunk is just a common word); shorter chunks are
    kept unconditionally — mirroring ExactSubstr's minimum match
    length (50 tokens there; configurable here).

    ``keep_first=True`` keeps each duplicated chunk in its CANONICAL
    document (min id) and cuts it everywhere else — the
    remove-all-but-one policy; the default cuts every copy (the
    C4-style boilerplate-removal policy).

    Returns ``(id, n_chunks, n_removed, cleaned_text)`` — same contract
    as ``dedup_spans``.

    Scale shape: one per-doc window + chunk-key shuffle (map-side
    partial distinct-count) + per-doc regroup; the dup set is tiny
    (duplicated spans only) and broadcast-joins back.
    """
    # the chunk frame (explode + per-doc window) feeds BOTH the dup
    # aggregate and the reconstruction join — persist so it computes
    # once, not per consumer (no exchange reuse across the consumers)
    chunks = cdc_chunk_rows(
        df, id_col, text_col, target_chunk_tokens
    ).persist(StorageLevel.MEMORY_AND_DISK)
    dup = (
        chunks.filter(F.col("n_toks") >= min_chunk_tokens)
        .groupBy("chunk")
        .agg(
            F.countDistinct("_id").alias("_nd"),
            F.min("_id").alias("_keeper"),
        )
        .filter(F.col("_nd") >= min_docs)
        .select("chunk", "_keeper")
    )
    kept = F.col("_keeper").isNull()
    if keep_first:
        kept = kept | (F.col("_id") == F.col("_keeper"))
    joined = chunks.join(dup, "chunk", "left_outer").select(
        "_id", "chunk_id", "chunk", kept.alias("kept")
    )
    cleaned = F.array_join(
        F.transform(
            F.filter(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "chunk", "kept"))
                ),
                lambda x: x["kept"],
            ),
            lambda x: x["chunk"],
        ),
        " ",
    )
    return (
        joined.groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum((~F.col("kept")).cast("int")).cast("long").alias(
                "n_removed"
            ),
            cleaned.alias("cleaned_text"),
        )
        .withColumnRenamed("_id", id_col)
    )


def build_exact_index(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 8,
    materialize_dir: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The STORED-TABLE frames ``incremental_dedup`` probes per ingest
    batch: the distinct content-hash set ``(_h)``, the per-doc
    distinct-shingle index ``(_id, shingle)``, and the per-doc
    distinct-shingle COUNT ``(_id, nc)`` — the inverted-index design
    stores sizes next to postings so the per-batch jaccard never
    re-aggregates the postings table (r13: the per-pass semi-join +
    corpus-index re-count was a sequential job chain behind the probe
    join; a one-row-per-doc stored table is both cheaper to scan and
    independent of the probe, so it broadcasts while the probe runs).
    Build once per corpus snapshot (append per admitted batch in
    production); with ``materialize_dir`` they are written as parquet
    and the returned frames read the store (explicit schema — job-free
    steady-state plan construction), mirroring ``build_minhash_index``;
    sizes aggregate from the WRITTEN shingle store so the corpus is
    shingled exactly once at build."""
    c_hash = corpus.select(
        F.md5(norm_text(text_col)).alias("_h")
    ).distinct()
    c_sh = distinct_shingles(corpus, id_col, text_col, shingle_n)

    def _sizes(sh: DataFrame) -> DataFrame:
        return sh.groupBy("_id").agg(F.count(F.lit(1)).alias("nc"))

    if materialize_dir is None:
        # the derived shingle frame has TWO consumers downstream (the
        # probe join and the size table) — persist so the explode+hash
        # pass runs once, not per consumer (the r9 double-scan rule;
        # the materialized path gets the same effect from the parquet
        # store, and the pipeline's live-index ingest stage takes this
        # branch every run)
        from pyspark import StorageLevel

        c_sh = c_sh.persist(StorageLevel.MEMORY_AND_DISK)
        return c_hash, c_sh, _sizes(c_sh)
    import os

    spark = corpus.sparkSession
    hp = os.path.join(materialize_dir, "hashes")
    sp = os.path.join(materialize_dir, "shingles")
    zp = os.path.join(materialize_dir, "sizes")
    c_hash.write.mode("overwrite").parquet(hp)
    c_sh.write.mode("overwrite").parquet(sp)
    stored_sh = spark.read.schema(c_sh.schema).parquet(sp)
    _sizes(stored_sh).write.mode("overwrite").parquet(zp)
    return (
        spark.read.schema(c_hash.schema).parquet(hp),
        stored_sh,
        spark.read.schema(
            _sizes(stored_sh).schema
        ).parquet(zp),
    )


def incremental_dedup(
    delta: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 8,
    threshold: float = 0.5,
    corpus_index: tuple[DataFrame, ...] | None = None,
) -> DataFrame:
    """Incremental ingestion dedup: admit only NEW-batch documents that
    are neither exact copies nor near-duplicates of the EXISTING corpus
    — without ever re-pairing the corpus against itself.

    The production shape for continuous ingestion at 100 TB: per batch,
    cost is (a) one anti-join of the delta's content hashes against the
    corpus hash index and (b) one inverted-index join of the delta's
    shingles against the corpus shingle index — both proportional to
    the DELTA (plus index probe), never corpus². Pass the stored
    indexes as ``corpus_index=(content_hashes, distinct_shingles,
    shingle_sizes)`` (built by ``build_exact_index``): the corpus is
    never re-hashed, re-shingled, or re-counted here, and the per-doc
    size table joins the collision pairs directly (r13 — the old
    2-tuple form re-aggregated the postings index behind a semi-join
    per batch, a sequential tail; it is still accepted and derives
    sizes collision-restricted). With no index everything derives from
    the corpus frame (the live-derivation check). Precondition: delta
    and corpus ids are disjoint (re-ingest same-id handling is the
    ``minhash_lsh_incremental`` contract; this operator's indexes are
    pruned by the caller before re-add).

    Returns the admitted delta rows with an ``admit_reason`` of
    ``'new'``, plus rejected rows tagged ``'exact_dup'`` /
    ``'near_dup'`` — callers filter or audit.
    """
    d_hash = delta.select(
        F.col(id_col), F.md5(norm_text(text_col)).alias("_h")
    )
    c_sizes = None
    if corpus_index is None:
        c_hash = corpus.select(
            F.md5(norm_text(text_col)).alias("_h")
        ).distinct()
        c_sh = distinct_shingles(corpus, id_col, text_col, shingle_n)
    elif len(corpus_index) == 2:
        c_hash, c_sh = corpus_index
    else:
        c_hash, c_sh, c_sizes = corpus_index
    exact_dups = d_hash.join(c_hash, "_h", "left_semi").select(id_col)

    from pyspark import StorageLevel

    # the delta index feeds its size aggregate AND the probe join —
    # persist so the explode+hash pass runs once, not twice
    d_sh = distinct_shingles(delta, id_col, text_col, shingle_n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    d_sizes = d_sh.groupBy("_id").agg(F.count(F.lit(1)).alias("nd"))
    shared = (
        d_sh.select(F.col("_id").alias("d"), "shingle")
        .join(c_sh.select(F.col("_id").alias("c"), "shingle"), "shingle")
        .groupBy("d", "c")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    if c_sizes is None:
        # no stored size table: derive it collision-restricted (semi
        # join before the aggregate — delta-collision-sized, never a
        # corpus-wide aggregate). shared now has TWO consumers, so it
        # persists (the r9 double-scan rule, CLAUDE.md); with the
        # stored table the jaccard filter is shared's ONLY consumer
        # and the barrier would just add a sequential job.
        shared = shared.persist(StorageLevel.MEMORY_AND_DISK)
        c_sizes = c_sh.persist(StorageLevel.MEMORY_AND_DISK).join(
            shared.select(F.col("c").alias("_id")).distinct(),
            "_id",
            "left_semi",
        ).groupBy("_id").agg(F.count(F.lit(1)).alias("nc"))
    near = (
        shared.join(d_sizes.select(F.col("_id").alias("d"), "nd"), "d")
        .join(c_sizes.select(F.col("_id").alias("c"), "nc"), "c")
        .filter(
            F.col("shared")
            / (F.col("nd") + F.col("nc") - F.col("shared"))
            >= threshold
        )
        .select(F.col("d").alias(id_col))
    )
    # ONE outer join tags both reasons (r13 — two sequential broadcast
    # joins before): union the reason sets with a priority and reduce
    # per id (exact wins; the groupBy also dedups near's multi-collision
    # ids, replacing its distinct).
    reasons = (
        exact_dups.withColumn("_pri", F.lit(0))
        .unionAll(near.withColumn("_pri", F.lit(1)))
        .groupBy(id_col)
        .agg(F.min("_pri").alias("_pri"))
    )
    tagged = (
        delta.join(reasons, id_col, "left_outer")
        .withColumn(
            "admit_reason",
            F.when(F.col("_pri") == 0, "exact_dup")
            .when(F.col("_pri") == 1, "near_dup")
            .otherwise("new"),
        )
        .drop("_pri")
    )
    return tagged
