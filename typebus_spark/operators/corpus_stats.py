"""Corpus-level statistics for training-data curation.

North-star extensions past the reference's event-bus surface (which has
no analytics; SURVEY.md §2's LLM-pipeline addendum): the three checks a
corpus pipeline runs between dedup and training —

- **contamination**: does any train-split document share verbatim
  n-grams with the held-out split? (the classic benchmark-leak check);
- **boilerplate**: which n-grams appear across the most documents?
  (headers/footers/licence text to strip);
- **repetition**: how internally repetitive is each document? (the
  repeated-n-gram quality signal used by C4/Gopher-style filters).

All three stay JVM-side: expression-only per-row work plus at most one
shuffle on the shingle key — the shapes that survive a 100 TB corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from typebus_spark.functions.text import shingles, tokens, tokens_lower


def contamination_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str = "split",
    train: str = "train",
    test: str = "test",
    shingle_n: int = 8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Per-train-document contamination against the held-out split.

    A train document is contaminated when it shares ≥1 distinct word
    ``shingle_n``-gram with any ``test`` document. Returns one row per
    contaminated train doc: ``(train_doc_id, n_test_docs, max_shared,
    total_shared)``.

    Plan shape: explode both splits' distinct shingles ONCE (narrow),
    shuffle on the shingle key, train×test matches aggregate map-side —
    the same inverted-index join as ``jaccard_pairs``, so cost is
    bounded by shared-shingle volume, not |train|×|test|.
    ``max_shingle_freq`` caps hub shingles (boilerplate present in many
    docs would otherwise quadratically inflate the match space —
    at corpus scale ALWAYS set it; boilerplate is not contamination).
    """
    from typebus_spark.session import ensure_parallelism

    # Spread BEFORE the shingle explode: small parquet arrives as one
    # partition and the per-row n-gram build would serialize on one core.
    sh = ensure_parallelism(
        df.filter(F.col(split_col).isin(train, test)).select(
            F.col(id_col).alias("_id"),
            F.col(split_col).alias("_split"),
            F.col(text_col),
        )
    ).select(
        "_id",
        "_split",
        F.explode(
            F.array_distinct(shingles(tokens(text_col), shingle_n))
        ).alias("shingle"),
    )
    if max_shingle_freq is not None:
        freq_ok = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_freq)
            .select("shingle")
        )
        sh = sh.join(freq_ok, "shingle")
    tr = sh.filter(F.col("_split") == train).select(
        F.col("_id").alias("train_doc_id"), "shingle"
    )
    te = sh.filter(F.col("_split") == test).select(
        F.col("_id").alias("test_doc_id"), "shingle"
    )
    pairs = (
        tr.join(te, "shingle")
        .groupBy("train_doc_id", "test_doc_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return pairs.groupBy("train_doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_test_docs"),
        F.max("shared").cast("long").alias("max_shared"),
        F.sum("shared").cast("long").alias("total_shared"),
    )


def top_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` word n-grams by DOCUMENT frequency (boilerplate scan).

    One explode + one shuffle on the shingle key; the global top-k runs
    as ``TakeOrdered`` (per-partition heaps + driver merge of k rows),
    never a cluster-wide sort. Tie-break on the shingle text makes the
    cut deterministic across engines and partitionings.
    """
    from typebus_spark.session import ensure_parallelism

    sh = ensure_parallelism(
        df.select(F.col(id_col).alias("_id"), F.col(text_col))
    ).select(
        "_id",
        F.explode(
            F.array_distinct(shingles(tokens(text_col), n))
        ).alias("shingle"),
    )
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("shingle"))
        .limit(k)
    )


def vocab_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 40,
) -> DataFrame:
    """Vocabulary build: top-``k`` lowercased tokens by term frequency,
    with document frequency alongside — the first step of any tokenizer/
    vocab pipeline over a corpus.

    One explode + one shuffle on the token key; ``count`` and
    ``count_distinct(doc)`` share the single aggregation (the distinct
    rewrites to a two-stage partial agg). Global top-k is TakeOrdered
    (per-partition heaps), never a full sort; (tf, token) tie-break is
    deterministic across engines.
    """
    from typebus_spark.session import ensure_parallelism

    tok = ensure_parallelism(
        df.select(F.col(id_col).alias("_id"), F.col(text_col))
    ).select(
        "_id",
        F.explode(tokens_lower(text_col)).alias("token"),
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.countDistinct("_id").cast("long").alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("token"))
        .limit(k)
    )


def token_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document unigram token entropy (bits) — the vocabulary-
    diversity quality signal (low entropy ⇒ repetitive/templated text).

    ``H = log2(n) - Σ c·log2(c) / n`` over per-token counts ``c`` —
    computed as two hash aggregations (token counts per doc, then the
    entropy fold per doc), both with map-side partials; no windows, no
    driver collects. The per-doc float sum spans only the document's
    distinct-token counts, so cross-engine accumulation-order error is
    ~1e-14 — far inside the round(6) guard.
    """
    from typebus_spark.session import ensure_parallelism

    tok = ensure_parallelism(
        df.select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col),
        F.explode(tokens_lower(text_col)).alias("token"),
    )
    counts = tok.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    n = F.sum("c")
    c = F.col("c").cast("double")
    return counts.groupBy(id_col).agg(
        n.cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.round(
            F.log2(n.cast("double"))
            - F.sum(c * F.log2(c)) / n.cast("double"),
            6,
        ).alias("entropy"),
    )


def repetition_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-document repeated n-gram counts (internal repetition signal).

    Pure projection — no explode, no shuffle, scan-speed at any scale:
    ``n_repeated = n_ngrams - n_distinct`` within each document.
    """
    from typebus_spark.session import ensure_parallelism

    sh = shingles(tokens(text_col), n)
    return ensure_parallelism(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.size(sh).cast("long").alias("n_ngrams"),
        F.size(F.array_distinct(sh)).cast("long").alias("n_distinct"),
        (F.size(sh) - F.size(F.array_distinct(sh)))
        .cast("long")
        .alias("n_repeated"),
    )


def bigram_logprob(
    df: "DataFrame",
    group_col: str,
    text_col: str,
) -> "DataFrame":
    """Statistical-LM quality signal (the KenLM-perplexity-filter shape,
    CCNet/Gopher style, at bigram order): score every bigram by its
    Laplace-smoothed corpus probability ln((C(w1,w2)+1)/(C(w1)+V)) and
    aggregate the mean log-probability per ``group_col``.

    Scale shape: the model IS two corpus aggregates (unigram + bigram
    counts) joined back onto the exploded bigram stream — counts
    shuffle once each on their key, the vocab size rides along as a
    broadcast scalar, and every ln() is fixed to integer nano-units
    per bigram BEFORE the final sum, so the group aggregate is exact
    and partitioning-invariant (a raw double sum would depend on
    reduce order).

    ln() portability: transcendentals are not bit-identical across
    libm implementations (1-2 ulp), so individual nano-unit fixes CAN
    flip by ±1 between engines near a .5 boundary. The design absorbs
    this: a ±k-unit drift in the summed nano-units moves the final
    ``round(sum/1e9/n, 6)`` by ~k·1e-9/n — twelve orders of magnitude
    below the 6-decimal rounding step — so the oracled output is
    stable unless the mean itself sits within ~1e-12 of a rounding
    boundary (measure-zero in float data). Contrast
    ``round(sum(double))`` on raw doubles, which the repo bans.
    """
    from pyspark import StorageLevel

    from typebus_spark.functions.text import (
        shingle_rows_from_tokens,
        tokenized_rows,
    )

    # ONE text scan + regex tokenize + spread shuffle for BOTH streams:
    # the bigram explode and the unigram explode previously each ran
    # their own scan+split+repartition of the full corpus — the second
    # full tokenize was ~45% of the query wall at sf0.1 (r13 profile).
    # The persisted frame is one row per document (token ARRAY), tiny
    # relative to the exploded streams it feeds.
    tok = tokenized_rows(df, group_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ex = shingle_rows_from_tokens(tok, 2).select(
        F.col("_id").alias(group_col), F.col("_s").alias("bg")
    )
    uni = tok.select(F.explode("_t").alias("w"))
    # persisted: ugc feeds BOTH the score join and the vocab-size
    # aggregate, and without the persist each consumer re-executed the
    # unigram explode (double-scan disease, r9 — single-reuse persists
    # are the sanctioned fix; vocab-sized rows, tiny in bytes)
    ugc = (
        uni.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # |vocab| == number of ugc groups: reuse the aggregate instead of a
    # second explode + countDistinct pass over the corpus
    vocab = ugc.agg(F.count(F.lit(1)).alias("vs"))
    lp = F.log(
        (F.col("c2") + 1).cast("double")
        / (F.col("c1") + F.col("vs")).cast("double")
    )
    # ONE explode pass (r13): the bigram stream pre-reduces to
    # (group, bg, k) — map-side partials collapse within-group repeats
    # before the only stream shuffle — so the old shape's second
    # explode pass + distinct-bigram count join over RAW occurrences
    # disappear entirely. The per-group sums stay exact: each
    # occurrence contributes the same integer nano-unit score, so
    # sum(k·lp_u) == the occurrence-stream sum (pure integer
    # arithmetic). The reduced form shuffles the fewest bytes at any
    # scale: distinct (group, bigram) pairs with partials, never raw
    # occurrences, never a second explode.
    red = ex.groupBy(group_col, "bg").agg(F.count(F.lit(1)).alias("k"))
    # c2 via a tiny groupBy(bg) + join-back, NOT a window (r14, verdict
    # item 3): `sum(k) over (partition by bg)` puts every (group, bg)
    # row of one bigram in ONE window partition — a stop-word bigram
    # present in 1B docs is 1B rows on one task, and windows get
    # neither AQE skew-splitting nor map-side partials. The aggregate
    # form gets both (partial sums collapse per map task; the
    # join-back is an equi-join, so AQE skew-join splits a hot bg at
    # runtime). red is persisted because it feeds both the c2
    # aggregate and the score join (single-reuse persist, the r9
    # sanctioned fix — without it each consumer re-explodes +
    # re-reduces from the token cache). Values identical: c2 is the
    # same integer sum either way. Interleaved 3-variant A/B at sf0.1
    # (7 passes, min/median): join-back+persist 0.775/0.84 s vs window
    # 0.80/0.89 s vs join-back-no-persist 0.86/0.93 s.
    red = red.persist(StorageLevel.MEMORY_AND_DISK)
    bgc = red.groupBy("bg").agg(F.sum("k").alias("c2"))
    scored = (
        red.join(bgc, "bg")
        .withColumn("w", F.substring_index(F.col("bg"), " ", 1))
        .join(ugc, "w")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(group_col),
            "k",
            F.round(lp * 1e9, 0).cast("long").alias("lp_u"),
        )
    )
    return scored.groupBy(group_col).agg(
        F.sum("k").alias("n_bigrams"),
        F.round(
            F.sum(F.col("k") * F.col("lp_u")).cast("double")
            / 1e9
            / F.sum("k").cast("double"),
            6,
        ).alias("avg_logprob"),
    )


def source_overlap(
    df: DataFrame,
    group_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Pairwise SOURCE-level shingle overlap — the corpus-composition
    diagnostic run before mixing: which domains/sources feed the model
    near-identical material? One row per source pair (a < b) with the
    distinct-shingle counts, the intersection size, and the exact
    set-Jaccard.

    Shape: the same inverted shingle index as the dedup family
    (``distinct_shingles`` — 60-bit md5 keys hashed at the scan), but
    keyed by SOURCE instead of document: the self-join on the shingle
    key produces at most |sources-containing-shingle|² rows per
    shingle, and the final frame is |sources|² — tiny even when the
    corpus is 100 TB. The per-source size aggregate broadcasts into
    the pair join.
    """
    from typebus_spark.operators.dedup import _shingle_key_col

    from typebus_spark.functions.text import exploded_shingle_rows

    # The persisted index must stay WIDE (r13): the AQE 2 MB advisory
    # coalesces this ~3 MB frame to ~2 partitions inside the cache, and
    # the CPU-dense pair join then probes its 754k-row expansion on ~2
    # cores. An explicit repartition(defaultParallelism, shingle) is
    # REPARTITION_BY_NUM — AQE won't coalesce it — and placing it
    # BEFORE the distinct replaces the distinct's own exchange instead
    # of adding one (HashPartitioning(shingle) satisfies the
    # (_id, shingle) clustering), so total shuffles are unchanged
    # (11 == 11 in the final adaptive plans). 7-pair interleaved A/B at
    # sf0.1: wins 5/7 adjacent pairs, median 1.235 → 1.029 s (−17%);
    # parity in calm windows (the coalesced form only starves when the
    # host is busy — but 2-core probes are wrong at every load).
    # defaultParallelism scales with the cluster; never a local constant.
    sh = (
        exploded_shingle_rows(df, group_col, text_col, shingle_n)
        .select("_id", _shingle_key_col())
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism, "shingle"
        )
        .distinct()
        .persist()
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    a = sh.select(F.col("_id").alias("src_a"), "shingle")
    b = sh.select(F.col("_id").alias("src_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    # Both size enrichments broadcast the SAME aggregate: joining two
    # ALIASES of one frame keeps the canonical exchange plan identical,
    # so ReuseExchange materializes the broadcast once — the renamed-
    # select form built two broadcast jobs, each re-running the sizes
    # aggregate, in SERIES before the pair join could start (r12
    # verdict item 2).
    s1 = sizes.alias("s1")
    s2 = sizes.alias("s2")
    n_a = F.col("s1._n")
    n_b = F.col("s2._n")
    jac = F.col("inter") / (n_a + n_b - F.col("inter"))
    return (
        inter.join(F.broadcast(s1), F.col("src_a") == F.col("s1._id"))
        .join(F.broadcast(s2), F.col("src_b") == F.col("s2._id"))
        .filter(jac >= min_jaccard)
        .select(
            "src_a",
            "src_b",
            n_a.cast("long").alias("n_a"),
            n_b.cast("long").alias("n_b"),
            "inter",
            F.round(jac, 4).alias("jaccard"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 3,
    n_range_partitions: int = 32,
) -> DataFrame:
    """CCNet-style perplexity tiering (Wenzek et al. 2020): score every
    document with the corpus bigram LM (``bigram_logprob`` grouped per
    document) and split the corpus into ``n_buckets`` equal-population
    tiers by score — bucket 1 ("head") is the most fluent text, the
    last bucket ("tail") the least; curation keeps head+middle or
    re-weights tiers when mixing.

    Bucketing is EXACT equal-population (ntile semantics: bucket sizes
    differ by at most one, larger buckets first) but computed WITHOUT a
    single-partition global window over the DATA: the per-doc scores
    are range-partitioned on (score DESC, id), ranked locally per
    partition, and shifted by per-partition row-count offsets. The
    offsets are computed IN-PLAN (r10): the per-partition counts are a
    ``n_range_partitions``-row frame, their running sum is a window
    over those few rows (partition-count-sized, never data-sized), and
    the offsets broadcast-join back on the partition id — no driver
    collect, so plan construction is job-free and the bench
    prepared-plan cache applies (the old build-time collect made every
    plan build pay the whole score pipeline). ``spark_partition_id``
    is consistent across the two consumers because both read the SAME
    persisted materialization of ``rb`` (the same invariant the
    collect-based form relied on). ``floor((rank-1)*n/N)+1`` is
    algebraically identical to SQL ``ntile(n)`` for strict total
    orders, so a plain single-window ntile (the oracle form) matches
    bit-for-bit.

    The score pipeline inherits ``bigram_logprob``'s portability
    scheme (per-bigram integer nano-units before summation), so tier
    assignment is engine- and partitioning-invariant away from exact
    rank ties, which the (score DESC, id) total order removes.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    # persisted: repartitionByRange runs a SAMPLING job over its child
    # to pick range bounds, then the exchange executes the child again —
    # without the persist the entire score pipeline (explode + two
    # count joins) ran twice per materialization. One row per document,
    # three narrow columns — tiny at any scale.
    scored = bigram_logprob(df, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    rb = (
        scored.repartitionByRange(
            n_range_partitions, F.col("avg_logprob").desc(), F.col(id_col)
        )
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = rb.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    # windows over the counts frame touch n_range_partitions ROWS —
    # the single-partition window is fine at that size
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_c").over(w_all).alias("_n"),
    )
    w_local = Window.partitionBy("_pid").orderBy(
        F.col("avg_logprob").desc(), F.col(id_col)
    )
    rank0 = (F.row_number().over(w_local) + F.col("_off") - 1).cast("long")
    out = (
        rb.join(F.broadcast(offsets), "_pid")
        .withColumn("_r0", rank0)
        # integer DIV keeps the boundary exact at any rank magnitude
        # (a double divide misrounds once rank*n exceeds 2^53)
        .withColumn(
            "bucket",
            F.expr(f"CAST(_r0 * {n_buckets} DIV _n AS BIGINT) + 1"),
        )
        .select(F.col(id_col), "n_bigrams", "avg_logprob", "bucket")
    )
    if n_buckets == 3:
        tier = F.element_at(
            F.lit(["head", "middle", "tail"]), F.col("bucket").cast("int")
        )
    else:
        tier = F.concat(F.lit("b"), F.col("bucket"))
    return out.withColumn("tier", tier)


def dsir_logweights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_filter,
    n_buckets: int = 1024,
    seed: int = 5,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by how target-like it is under hashed-unigram bag-of-words
    LMs — ``log w(x) = Σ_tok [ln p_target(bucket) − ln p_raw(bucket)]``
    with add-1 smoothing over ``n_buckets`` md5 token buckets.
    ``target_filter`` is a boolean Column selecting the target domain
    (rows matching it define p_target; the WHOLE corpus defines p_raw).

    Returns ``(id, n_toks, logweight)`` — logweight in exact 1e-6 units
    (BIGINT): each per-bucket ln ratio is fixed to integer MICRO-units
    before the per-document sum, so the ranking is over exact integers
    (the bigram_logprob portability scheme). Micro (not nano) on
    purpose: the residual portability risk of any quantize-then-sum
    scheme is a bucket whose ``ln`` result lands within cross-engine
    ulp drift (~4e-15 in ln units) of a half-unit rounding boundary —
    flip probability per bucket ≈ drift/grid. At a 1e-9 grid that is
    ~4e-6/bucket (≈0.4% per 1024-bucket corpus, and one flipped bucket
    shifts EVERY document containing its tokens); at 1e-6 it is ~4e-9
    (≈4e-6 per corpus). Resolution 1e-6 per token is still ~5 orders
    below any DSIR selection threshold.

    Scale shape: the two LMs are ``n_buckets``-row aggregates (bounded,
    broadcast back as a join); the corpus is scanned once into a token
    explode + one doc-key aggregate. Downstream selection composes with
    ``operators.sampling.weighted_sample`` (threshold from the weight)
    — no global sort, no driver data.
    """
    from typebus_spark.session import ensure_parallelism

    # spread FIRST: the fixture parquet arrives as one split, and the
    # explode + per-token md5 below is the query's entire compute — on
    # one core it serializes the whole scan stage (guide §2 / the repo's
    # ensure_parallelism rule; this operator was the one corpus query
    # missing the spread, r13)
    toks = ensure_parallelism(
        df.select(F.col(id_col), target_filter.alias("_is_t"), F.col(text_col))
    ).select(
        F.col(id_col),
        "_is_t",
        F.explode(tokens_lower(text_col)).alias("tok"),
    ).withColumn(
        "b",
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col("tok"))), 1, 15),
            16,
            10,
        ).cast("long")
        % n_buckets,
    )
    # Reduce the token stream ONCE to per-(doc, bucket) counts and
    # persist: the LM build and the scoring join both consume this
    # frame, and without the persist Catalyst re-executed the whole
    # explode+md5 scan per consumer (no exchange reuse across the two
    # aggregates — measured 2x scan cost at sf0.1, the same disease
    # lang_id_ngram had). ~half the token count in rows, tiny in bytes.
    from pyspark import StorageLevel

    dbc = (
        toks.groupBy(F.col(id_col), "_is_t", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # one pass builds BOTH models: raw = all rows, target = flagged rows
    lm = dbc.groupBy("b").agg(
        F.sum("cnt").cast("long").alias("c_r"),
        F.sum(F.when(F.col("_is_t"), F.col("cnt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("c_t"),
    )
    # corpus totals as a window over the ``n_buckets``-row lm frame
    # (single partition of ≤1024 rows — the perplexity_buckets offsets
    # precedent): a separate agg + broadcast crossJoin added one more
    # SEQUENTIAL broadcast-materialization job per run (r12 verdict
    # item 2 — wall ≈ sequential stages × driver latency)
    from pyspark.sql import Window

    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lm = lm.select(
        "b",
        "c_r",
        "c_t",
        F.sum("c_r").over(w_all).cast("long").alias("n_r"),
        F.sum("c_t").over(w_all).cast("long").alias("n_t"),
    )
    # ln p_t(b) - ln p_r(b), add-1 smoothed, fixed to MICRO-units per
    # BUCKET (a pure function of the exact integer counts; the coarse
    # grid keeps ulp drift ~6 orders away from the rounding boundary —
    # see the docstring's flip-probability analysis)
    ratio = lm.select(
        "b",
        F.round(
            (
                F.log(
                    (F.col("c_t") + 1).cast("double")
                    / (F.col("n_t") + n_buckets).cast("double")
                )
                - F.log(
                    (F.col("c_r") + 1).cast("double")
                    / (F.col("n_r") + n_buckets).cast("double")
                )
            )
            * 1e6,
            0,
        )
        .cast("long")
        .alias("lr_u"),
    )
    return (
        dbc.join(F.broadcast(ratio), "b")
        .groupBy(F.col(id_col))
        .agg(
            F.sum("cnt").cast("long").alias("n_toks"),
            F.sum(F.col("cnt") * F.col("lr_u")).cast("long").alias(
                "logweight"
            ),
        )
    )
