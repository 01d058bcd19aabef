"""Scale smoke: run the heavy operators on N-times replicated input.

Correctness is the oracle gate's job; this tool checks the SCALE story
directly — that the operators' cost curves and plans survive an input
10-30x beyond the bench SF on the same hardware (no OOM, no plan flip
to cartesian/global-sort, wall growing roughly linearly for the
index/bucket-bounded paths).

Replication multiplies ids into fresh key ranges, so dedup candidates
and per-key state GROW with the factor (each replica is a near-dup
family member — the worst realistic case for the pair generators),
not a degenerate all-identical corpus.

Usage: python tools/scale_smoke.py [factor] [--ops a,b,c]
(default factor 10, sf0.1 input; --ops restricts to the named rows —
the r10 100x core-dedup run uses
``python tools/scale_smoke.py 100 --ops exact_dedup,minhash_lsh_pairs,dedup_substrings``).
Prints one JSON line per operator: {op, factor, rows_in, rows_out,
wall_sec, shuffle_write_mb, plan_ok}. Shuffle bytes come from the
status REST API (UI enabled for the smoke session only), summed over
the op's own stages via its job group.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from typebus_spark import get_spark  # noqa: E402
from typebus_spark.session import load_table  # noqa: E402


def replicate(df, id_col: str, factor: int, id_stride: int):
    """factor copies with shifted ids (fresh key ranges per replica)."""
    rep = df.withColumn(
        "_r", F.explode(F.expr(f"sequence(0, {factor - 1})"))
    )
    # _r is INT; under ANSI mode _r * a ~1e9 stride overflows INT32 —
    # widen to long before the multiply.
    return rep.withColumn(
        id_col, F.col(id_col) + F.col("_r").cast("long") * F.lit(id_stride)
    ).drop("_r")


def _shuffle_write_mb(spark, group: str) -> float | None:
    """Sum shuffle WRITE bytes over the stages of the op's job group
    (status REST API; write-side counts each exchange exactly once)."""
    try:
        import urllib.request

        sc = spark.sparkContext
        tracker = sc.statusTracker()
        stage_ids = set()
        for jid in tracker.getJobIdsForGroup(group):
            info = tracker.getJobInfo(jid)
            if info:
                stage_ids.update(info.stageIds)
        port = sc.uiWebUrl.rsplit(":", 1)[1] if sc.uiWebUrl else "4040"
        url = (
            f"http://localhost:{port}/api/v1/applications/"
            f"{sc.applicationId}/stages?status=complete"
        )
        stages = json.load(urllib.request.urlopen(url, timeout=10))
        total = sum(
            s.get("shuffleWriteBytes", 0)
            for s in stages
            if s.get("stageId") in stage_ids
        )
        return round(total / (1 << 20), 1)
    except Exception:
        return None  # metric is advisory; never sink the smoke on it


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only_ops = None
    salted = "--salted" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--ops"):
            val = a.split("=", 1)[1] if "=" in a else None
            if val is None:
                val = sys.argv[sys.argv.index(a) + 1]
                if val in args:
                    args.remove(val)
            only_ops = {s.strip() for s in val.split(",") if s.strip()}
    factor = int(args[0]) if args else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="scale-smoke",
        # UI on for the status REST API (shuffle byte totals)
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from typebus_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from typebus_spark.operators.mixing import token_budget_mix
    from typebus_spark.operators.sketch import kmv_distinct
    from typebus_spark.functions.text import tokens
    from typebus_spark.plans.checks import formatted_plan, has_global_sort

    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    big_docs = replicate(docs, "doc_id", factor, 10_000_000)
    if salted:
        # CORPUS-GROWTH mode (--salted, the r10 100x row): every token
        # gets a per-replica-slice suffix, so near-dup families exist
        # only WITHIN a slice and the duplication RATE stays constant
        # as the corpus grows — the realistic 100 TB shape. The default
        # (identical replicas) is the worst-case FAMILY-growth shape:
        # its pair OUTPUT is quadratic in the factor by construction
        # (every replica pairs with every other), which measures output
        # blowup, not corpus scaling, past ~10x.
        big_docs = big_docs.withColumn(
            "text",
            F.expr(
                "array_join(transform(split(text, ' '), "
                "t -> concat(t, '_', cast(doc_id div 10000000 as string))"
                "), ' ')"
            ),
        )
    big_docs = big_docs.persist()
    big_ev = replicate(ev, "event_id", factor, 100_000_000)
    if salted:
        # KEY-GROWTH mode for events (r13, the streaming 100x rows):
        # fresh user_id range per replica, so stream-stream join
        # matches and per-key state exist only WITHIN a replica slice
        # and grow LINEARLY with the factor — the realistic 100 TB
        # shape (more users, same per-user density/horizon). The
        # default (identical user set) multiplies per-user DENSITY:
        # join output is quadratic in the factor by construction,
        # which measures fanout blowup, not corpus scaling, past ~10x
        # (the r13 100x unsalted attempt OOMed exactly this way).
        # entity_state_smoke deliberately runs UNSALTED — its claim is
        # state rows == the unchanged distinct-key count.
        big_ev = big_ev.withColumn(
            "user_id",
            F.expr(
                "user_id + (event_id div 100000000L) * 10000000L"
            ),
        )
    n_docs = big_docs.count()

    def run(op_name, df, rows_in, collect_rows=False, extra=None):
        if only_ops is not None and op_name not in only_ops:
            return
        # rows_in may be a thunk so skipped ops never pay its count
        rows_in = rows_in() if callable(rows_in) else rows_in
        plan = formatted_plan(df)
        plan_ok = (
            "CartesianProduct" not in plan and not has_global_sort(df)
        )
        sc = spark.sparkContext
        grp = f"smoke_{op_name}"
        sc.setJobGroup(grp, grp)
        t0 = time.perf_counter()
        try:
            # count() on a global aggregate PRUNES the aggregate
            # expressions (Catalyst rewrites to an empty agg) — ops whose
            # work lives in the aggregates themselves must collect().
            rows_out = len(df.collect()) if collect_rows else df.count()
        finally:
            sc.setJobGroup("", "")
        wall = round(time.perf_counter() - t0, 2)
        row = {
            "op": op_name,
            "factor": factor,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "wall_sec": wall,
            "shuffle_write_mb": _shuffle_write_mb(spark, grp),
            "plan_ok": plan_ok,
        }
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)

    run("exact_dedup", exact_dedup(big_docs, "doc_id", "text"), n_docs)
    run(
        "minhash_lsh_pairs",
        minhash_lsh_pairs(big_docs, "doc_id", "text", threshold=0.5),
        n_docs,
    )
    run(
        "simhash_pairs",
        simhash_pairs(big_docs, "doc_id", "text", max_hamming=3),
        n_docs,
    )
    run(
        "token_budget_mix",
        token_budget_mix(
            big_docs.withColumn(
                "n_tok", F.size(tokens("text")).cast("long")
            ),
            "doc_id",
            "source",
            "n_tok",
            50_000,
        ),
        n_docs,
    )
    from typebus_spark.operators.dedup import minhash_lsh_incremental

    # ingest shape: the UNREPLICATED base corpus is the delta, the
    # replicated frame is the history — cost must track the delta +
    # collisions, never history x history
    run(
        "minhash_lsh_incremental",
        minhash_lsh_incremental(
            big_docs, docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(900_000_000)
            ),
            "doc_id", "text", threshold=0.5,
        ),
        n_docs,
    )
    run(
        "kmv_distinct",
        kmv_distinct(big_ev, "event_type", "user_id", k=64),
        lambda: big_ev.count(),
    )
    from typebus_spark.operators.sketch import heavy_hitters

    tok = big_docs.select(
        F.explode(
            F.transform(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda x: F.lower(x),
            )
        ).alias("token")
    )
    # two linear scans (sketch + verify), shuffle = candidates+1 rows;
    # wall must grow ~linearly with the token stream, never with the
    # vocabulary
    run("heavy_hitter_tokens", heavy_hitters(tok, "token", 1, 500), n_docs)

    # r12 additions: HTML->text extraction and PSL registrable domains
    # are pure scan-side projections — wall must grow ~linearly in the
    # factor and the only shuffle is the terminal aggregate. Aggregate-
    # only ops collect() (the count-prune trap); the PSL op groups BY
    # the derived domain, so its count() cannot prune the expression.
    from typebus_spark.operators.html_extract import (
        drop_boilerplate_sql,
        extract_text_sql,
    )
    from typebus_spark.operators.url_curation import psl_registrable_sql
    from typebus_spark.queries.corpus import _PSL_HOST_SQL, _html_synth_sql

    _ext = extract_text_sql(
        drop_boilerplate_sql(_html_synth_sql("spark"), "spark"), "spark"
    )
    run(
        "html_extract",
        big_docs.selectExpr(
            f"md5({_ext}) AS m", f"length({_ext}) AS l"
        ).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("l").alias("clean_chars"),
            F.count_distinct(F.col("m")).alias("distinct_texts"),
        ),
        n_docs,
        collect_rows=True,
    )
    run(
        "domain_psl",
        big_docs.selectExpr(_PSL_HOST_SQL + " AS host")
        .selectExpr(psl_registrable_sql("host", "spark") + " AS domain")
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n")),
        n_docs,
    )
    # events count only when an events-family op actually runs
    need_ev = only_ops is None or only_ops & {
        "retry_drain", "stream_stream_join", "stream_outer_join",
        "stream_entity_state", "stream_hourly_append",
        "stream_session_append", "stream_sliding_append",
        "stream_dedup_bounded",
    }
    n_ev = big_ev.count() if need_ev else 0
    from typebus_spark.operators.dedup import dedup_substrings
    from typebus_spark.operators.sampling import shard_shuffle

    # r9 additions (VERDICT r8 #2): shard shuffle must stay ONE hash
    # shuffle + partition-local sort (never a global sort) at any
    # factor; substring dedup is the spans shape + one per-doc window.
    # checksum aggregate over (shard, pos) so count() can't prune the
    # rank window that IS the operator's work (the q_scale_smoke trap)
    run(
        "shard_shuffle",
        shard_shuffle(big_docs, "doc_id", n_shards=64, seed=11)
        .groupBy("shard")
        .agg(F.sum("pos").alias("pos_sum")),
        n_docs,
        collect_rows=True,
    )
    run(
        "dedup_substrings",
        dedup_substrings(big_docs, "doc_id", "text"),
        n_docs,
    )
    # r9: langid is one explode scan + a bounded broadcast join — wall
    # must grow ~linearly in total chars, profiles constant
    from typebus_spark.operators.text_analysis import (
        lang_id_ngram,
        langid_frozen_profile,
    )

    run(
        "lang_id_ngram",
        lang_id_ngram(
            big_docs, "doc_id", "text",
            profile=langid_frozen_profile(spark),
        ),
        n_docs,
    )
    # r10: n-gram repetition gate — one explode (~2x tokens gram rows),
    # two hash aggregates with map-side combine; wall must grow
    # ~linearly in tokens. Checksum groupBy(keep)+collect so count()
    # can't prune the per-doc aggregates that ARE the work.
    from typebus_spark.operators.text_analysis import repetition_fractions

    run(
        "repetition_fractions",
        repetition_fractions(big_docs, "doc_id", "text")
        .groupBy("keep")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("dup3_frac"), 4).alias("dup3_sum"),
        ),
        n_docs,
        collect_rows=True,
    )
    # r9: phash near-dup runs on the DISTINCT-hash catalog — the
    # banding join is catalog-sized (constant here: replicas reuse the
    # same blobs → same hashes), only the decode is linear
    import base64

    from typebus_spark.operators._media_fixtures import PHASH_NEAR_FIXTURES
    from typebus_spark.operators.multimodal import (
        perceptual_hash_media,
        phash_near_pairs,
    )

    fx_near = spark.createDataFrame(
        [
            (i, bytearray(base64.b64decode(fx["b64"])), fx["mime"])
            for i, fx in enumerate(PHASH_NEAR_FIXTURES)
        ],
        "k long, blob binary, mime string",
    )
    near_media = (
        big_docs.select("doc_id", (F.col("doc_id") % 4).alias("k"))
        .join(F.broadcast(fx_near), "k")
        .select(
            "doc_id",
            F.struct(
                F.col("blob"), F.col("mime"),
                F.create_map(F.lit("s"), F.lit("smoke")).alias("meta"),
            ).alias("media"),
        )
    )
    cat = perceptual_hash_media(near_media, "doc_id").groupBy("phash").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    run("phash_near_pairs", phash_near_pairs(cat), n_docs)
    if only_ops is None or only_ops & {
        "ann_ivf_kmeans_train", "bpe_train_merges", "knn_brute",
        "knn_ivf", "knn_pq", "profile_table",
        # the section's actual emitted op names (the alias set above is
        # kept for old command lines)
        "ann_brute_topk", "ann_ivf_kmeans_probe", "ann_pq_rerank",
        "dsir_logweights", "multimodal_real_decode",
        "profile_table_expand",
    }:
        ann_profile_smoke(spark, sf_dir, factor, run, only_ops)
    if only_ops is None or only_ops & {
        "ann_ivf_probe_salted", "ann_ivf_recall_salted",
        "lsh_embedding_bucketed", "semdedup_bucketed",
        "phash_band_catalog",
    }:
        embedding_scale_smoke(spark, sf_dir, factor, run, only_ops)
    if only_ops is None or "retry_drain" in only_ops:
        drain_smoke(spark, big_ev, factor, n_ev)
    if only_ops is None or "stream_stream_join" in only_ops:
        stream_join_smoke(spark, big_ev, factor, n_ev)
    if only_ops is None or "stream_outer_join" in only_ops:
        stream_outer_join_smoke(spark, big_ev, factor, n_ev)
    if only_ops is None or "stream_entity_state" in only_ops:
        entity_state_smoke(spark, big_ev, factor, n_ev)
    if only_ops is None or only_ops & {
        "stream_hourly_append", "stream_session_append",
        "stream_sliding_append", "stream_dedup_bounded",
    }:
        stream_append_smoke(spark, big_ev, factor, n_ev)
    spark.stop()


def ann_profile_smoke(
    spark, sf_dir: str, factor: int, run, only_ops=None
) -> None:
    """ANN + profile families (VERDICT r5 #4): brute top-k is
    documented-LINEAR in corpus (broadcast queries, partial top-k per
    partition — the shuffle carries O(partitions·k), never the scored
    pairs); IVF training is ~CONSTANT in corpus (seeded subsample,
    max_train_rows cap) and the probe shuffle is bounded by corpus
    size, not corpus²; the profile Expand is one linear scan with
    map-side partials."""
    from typebus_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        train_centroids_kmeans,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    big_emb = replicate(emb, "vec_id", factor, 10_000_000).persist()
    n_emb = big_emb.count()
    qs = emb.orderBy("vec_id").limit(50).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = big_emb.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("corpus_vec"),
    )
    run("ann_brute_topk", cosine_topk(qs, corpus, k=10), n_emb)

    if only_ops is None or only_ops & {
        "ann_ivf_kmeans_train", "ann_ivf_kmeans_probe", "knn_ivf",
    }:
        t0 = time.perf_counter()
        cents = train_centroids_kmeans(big_emb, "embedding", 16)
        train_wall = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {
                    "op": "ann_ivf_kmeans_train",
                    "factor": factor,
                    "rows_in": n_emb,
                    "rows_out": len(cents),
                    "wall_sec": train_wall,
                    "plan_ok": True,  # subsampled: ~constant in corpus
                }
            ),
            flush=True,
        )
        run(
            "ann_ivf_kmeans_probe",
            ivf_topk(qs, corpus, 10, cents, nprobe=2),
            n_emb,
        )

    # BPE trainer: vocab-bounded — wall is ~flat in corpus size
    # because every round runs on the (word, freq) aggregate.
    # DSIR: documented-linear (one token scan; the LMs are bounded
    # 1024-bucket aggregates).
    from typebus_spark.operators.corpus_stats import dsir_logweights
    from typebus_spark.operators.text_analysis import bpe_train_merges

    nlp_wanted = only_ops is None or only_ops & {
        "bpe_train_merges", "dsir_logweights", "multimodal_real_decode",
    }
    if nlp_wanted:
        docs_tbl = load_table(spark, sf_dir, "documents")
        big_nlp = replicate(
            docs_tbl, "doc_id", factor, 10_000_000
        ).persist()
        n_nlp = big_nlp.count()
    if nlp_wanted and (only_ops is None or "bpe_train_merges" in only_ops):
        t0 = time.perf_counter()
        n_merges = len(bpe_train_merges(big_nlp, "text", n_merges=4))
        print(
            json.dumps(
                {
                    "op": "bpe_train_merges",
                    "factor": factor,
                    "rows_in": n_nlp,
                    "rows_out": n_merges,
                    "wall_sec": round(time.perf_counter() - t0, 2),
                    "plan_ok": True,  # vocab-agg rounds, TakeOrdered
                }
            ),
            flush=True,
        )
    if nlp_wanted:
        run(
            "dsir_logweights",
            dsir_logweights(
                big_nlp, "doc_id", "text",
                target_filter=F.col("source") == "src0",
            ),
            n_nlp,
        )

        # Multimodal REAL decode: per-blob pure-Python codec inside
        # mapInPandas — cost is strictly rows × per-blob decode (no
        # shuffle, no state), so wall must grow ~linearly and the Arrow
        # batch plumbing must hold at factor× the blob count.
        import base64

        from typebus_spark.operators._media_fixtures import MEDIA_FIXTURES
        from typebus_spark.operators.multimodal import decode_media

        fx_df = spark.createDataFrame(
            [
                (i, bytearray(base64.b64decode(fx["b64"])), fx["mime"])
                for i, fx in enumerate(MEDIA_FIXTURES)
            ],
            "k long, blob binary, mime string",
        )
        blobs = (
            big_nlp.select("doc_id", (F.col("doc_id") % 5).alias("k"))
            .join(F.broadcast(fx_df), "k")
            .select(
                "doc_id",
                F.struct(
                    F.col("blob"), F.col("mime"),
                    F.create_map(F.lit("s"), F.lit("smoke")).alias("meta"),
                ).alias("media"),
            )
        )
        run(
            "multimodal_real_decode",
            decode_media(blobs, "doc_id", decoder="real"),
            n_nlp,
        )
        big_nlp.unpersist()

    # PQ: codebook from the BASE corpus prefix (constant in corpus
    # size), ADC over the replicated corpus — linear scan over codes,
    # re-rank touches only |Q|*shortlist raw vectors.
    from typebus_spark.operators.similarity import (
        pq_codebooks,
        pq_topk_rerank,
    )

    books = pq_codebooks(
        emb, "embedding", m=8, k_per_sub=16, seed=7,
        id_col="vec_id", id_prefix=256,
    )
    run(
        "ann_pq_rerank",
        pq_topk_rerank(qs, corpus, 10, books, shortlist=50),
        n_emb,
    )
    big_emb.unpersist()

    li = load_table(spark, sf_dir, "lineitem")
    big_li = replicate(li, "l_orderkey", factor, 1_000_000_000)
    run(
        "profile_table_expand",
        big_li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_orderkey").isNull().cast("long")).alias(
                "ok_nulls"
            ),
            F.countDistinct("l_orderkey").alias("ok_distinct"),
            F.min("l_orderkey").alias("ok_min"),
            F.max("l_orderkey").alias("ok_max"),
            F.countDistinct("l_returnflag").alias("rf_distinct"),
            F.min("l_shipdate").alias("sd_min"),
            F.max("l_quantity").alias("q_max"),
        ),
        lambda: big_li.count(),
        collect_rows=True,
    )


def embedding_scale_smoke(
    spark, sf_dir: str, factor: int, run, only_ops=None
) -> None:
    """SALTED embedding/phash scale rows (r10 verdict #1 — the last
    families without 100x evidence). ann_profile_smoke replicates
    vectors VERBATIM, which is fine for scan-cost ops (brute/IVF/PQ
    probes) but degenerate for bucketed PAIR generators: identical
    replicas pile into the same bucket and the pair output grows
    quadratically in the factor by construction. Here every replica
    gets per-(id, dim) md5 noise (±0.15 per component ≈ the fixture's
    own component scale), so replicas are FRESH content — the realistic
    corpus-growth shape — and bucket granularity scales with the corpus
    the way each operator's docstring prescribes:

    - IVF probe: centroid count fixed, probe cost ∝ corpus·nprobe/k —
      the salted row pins that the probe shuffle tracks the bucket
      fraction, not the corpus square.
    - hyperplane LSH: planes ~ 4 + log2(factor), so expected bucket
      occupancy stays ~constant and pair volume grows ~linearly.
    - SemDeDup: centroids scale 16 → 16·min(factor, 4) — the literal-
      argmin assignment is Janino-bounded at ~O(100) centroids (the r6
      compile-size axis); past that a deployment swaps the assignment
      to a broadcast-join / coarse-IVF route (documented in
      BASELINE.md). The row reports predicted intra-bucket pair volume
      (Σ c·(c−1)/2) so the wall can be read against the arithmetic.
    - phash banding: a synthetic slice-clustered catalog (4 variants
      per slice share a 12-hex-char prefix, slices ~random) grows
      linearly in the factor; the row reports the band-volume
      prediction Σ_{band,value} c·(c−1)/2 — the candidate join is
      exactly that volume (never a cartesian), with random cross-slice
      4-bit band collisions the honest n²/16-flavored tail any
      hamming≤15-complete banding pays on unclustered hashes.
    """
    import math
    import random

    from typebus_spark.operators.dedup import embedding_dup_pairs, semdedup
    from typebus_spark.operators.multimodal import phash_near_pairs
    from typebus_spark.operators.similarity import (
        ivf_topk,
        train_centroids,
        train_centroids_kmeans,
    )

    # every op that reads the salted `big` frame — the replicate+persist
    # +count setup is corpus-sized, so it must not run when only the
    # (big-free) phash catalog op was requested (r11 ADVICE: --only
    # phash_band_catalog was paying the full salted replication)
    _BIG_OPS = {
        "ann_ivf_probe_salted", "ann_ivf_recall_salted",
        "lsh_embedding_bucketed", "semdedup_bucketed",
    }
    big_wanted = only_ops is None or bool(only_ops & _BIG_OPS)
    big = None
    if big_wanted:
        emb = load_table(spark, sf_dir, "embeddings")
        dim = len(emb.select("embedding").first()[0])
        noise = (
            f"zip_with(embedding, transform(sequence(0, {dim - 1}), i -> "
            "cast(cast(conv(substring(md5(concat(cast(vec_id as string), ':',"
            " cast(i as string))), 1, 6), 16, 10) as bigint) % 2001 - 1000 "
            "as float) / 6667.0), (x, y) -> x + y)"
        )
        big = (
            replicate(emb, "vec_id", factor, 10_000_000)
            .withColumn("embedding", F.expr(noise))
            .persist()
        )
        n_emb = big.count()

    ivf_wanted = only_ops is None or bool(only_ops & {
        "ann_ivf_probe_salted", "ann_ivf_recall_salted",
    })
    if ivf_wanted:
        qs = emb.orderBy("vec_id").limit(50).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        corpus = big.select(
            F.col("vec_id").alias("corpus_id"),
            F.col("embedding").alias("corpus_vec"),
        )
        cents = train_centroids_kmeans(big, "embedding", 16)
        run(
            "ann_ivf_probe_salted",
            ivf_topk(qs, corpus, 10, cents, nprobe=2),
            n_emb,
            extra={"n_centroids": 16, "nprobe": 2},
        )
    # quality-at-scale row: recall@10 of the probed IVF vs the exact
    # broadcast brute force on the SAME salted corpus — wall growth is
    # worthless if the approximation quality collapses as the corpus
    # (and thus per-bucket occupancy) grows 100x
    from typebus_spark.operators.similarity import cosine_topk

    if only_ops is None or "ann_ivf_recall_salted" in only_ops:
        import time as _time

        t0 = _time.perf_counter()
        brute = cosine_topk(qs, corpus, k=10).select(
            "query_id", "neighbor_id"
        )
        approx = ivf_topk(qs, corpus, 10, cents, nprobe=2).select(
            "query_id", "neighbor_id"
        )
        hits = brute.join(approx, ["query_id", "neighbor_id"]).count()
        n_q = qs.count()
        print(
            json.dumps(
                {
                    "op": "ann_ivf_recall_salted",
                    "factor": factor,
                    "rows_in": n_emb,
                    "rows_out": hits,
                    "wall_sec": round(_time.perf_counter() - t0, 2),
                    "recall_at_10": round(hits / (10 * n_q), 4),
                    "plan_ok": True,
                }
            ),
            flush=True,
        )

    if only_ops is None or "lsh_embedding_bucketed" in only_ops:
        n_planes = 4 + max(0, round(math.log2(factor)))
        rng = random.Random(42)
        planes = [
            [rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)
        ]
        run(
            "lsh_embedding_bucketed",
            embedding_dup_pairs(
                big, "vec_id", "embedding", threshold=0.3, planes=planes
            ),
            n_emb,
            extra={"n_planes": n_planes},
        )

    # centroid training and the pair-volume aggregate are corpus-sized
    # jobs — gated like the IVF/NLP blocks (r11 ADVICE)
    if only_ops is None or "semdedup_bucketed" in only_ops:
        # bucket occupancy ~n/k: scale k with the corpus (the SemDeDup
        # recipe) up to the literal-argmin Janino budget (~256 centroids)
        k_sem = 16 * min(factor, 16)
        sem_cents = train_centroids(
            big, "embedding", k_sem, seed=7, id_col="vec_id",
            id_prefix=4 * k_sem,
        )
        from typebus_spark.operators.similarity import _nearest_centroid

        vol = (
            big.select(_nearest_centroid("embedding", sem_cents).alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.expr("c * (c - 1) / 2")).cast("long").alias("v"))
            .first()["v"]
        )
        run(
            "semdedup_bucketed",
            semdedup(big, "vec_id", "embedding", sem_cents, threshold=0.3),
            n_emb,
            collect_rows=True,
            extra={"n_centroids": k_sem, "pair_volume": int(vol)},
        )
    if big is not None:
        big.unpersist()

    # phash: slice-clustered synthetic catalog, linear in factor
    n_slices = 10 * factor
    cat = (
        spark.range(n_slices)
        .select(
            F.col("id").alias("s"),
            F.explode(F.expr("sequence(0, 3)")).alias("v"),
        )
        .selectExpr(
            "concat(substring(md5(concat('ph:', cast(s as string))), 1, 12),"
            " substring(md5(concat('ph:', cast(s as string), ':',"
            " cast(v as string))), 1, 4)) AS phash",
            "1L AS n_docs",
        )
        .persist()
    )
    n_cat = cat.count()
    band_vol = (
        cat.select(
            F.explode(F.expr(
                "transform(sequence(0, 15), "
                "i -> struct(i AS bi, substring(phash, i + 1, 1) AS bv))"
            )).alias("b")
        )
        .groupBy("b.bi", "b.bv")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) / 2")).cast("long").alias("v"))
        .first()["v"]
    )
    run(
        "phash_band_catalog",
        phash_near_pairs(cat, max_hamming=15),
        n_cat,
        extra={"band_volume": int(band_vol)},
    )
    cat.unpersist()


def drain_smoke(spark, big_ev, factor: int, rows_in: int) -> None:
    """Retry drain (live router, 3 rounds) on replicated input: wall
    must grow roughly linearly (each round is one routed batch + one
    queue snapshot — no per-round cost that compounds with input size)
    and the round count must stay data-INDEPENDENT (bounded by the
    retry policy, not the row count)."""
    import time

    from pyspark.sql.types import LongType, StructField, StructType

    from typebus_spark.codec.envelope import encode_envelope
    from typebus_spark.registry import BackoffShape, RetryPolicy, Service
    from typebus_spark.runtime import drain_batches
    from typebus_spark.session import ensure_parallelism

    payload = StructType(
        [
            StructField("event_id", LongType()),
            StructField("fail_times", LongType()),
        ]
    )
    svc = Service("retry-smoke")
    svc.declare_type("api.Task", payload)
    svc.declare_type("api.Task.done", payload)

    def handler(df):
        attempt = F.coalesce(
            F.col("meta.extra").getItem("attempt").cast("int"), F.lit(0)
        )
        return df.select(
            "meta",
            "event_id",
            "fail_times",
            F.when(attempt < F.col("fail_times"), F.lit("transient")).alias(
                "_error"
            ),
        )

    svc.register_stream(
        "api.Task",
        "api.Task.done",
        handler,
        retry=RetryPolicy(2, 10.0, BackoffShape.EXPONENTIAL),
    )
    raw = encode_envelope(
        ensure_parallelism(
            big_ev.select(
                "event_id", (F.col("event_id") % 4).alias("fail_times")
            )
        ),
        "api.Task",
    )
    sc = spark.sparkContext
    sc.setJobGroup("drain_smoke", "drain_smoke")
    t0 = time.perf_counter()
    res = drain_batches(svc, raw)
    rows_out = res.union_all().count()
    wall = round(time.perf_counter() - t0, 2)
    sc.setJobGroup("", "")
    jobs = len(sc.statusTracker().getJobIdsForGroup("drain_smoke"))
    print(
        json.dumps(
            {
                "op": "retry_drain",
                "factor": factor,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "wall_sec": wall,
                # jobs = rounds x (route + snapshot + terminal-scan):
                # must not grow with input size
                "jobs": jobs,
                "plan_ok": jobs <= 20,
            }
        ),
        flush=True,
    )


def stream_join_smoke(spark, big_ev, factor: int, rows_in: int) -> None:
    """Stream-stream watermarked join on replicated input: state rows
    must stay bounded by the watermark+interval horizon (eviction is
    derived from event time, not input size — numRowsTotal from the
    state operator is the direct evidence), and wall must grow roughly
    linearly."""
    import tempfile
    import time
    import uuid

    from typebus_spark.session import pinned_shuffle_partitions

    stage = tempfile.mkdtemp(prefix="smoke_ssj_")
    big_ev.select("event_id", "user_id", "event_type", "ts").write.mode(
        "overwrite"
    ).parquet(stage)
    batch = spark.read.parquet(stage)
    t0 = time.perf_counter()
    stream = spark.readStream.schema(batch.schema).parquet(stage)
    p = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            "user_id",
            F.col("ts").cast("timestamp").alias("p_wts"),
        )
        .withWatermark("p_wts", "1 hour")
    )
    v = (
        spark.readStream.schema(batch.schema)
        .parquet(stage)
        .filter(F.col("event_type").isin("view", "click"))
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("ts").cast("timestamp").alias("v_wts"),
        )
        .withWatermark("v_wts", "1 hour")
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("v_wts") >= F.col("p_wts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("v_wts") <= F.col("p_wts")),
        "inner",
    )
    name = f"smoke_ssj_{uuid.uuid4().hex[:8]}"
    with pinned_shuffle_partitions(spark, 8):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(600)
    rows_out = spark.table(name).count()
    wall = round(time.perf_counter() - t0, 2)
    state_rows = None
    prog = q.lastProgress
    if prog and prog.get("stateOperators"):
        state_rows = prog["stateOperators"][0].get("numRowsTotal")
    print(
        json.dumps(
            {
                "op": "stream_stream_join",
                "factor": factor,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "wall_sec": wall,
                "state_rows": state_rows,
                "plan_ok": state_rows is not None,
            }
        ),
        flush=True,
    )


def stream_outer_join_smoke(
    spark, big_ev, factor: int, rows_in: int
) -> None:
    """Stream-stream LEFT OUTER watermarked join at scale (r12 verdict
    item 4): the eviction-driven-output shape. The 100 TB claim: state
    is bounded by the event-time horizon (watermark + range interval)
    — replication keeps the SAME time range, so end-of-replay state
    grows with per-horizon row DENSITY (linear in factor) but is
    INDEPENDENT of history length; the trailing no-data batch (which
    this shape must keep — its output comes from eviction) stays a
    constant number of batches at any factor."""
    import tempfile
    import time
    import uuid

    from typebus_spark.session import pinned_shuffle_partitions

    stage = tempfile.mkdtemp(prefix="smoke_soj_")
    big_ev.select("event_id", "user_id", "event_type", "ts").write.mode(
        "overwrite"
    ).parquet(stage)
    batch = spark.read.parquet(stage)
    t0 = time.perf_counter()

    def src_():
        return spark.readStream.schema(batch.schema).parquet(stage)

    p = (
        src_()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            "user_id",
            F.col("ts").cast("timestamp").alias("p_wts"),
        )
        .withWatermark("p_wts", "1 hour")
    )
    v = (
        src_()
        .filter(F.col("event_type").isin("view", "click"))
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("ts").cast("timestamp").alias("v_wts"),
        )
        .withWatermark("v_wts", "1 hour")
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("v_wts") >= F.col("p_wts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("v_wts") <= F.col("p_wts")),
        "left_outer",
    )
    name = f"smoke_soj_{uuid.uuid4().hex[:8]}"
    with pinned_shuffle_partitions(spark, 8):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(1200)
    rows_out = spark.table(name).count()
    wall = round(time.perf_counter() - t0, 2)
    state_rows = n_batches = None
    prog = q.lastProgress
    if prog and prog.get("stateOperators"):
        state_rows = prog["stateOperators"][0].get("numRowsTotal")
        n_batches = prog.get("batchId")
    print(
        json.dumps(
            {
                "op": "stream_outer_join",
                "factor": factor,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "wall_sec": wall,
                "state_rows": state_rows,
                "last_batch_id": n_batches,
                "plan_ok": state_rows is not None,
            }
        ),
        flush=True,
    )


def entity_state_smoke(spark, big_ev, factor: int, rows_in: int) -> None:
    """applyInPandasWithState per-key fold at scale (r12 verdict item
    4): replication multiplies EVENTS but keeps the user_id key set,
    so the 100 TB claim under test is exact — state rows equal the
    DISTINCT-KEY count at every factor, never the input row count.
    PANDAS_STATE_PARTITIONS pins the swept python-worker parallelism
    (override with SMOKE_PANDAS_STATE_PARTITIONS to re-sweep at
    scale)."""
    import os as _os
    import tempfile
    import time
    import uuid

    from typebus_spark.queries.dataflow import PANDAS_STATE_PARTITIONS
    from typebus_spark.session import pinned_shuffle_partitions
    from typebus_spark.streaming.entity import streaming_fold_last

    parts = int(
        _os.environ.get(
            "SMOKE_PANDAS_STATE_PARTITIONS", PANDAS_STATE_PARTITIONS
        )
    )
    stage = tempfile.mkdtemp(prefix="smoke_ent_")
    cols = ["user_id", "ts", "event_id", "event_type", "value"]
    big_ev.select(*cols).write.mode("overwrite").parquet(stage)
    batch = spark.read.parquet(stage)
    n_keys = batch.select("user_id").distinct().count()
    t0 = time.perf_counter()
    stream = spark.readStream.schema(batch.schema).parquet(stage)
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in stream.schema.fields
    )
    state = streaming_fold_last(
        stream, "user_id", "ts", ddl, tiebreak=["event_id"]
    )
    name = f"smoke_ent_{uuid.uuid4().hex[:8]}"
    with pinned_shuffle_partitions(spark, parts):
        q = (
            state.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(1200)
    rows_out = spark.table(name).count()
    wall = round(time.perf_counter() - t0, 2)
    state_rows = None
    prog = q.lastProgress
    if prog and prog.get("stateOperators"):
        state_rows = prog["stateOperators"][0].get("numRowsTotal")
    print(
        json.dumps(
            {
                "op": "stream_entity_state",
                "factor": factor,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "n_keys": n_keys,
                "wall_sec": wall,
                "state_rows": state_rows,
                "state_partitions": parts,
                "plan_ok": state_rows == n_keys,
            }
        ),
        flush=True,
    )


def stream_append_smoke(spark, big_ev, factor: int, rows_in: int) -> None:
    """Append+watermark streaming state at scale (VERDICT r8 #2): the
    replicated events keep the SAME time range (ids shift, timestamps
    do not), so windows-per-hour is constant and rows-per-window grows
    with the factor. The 100 TB claims under test: (a) window-agg
    state after the trailing no-data batch tracks the OPEN watermark
    horizon (same numRowsTotal at 1x and Nx — eviction is event-time
    driven, input-size independent); (b) dropDuplicatesWithinWatermark
    state tracks the DISTINCT-KEY set inside the horizon, not the
    input row count. Set SMOKE_STATE_PARTITIONS to sweep the
    STREAM_STATE_PARTITIONS pin at scale (VERDICT r8 #6)."""
    import os
    import tempfile
    import time
    import uuid

    from typebus_spark.queries.dataflow import STREAM_STATE_PARTITIONS
    from typebus_spark.session import (
        no_data_microbatches_disabled,
        pinned_shuffle_partitions,
    )

    parts = int(
        os.environ.get("SMOKE_STATE_PARTITIONS", STREAM_STATE_PARTITIONS)
    )
    stage = tempfile.mkdtemp(prefix="smoke_append_")
    big_ev.select("event_id", "user_id", "event_type", "ts", "value").write.mode(
        "overwrite"
    ).parquet(stage)
    batch = spark.read.parquet(stage)

    def wsrc():
        return (
            spark.readStream.schema(batch.schema)
            .parquet(stage)
            .withColumn(
                "wts",
                F.expr(
                    "to_utc_timestamp(cast(ts as timestamp), "
                    "current_timezone())"
                ),
            )
            .withWatermark("wts", "1 hour")
        )

    def run_stream(op, out, needs_no_data: bool):
        name = f"smoke_ap_{uuid.uuid4().hex[:8]}"
        t0 = time.perf_counter()
        import contextlib

        ctx = (
            contextlib.nullcontext()
            if needs_no_data
            else no_data_microbatches_disabled(spark)
        )
        with pinned_shuffle_partitions(spark, parts), ctx:
            q = (
                out.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
        q.awaitTermination(600)
        rows_out = spark.table(name).count()
        wall = round(time.perf_counter() - t0, 2)
        state_rows = None
        prog = q.lastProgress
        if prog and prog.get("stateOperators"):
            state_rows = prog["stateOperators"][0].get("numRowsTotal")
        print(
            json.dumps(
                {
                    "op": op,
                    "factor": factor,
                    "rows_in": rows_in,
                    "rows_out": rows_out,
                    "wall_sec": wall,
                    "state_rows": state_rows,
                    "state_partitions": parts,
                    "plan_ok": state_rows is not None,
                }
            ),
            flush=True,
        )

    agg = (
        wsrc()
        .groupBy(F.window("wts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("hour_start"), "n_events")
    )
    run_stream("stream_hourly_append", agg, needs_no_data=True)

    sess = (
        wsrc()
        .groupBy("user_id", F.session_window("wts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    run_stream("stream_session_append", sess, needs_no_data=True)

    slide = (
        wsrc()
        .groupBy(F.window("wts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "n_events")
    )
    run_stream("stream_sliding_append", slide, needs_no_data=True)

    dd = (
        wsrc()
        .select("user_id", "event_type", "wts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    run_stream("stream_dedup_bounded", dd, needs_no_data=False)


if __name__ == "__main__":
    main()
