"""End-to-end training-data pipeline on the engine, composed from the
same operators the inventory queries exercise:

    python examples/llm_pipeline.py [sf_dir]

Stages (each one the operator a 100 TB pipeline would run, at toy SF):
  0. URL/domain curation   (operators.url_curation — normalize, exact
                            URL dedup, registrable-domain blocklist +
                            per-domain caps; the C4/RefinedWeb web step)
  1. quality filter        (operators.text_analysis.quality_score)
  1b. Gopher rule gate     (operators.text_analysis.gopher_rules)
  1d. repetition gate      (operators.text_analysis.
                            repetition_fractions — Gopher n-gram
                            char-fraction rules)
  1e. temperature mix plan (operators.mixing.temperature_mix —
                            alpha=1/2 per-language sampling rates)
  1c. language gate        (operators.text_analysis.lang_id_ngram,
                            frozen char-3-gram profiles)
  2. model-based filter    (operators.text_analysis.linear_classifier)
  2b. DSIR importance      (operators.corpus_stats.dsir_logweights)
  3. PII/term redaction    (functions.text.redact)
  4. exact dedup           (operators.dedup.exact_dedup)
  5. near-dup removal      (operators.dedup.minhash_lsh_pairs)
  6. duplicate clustering  (operators.clustering.connected_components)
  7. span-level cleanup    (operators.dedup.dedup_spans)
  7c. exact-substring dedup (operators.dedup.dedup_substrings —
                            content-defined chunks, offset-invariant)
  7b. perplexity tiering   (operators.corpus_stats.perplexity_buckets
                            + per-tier importance sampling)
  8. leakage-safe split    (clusters + operators.sampling.hash_split —
                            near-dup families never straddle splits)
  9. sequence packing      (operators.mixing.pack_sequences)
  9b. overlapping chunking (operators.text_analysis.chunk_tokens)
  9c. tokenizer induction  (operators.text_analysis.bpe_train_merges
                            on the train split)
  9d. tokenizer apply      (operators.text_analysis.
                            bpe_encode_token_counts — per-doc BPE
                            token counts for the budget planner)
 10. embedding side: int8 quantization + SemDeDup + topic-balanced
     resampling + two-stage PQ ANN
     (functions.vector.int8_quantize, operators.dedup.semdedup,
      operators.sampling.rebalance_thresholds,
      operators.similarity.pq_topk_rerank)
 11. shard shuffle         (operators.sampling.shard_shuffle —
                            deterministic training order + shards)
 12. multimodal sidebar    (real stdlib PNG decode + perceptual-hash
                            dedup, operators.codecs / multimodal)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from typebus_spark import get_spark
from typebus_spark.functions.text import redact
from typebus_spark.functions.vector import int8_quantize
from typebus_spark.operators.clustering import connected_components
from typebus_spark.operators.dedup import (
    dedup_spans,
    exact_dedup,
    minhash_lsh_pairs,
    semdedup,
)
from typebus_spark.operators.mixing import pack_sequences
from typebus_spark.operators.sampling import hash_split
from typebus_spark.operators.similarity import train_centroids
from typebus_spark.operators.text_analysis import (
    linear_classifier,
    quality_score,
)
from typebus_spark.session import load_table


PLAN_NODE_BUDGET = 1200


def _plan_nodes(jplan, cap: int = PLAN_NODE_BUDGET) -> int:
    """Logical-plan node count with an early-abort cap — the
    lineage-depth pin (r11: gate self-joins duplicated the gated
    subtree 2^stages; the OOM fired while merely RENDERING the plan
    string, so the guard must never render — it walks children() and
    stops counting at the cap instead)."""
    n, stack = 0, [jplan]
    while stack:
        p = stack.pop()
        n += 1
        if n > cap:
            return n
        ch = p.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return n


def main() -> None:
    import json as _json
    import resource
    import time as _time

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    t_start = _time.time()
    spark = get_spark(app_name="llm-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    stage_nodes: dict[str, int] = {}

    def guard(df, stage: str):
        """Record the stage's logical-plan node count and REFUSE past
        the budget (no render — see _plan_nodes). Composition smokes
        catch cross-stage lineage explosions single-operator smokes
        cannot (the r11 OOM was found exactly this way)."""
        nodes = _plan_nodes(df._jdf.queryExecution().logical())
        stage_nodes[stage] = nodes
        if nodes > PLAN_NODE_BUDGET:
            raise RuntimeError(
                f"stage {stage}: logical plan exceeds "
                f"{PLAN_NODE_BUDGET} nodes — lineage explosion; add a "
                "localCheckpoint/persist barrier upstream"
            )
        return df

    docs = load_table(spark, sf_dir, "documents")
    if factor > 1:
        # salted corpus-growth replication (the scale_smoke --salted
        # idea, adapted for a FULL pipeline): fresh ids per replica
        # slice; slice > 0 tokens are rewritten to OTHER corpus words
        # keyed on (token, slice) — "vocabulary rotation". Unlike a
        # character suffix (which shifts the char-3-gram distribution
        # and the langid gate then drops every replica — observed: 5000
        # raw -> 0 clean), rotation keeps the text English-shaped for
        # every downstream gate, PRESERVES within-slice near-dup
        # structure (two docs sharing a phrase share its rewrite), and
        # breaks cross-slice matches (same phrase maps differently per
        # slice) — so the dup RATE stays constant as the corpus grows.
        voc = (
            "array('key','agg','row','scan','slow','fast','table',"
            "'value','part','hash','merge','batch','spark','window',"
            "'order','data','column','join','small','line','customer',"
            "'query','the','big','vector','group','filter','plan',"
            "'index','cache','stage','task','shuffle','broadcast',"
            "'sort','limit','count','range','split','token')"
        )
        docs = docs.withColumn(
            "_r", F.explode(F.expr(f"sequence(0, {factor - 1})"))
        ).withColumn(
            "doc_id",
            F.col("doc_id") + F.col("_r").cast("long") * F.lit(10_000_000),
        ).drop("_r")
        docs = docs.withColumn(
            "text",
            F.expr(
                "CASE WHEN doc_id < 10000000 THEN text ELSE "
                f"array_join(transform(split(text, ' '), t -> element_at({voc}, "
                "cast(conv(substring(md5(concat(t, ':', cast(doc_id div "
                "10000000 as string))), 1, 6), 16, 10) % 40 as int) + 1"
                ")), ' ') END"
            ),
        ).persist()
    n0 = docs.count()

    # -1: HTML → text extraction (round 12) — the step BEFORE every
    # quality filter on real crawl data: wrap each doc in an HTML page
    # (the fixtures are already clean text), drop boilerplate lines by
    # link density, extract visible text. Pure expression chain —
    # stays in the scan-side projection, no shuffle. The wrapper here
    # deliberately adds NO shared visible residue (q_extract_text's
    # richer template does, per-doc-checked there): a template phrase
    # repeated into EVERY document manufactures cross-doc near-dup
    # structure and sends the downstream minhash/CC/substring stages
    # quadratic — a 490 s Catalyst burn found by this very smoke.
    # Extraction must be content-identity on an already-clean corpus.
    from typebus_spark.operators.html_extract import (
        drop_boilerplate_sql,
        extract_text_sql,
    )

    page = (
        "concat('<html><head><style>p > a</style>"
        "<script>if (1 < 2 && 2 > 1) go();</script></head>', chr(10), "
        "'<body><div class=\"nav\"><a href=\"/\">Home</a> "
        "<a href=\"/about\">About</a></div>', chr(10), "
        "'<p>', text, '</p>', chr(10), '</body></html>')"
    )
    extracted = extract_text_sql(
        drop_boilerplate_sql(page, "spark"), "spark"
    )
    docs = docs.selectExpr(
        "doc_id", f"{extracted} AS text", "lang", "source", "n_chars"
    )
    # the extraction expression is a WIDE subtree on the corpus leaf;
    # every downstream gate self-joins docs, which would duplicate it
    # 2^stages times (the r11 plan-TREE explosion) — cut lineage here
    docs = docs.localCheckpoint(eager=False)
    docs = guard(docs, "extract")

    # 0: URL/domain curation (round 11) — normalize the (synthetic)
    # crawl URL, dedup exact URLs, gate blocklisted registrable domains
    # and cap docs per domain; the per-doc survivors gate the corpus
    from typebus_spark.operators.url_curation import (
        domain_caps,
        exact_url_dedup,
    )
    # doc-UNIQUE path component (8 hex chars), unlike q_domain_caps's
    # 3-value path axis: that axis exists for a closed-form oracle, but
    # it caps the whole corpus at ~150 distinct URLs — under
    # replication, exact-URL dedup then flattens every added replica
    # and the smoke stops exercising anything downstream
    pipe_url = (
        "concat('https://', CASE WHEN doc_id % 2 = 0 THEN 'www.' "
        "ELSE '' END, source, '.', element_at(array('com', 'org', "
        "'co.uk', 'github.io', 'net'), cast(doc_id % 5 as int) + 1), "
        "'/p/', substring(md5(concat('u:', cast(doc_id as string))), "
        "1, 8))"
    )
    with_url = docs.selectExpr("doc_id", pipe_url + " AS url")
    url_canon = exact_url_dedup(with_url, "url", "doc_id")
    # lazy checkpoint cuts the lineage: every downstream gate self-joins
    # docs, which would otherwise duplicate the url-curation subtree
    # (synth expr + window + aggregates) per stage — the plan TREE, not
    # the data, is what explodes (2^stages copies by stage 4's persist)
    url_kept = (
        domain_caps(
            # cap scales with the replication factor: the synthetic
            # corpus has a FIXED ~25-domain universe, so a constant cap
            # would throttle every added replica at this gate and
            # starve the downstream stages the smoke exists to stress
            # (at 10x, 4406 of 5000 died here) — a real crawl's domain
            # count grows with the corpus instead
            url_canon, "url", "doc_id", cap=50 * factor,
            blocklist=("src0.com",)
        )
        .select("doc_id")
        .localCheckpoint(eager=False)
    )
    n_url_dropped = n0 - url_kept.count()
    docs = guard(docs.join(url_kept, "doc_id"), "url_curation")

    # 1: heuristic quality gate
    q = quality_score(docs, "doc_id", "text").filter(
        F.col("quality_score") >= 0.6
    )
    docs = docs.join(q.select("doc_id"), "doc_id")

    # 1b: Gopher rule gate — keep survivors, report which rules fire
    from typebus_spark.operators.text_analysis import gopher_rules

    flags = gopher_rules(docs, "doc_id", "text")
    n_rule_drops = flags.filter(F.col("keep") == 0).count()
    docs = guard(docs.join(
        flags.filter(F.col("keep") == 1).select("doc_id"), "doc_id"
    ), "gopher")

    # 1d: n-gram repetition gate (round 10) — drop boilerplate-phrase
    # docs (chars in most-frequent 2-gram / duplicated 3-grams)
    from typebus_spark.operators.text_analysis import repetition_fractions

    rep = repetition_fractions(docs, "doc_id", "text")
    n_rep_drops = rep.filter(F.col("keep") == 0).count()
    docs = docs.join(
        rep.filter(F.col("keep") == 1).select("doc_id"), "doc_id"
    )

    # 1e: multilingual mixture plan (round 10) — alpha=1/2 temperature
    # sampling rates per language on the still-multilingual corpus (the
    # alternative to the hard en gate below when training multilingual:
    # upweights low-resource languages, caps tiny ones at keep-all)
    from typebus_spark.operators.mixing import temperature_mix

    tmix_rows = temperature_mix(
        docs.select("doc_id", "lang"), "doc_id", "lang",
        budget=max(1, docs.count() * 3 // 4),
    ).orderBy("lang").collect()

    # 1c: statistical language gate (round 9) — frozen char-3-gram
    # profiles, keep docs the classifier calls English
    from typebus_spark.operators.text_analysis import (
        lang_id_ngram,
        langid_frozen_profile,
    )

    lang = lang_id_ngram(
        docs, "doc_id", "text", profile=langid_frozen_profile(spark)
    )
    n_lang_drops = lang.filter(F.col("pred_lang") != "en").count()
    docs = guard(docs.join(
        lang.filter(F.col("pred_lang") == "en").select("doc_id"), "doc_id"
    ), "langid")

    # 2: model-based gate (distilled linear head, weights as literals)
    toks = F.split(F.trim("text"), r"\s+")
    logit = linear_classifier(
        [
            (F.size(toks) / F.lit(100.0), 0.8),
            (F.size(F.array_distinct(toks)) / F.size(toks), 1.5),
        ],
        bias=-1.2,
    )
    docs = docs.filter(logit >= -2.0)

    # 2b: DSIR importance weights toward the src0 target domain —
    # exact BIGINT nano-unit weights, rankable/thresholdable downstream
    from typebus_spark.operators.corpus_stats import dsir_logweights

    dsir = dsir_logweights(
        docs, "doc_id", "text", target_filter=(F.col("source") == "src0")
    )

    # 3: scrub
    red, n_red = redact("text", [r"\bspark\b"])
    docs = docs.select(
        "doc_id", red.alias("text"), "lang", "source", n_red.alias("n_red")
    )

    # 4: exact dedup — keep canonical ids only
    canon = exact_dedup(docs, "doc_id", "text").select(
        F.col("canonical_id").alias("doc_id")
    )
    # checkpoint, not persist: a dozen downstream gates self-join this
    # frame — the data cache alone leaves the logical subtree growing
    # 2^stages (the guard below tripped >1200 nodes at substr_dedup
    # before this cut); the checkpoint is materialized by the stage-4b
    # index build anyway
    docs = guard(
        docs.join(canon, "doc_id").localCheckpoint(eager=False),
        "exact_dedup",
    )

    # 4b: INCREMENTAL ingest against stored indexes (round 10) — the
    # shape a production corpus actually runs per batch: the corpus's
    # content-hash + shingle index tables are BUILT ONCE
    # (build_exact_index; stored tables in deployment, appended per
    # admitted batch) and each new batch is admitted via index probes —
    # the corpus is never re-hashed. Here the newest-id slice plays the
    # incoming batch.
    from typebus_spark.operators.dedup import (
        build_exact_index,
        incremental_dedup,
    )

    corpus_idx = build_exact_index(
        docs.filter(F.col("doc_id") % 7 != 0), "doc_id", "text"
    )
    admitted = incremental_dedup(
        docs.filter(F.col("doc_id") % 7 == 0),
        docs.filter(F.col("doc_id") % 7 != 0),
        "doc_id",
        "text",
        corpus_index=corpus_idx,
    )
    ingest_tally = {
        r["admit_reason"]: r["n"]
        for r in admitted.groupBy("admit_reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # 5-6: near-dup pairs → connected clusters → keep cluster minimum
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    clusters = connected_components(pairs, "a", "b")
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    docs = docs.join(losers, "doc_id", "left_anti")

    # 7: span-level cleanup of what survives
    cleaned = dedup_spans(docs, "doc_id", "text")
    docs = docs.drop("text").join(
        cleaned.select("doc_id", F.col("cleaned_text").alias("text")),
        "doc_id",
    ).localCheckpoint(eager=False)  # second barrier: span text rewrite

    # 7c: exact-substring cleanup (round 9) — content-defined chunking
    # catches arbitrary-offset repeated spans the fixed grid missed
    from typebus_spark.operators.dedup import dedup_substrings

    sub = dedup_substrings(docs, "doc_id", "text")
    n_substr_cut = int(
        sub.agg(F.sum("n_removed")).collect()[0][0] or 0
    )
    docs = guard(docs.drop("text").join(
        sub.select("doc_id", F.col("cleaned_text").alias("text")),
        "doc_id",
    ), "substr_dedup")

    # 7b: perplexity tiering + per-tier curated sampling (head kept,
    # middle halved, tail decimated — the CCNet-style recipe)
    from typebus_spark.operators.corpus_stats import perplexity_buckets
    from typebus_spark.operators.sampling import weighted_sample

    tiers = perplexity_buckets(docs, "doc_id", "text")
    rate = (
        F.when(F.col("tier") == "head", 10000)
        .when(F.col("tier") == "middle", 5000)
        .otherwise(1000)
        .cast("long")
    )
    curated = weighted_sample(
        tiers.withColumn("sample_thr", rate), "doc_id", "sample_thr", seed=13
    ).select("doc_id")
    docs = guard(docs.join(curated, "doc_id"), "curated")

    # 8-9: LEAKAGE-SAFE deterministic split (key on the near-dup
    # family, not the doc — no duplicate family straddles train/test),
    # then pack the train split
    fam = docs.select("doc_id").join(clusters, "doc_id", "left_outer").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("family"),
    )
    split = hash_split(
        fam, "family", {"train": 0.9, "val": 0.05, "test": 0.05}, seed=42
    ).join(docs, "doc_id")
    train = split.filter(F.col("split") == "train").withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), r"\s+"))
    )
    packed = guard(
        pack_sequences(train, "doc_id", "n_tokens", max_tokens=512),
        "packed",
    )

    # 9c: tokenizer induction on the train split — the merge table a
    # production tokenizer ships with (one driver row per round)
    from typebus_spark.operators.text_analysis import bpe_train_merges

    merges = bpe_train_merges(train, "text", n_merges=3)

    # 9d: tokenizer APPLY (round 9) — encode the train split with the
    # merges just learned; the per-doc BPE token counts are what the
    # token-budget planner consumes
    from typebus_spark.operators.text_analysis import (
        bpe_encode_token_counts,
    )

    enc = bpe_encode_token_counts(
        train, "doc_id", "text", [p for _, p, _ in merges]
    )
    bpe_row = enc.agg(
        F.sum("n_tokens").alias("t"),
        F.round(F.avg("chars_per_token"), 3).alias("cpt"),
    ).collect()[0]

    # 9b: retrieval-side prep — overlapping token-window chunks of the
    # clean corpus (RAG indexing / eval slices)
    from typebus_spark.operators.text_analysis import chunk_tokens

    chunks = chunk_tokens(docs, "doc_id", "text", window=128, stride=96)

    # 10: embedding side — aggregate over the quantized struct so the
    # quantization expression actually executes (a bare count would let
    # Catalyst prune it away)
    emb = load_table(spark, sf_dir, "embeddings")
    if factor > 1:
        dim = len(emb.select("embedding").first()[0])
        emb = emb.withColumn(
            "_r", F.explode(F.expr(f"sequence(0, {factor - 1})"))
        ).withColumn(
            "vec_id",
            F.col("vec_id") + F.col("_r").cast("long") * F.lit(10_000_000),
        ).drop("_r").withColumn(
            "embedding",
            F.expr(
                f"zip_with(embedding, transform(sequence(0, {dim - 1}), "
                "i -> cast(cast(conv(substring(md5(concat(cast(vec_id as "
                "string), ':', cast(i as string))), 1, 6), 16, 10) as "
                "bigint) % 2001 - 1000 as float) / 6667.0), "
                "(x, y) -> x + y)"
            ),
        ).persist()
    qrow = (
        emb.select(int8_quantize("embedding").alias("q8"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.col("q8.scale")), 4).alias("avg_scale"),
        )
        .collect()[0]
    )
    qstats = f"{qrow['n']} (avg int8 scale {qrow['avg_scale']})"
    cen = train_centroids(
        emb, "embedding", n_centroids=4, seed=42, id_col="vec_id"
    )
    sd = semdedup(emb, "vec_id", "embedding", cen, threshold=0.3)
    kept_vec = sd.agg(F.sum("n_kept")).collect()[0][0]

    # 10b: topic-balanced embedding resample + PQ ANN over survivors
    from typebus_spark.operators.sampling import (
        rebalance_thresholds,
        weighted_sample as _wsample,
    )
    from typebus_spark.operators.similarity import (
        _nearest_centroid,
        pq_codebooks,
        pq_topk_rerank,
    )

    topics = emb.select(
        "vec_id", _nearest_centroid("embedding", cen).cast("long").alias("topic")
    )
    thr = rebalance_thresholds(topics, "topic")
    balanced = _wsample(
        topics.join(F.broadcast(thr.select("topic", "sample_thr")), "topic"),
        "vec_id", "sample_thr", seed=7,
    )
    books = pq_codebooks(
        emb, "embedding", m=8, k_per_sub=16, seed=7,
        id_col="vec_id", id_prefix=256,
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    nn = pq_topk_rerank(
        queries,
        emb.select(F.col("vec_id").alias("corpus_id"),
                   F.col("embedding").alias("corpus_vec")),
        k=3, books=books, shortlist=25,
    )

    # 11: deterministic shard shuffle — the last step before writing
    # training shards (round 8): pseudo-random shard + reproducible
    # within-shard order, pure function of (seed, id)
    from typebus_spark.operators.sampling import shard_shuffle

    shards = shard_shuffle(docs.select("doc_id"), "doc_id", n_shards=4)
    n_shards_used = shards.select("shard").distinct().count()

    # 12: multimodal sidebar (round 8) — REAL stdlib PNG decode +
    # perceptual-hash dedup over the frozen fixture blobs
    import base64

    from typebus_spark.operators._media_fixtures import MEDIA_FIXTURES
    from typebus_spark.operators.multimodal import (
        decode_media,
        perceptual_hash_media,
    )

    pngs = [fx for fx in MEDIA_FIXTURES if fx["mime"] == "image/png"]
    fx_df = spark.createDataFrame(
        [(i, bytearray(base64.b64decode(fx["b64"])), fx["mime"])
         for i, fx in enumerate(pngs)],
        "k long, blob binary, mime string",
    )
    media = (
        docs.select("doc_id", (F.col("doc_id") % 3).alias("k"))
        .join(F.broadcast(fx_df), "k")
        .select(
            "doc_id",
            F.struct(
                F.col("blob"), F.col("mime"),
                F.create_map(F.lit("s"), F.lit("ex")).alias("meta"),
            ).alias("media"),
        )
    )
    decoded = decode_media(media, "doc_id", decoder="real")
    n_decoded = decoded.filter(F.col("decode_error").isNull()).count()
    n_pgroups = (
        perceptual_hash_media(media, "doc_id").select("phash").distinct().count()
    )

    n_clean = docs.count()
    n_seq = (
        packed.groupBy("shard")
        .agg(F.max("end_seq").alias("m"))
        .agg(F.sum(F.col("m") + 1))
        .collect()[0][0]
    )
    print(f"documents: {n0} raw -> {n_clean} clean"
          f" ({n_rule_drops} dropped by Gopher rules)")
    print(f"url curation: {n_url_dropped} dropped"
          " (url dupes + src0.com blocklist + domain caps)")
    top_dsir = dsir.orderBy(F.col("logweight").desc()).limit(1).collect()[0]
    print(f"most src0-like doc by DSIR: {top_dsir['doc_id']}"
          f" (logweight {top_dsir['logweight']})")
    print(f"repetition gate: {n_rep_drops} boilerplate docs dropped")
    print("temperature mix (alpha=1/2): "
          + ", ".join(f"{r['lang']}={r['rate']}" for r in tmix_rows))
    print(f"language gate: {n_lang_drops} non-en dropped;"
          f" substring dedup cut {n_substr_cut} chunks")
    print(f"BPE merges learned on train: {[p for _, p, _ in merges]}")
    print(f"BPE-encoded train split: {bpe_row['t']} tokens"
          f" ({bpe_row['cpt']} chars/token)")
    print(f"train sequences packed (512 tok): {n_seq}")
    print(f"retrieval chunks (128/96 overlap): {chunks.count()}")
    print(f"embeddings: {qstats} quantized to int8, {kept_vec} kept after SemDeDup")
    print(f"topic-balanced sample: {balanced.count()} of {emb.count()} vectors")
    print(f"PQ ANN (shortlist 25 -> exact top-3): {nn.count()} neighbor rows")
    print(f"shard shuffle: {n_shards_used} shards, deterministic order")
    print(f"multimodal: {n_decoded} real PNG decodes,"
          f" {n_pgroups} perceptual-hash groups")
    print(f"incremental ingest vs stored index: {ingest_tally}")
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    print(_json.dumps({
        "pipeline_smoke": {
            "sf_dir": sf_dir,
            "factor": factor,
            "wall_sec": round(_time.time() - t_start, 1),
            "n_raw": n0,
            "n_clean": n_clean,
            "peak_py_rss_mb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
            ),
            "jvm_used_mb": round(
                (rt.totalMemory() - rt.freeMemory()) / 1e6
            ),
            "plan_node_budget": PLAN_NODE_BUDGET,
            "max_stage_nodes": max(stage_nodes.values()),
            "stage_nodes": stage_nodes,
        }
    }))
    spark.stop()


if __name__ == "__main__":
    main()
