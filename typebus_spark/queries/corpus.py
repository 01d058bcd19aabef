"""Corpus-curation inventory queries: contamination, boilerplate,
repetition — the checks between dedup and training, each oracle-checked
against DuckDB over the same parquet."""

from __future__ import annotations

import pyspark.sql.functions as F

from typebus_spark.operators.corpus_stats import (
    contamination_report,
    source_overlap,
    repetition_stats,
    token_entropy,
    top_ngrams,
    vocab_topk,
)
from typebus_spark.operators.text_analysis import STOPWORDS, gopher_rules
from typebus_spark.operators.mixing import (
    pack_sequences,
    stratified_sample,
    token_budget_mix,
)
from typebus_spark.operators.sampling import hash_split, reservoir_per_group
from typebus_spark.queries.text import TOKS, _shingles_sql, _sql_list
from typebus_spark.suite import query, t

# The 90/5/5 hash split of q_corpus_split, as oracle SQL (same md5
# bucket scheme — see operators/sampling.py for the engine-portability
# argument).
_SPLIT_SQL = f"""
SELECT doc_id, text, {TOKS} AS toks,
       CASE WHEN bucket < 9000 THEN 'train'
            WHEN bucket < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, text,
             (('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))
                ::BIGINT % 10000) AS bucket
      FROM documents)
"""


@query(
    "q_contamination",
    oracle=f"""
WITH lab AS ({_SPLIT_SQL}),
sh AS (SELECT DISTINCT doc_id, split,
              unnest(list_distinct({_shingles_sql(8)})) AS shingle
       FROM lab WHERE split IN ('train', 'test')),
hits AS (SELECT tr.doc_id AS train_doc_id, te.doc_id AS test_doc_id,
                count(*) AS shared
         FROM sh tr JOIN sh te ON tr.shingle = te.shingle
         WHERE tr.split = 'train' AND te.split = 'test'
         GROUP BY 1, 2)
SELECT train_doc_id,
       CAST(count(*) AS BIGINT) AS n_test_docs,
       CAST(max(shared) AS BIGINT) AS max_shared,
       CAST(sum(shared) AS BIGINT) AS total_shared
FROM hits
GROUP BY train_doc_id
""",
    doc=(
        "Train/test contamination check over the deterministic hash "
        "split: train docs sharing verbatim 8-gram shingles with any "
        "held-out doc, via the inverted shingle-index join (one shuffle "
        "on the shingle key — never |train| x |test|)."
    ),
)
def q_contamination(spark, sf_dir):
    docs = hash_split(
        t(spark, sf_dir, "documents"),
        "doc_id",
        {"train": 0.90, "val": 0.05, "test": 0.05},
        seed=42,
    )
    return contamination_report(docs, "doc_id", "text", shingle_n=8)


@query(
    "q_ngram_boilerplate",
    oracle=f"""
WITH tt AS (SELECT doc_id, {TOKS} AS toks FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_distinct({_shingles_sql(5)})) AS shingle
       FROM tt)
SELECT shingle, CAST(count(*) AS BIGINT) AS doc_freq
FROM sh
GROUP BY shingle
ORDER BY doc_freq DESC, shingle
LIMIT 20
""",
    doc=(
        "Boilerplate scan: top-20 word 5-grams by document frequency — "
        "explode + one shuffle, global top-k as TakeOrdered (no "
        "cluster-wide sort); deterministic (doc_freq, shingle) "
        "tie-break."
    ),
)
def q_ngram_boilerplate(spark, sf_dir):
    return top_ngrams(t(spark, sf_dir, "documents"), "doc_id", "text", n=5, k=20)


_BUCKET_SQL = (
    "(('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 15))"
    "::BIGINT % 10000)"
)


@query(
    "q_stratified_sample",
    oracle=f"""
SELECT doc_id, source
FROM documents
WHERE {_BUCKET_SQL.format(seed=42)} <
      CASE source WHEN 'src0' THEN 10000
                  WHEN 'src1' THEN 5000
                  WHEN 'src2' THEN 2500
                  ELSE 1000 END
""",
    doc=(
        "Deterministic stratified sampling for training-mix rebalancing: "
        "per-source keep fractions via md5-bucket thresholds — exactly "
        "reproducible on any engine and stable as the corpus grows "
        "(membership depends only on seed+id, unlike rand()-based "
        "sampleBy)."
    ),
)
def q_stratified_sample(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return stratified_sample(
        docs,
        "doc_id",
        "source",
        {"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_fraction=0.1,
        seed=42,
    ).select("doc_id", "source")


@query(
    "q_token_budget_mix",
    oracle=f"""
WITH tt AS (
  SELECT doc_id, source, len({TOKS}) AS n_tokens,
         md5('42:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents),
cum AS (
  SELECT doc_id, source, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM tt)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM cum
WHERE cum_before < 2000
GROUP BY source
""",
    doc=(
        "Token-budget mixing: each source contributes documents in "
        "deterministic md5 order until its 2000-token budget fills — "
        "one shuffle on the source key, window cumsum per partition, "
        "no collects (the data-mixing step of a pretraining recipe)."
    ),
)
def q_token_budget_mix(spark, sf_dir):
    from typebus_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(tokens("text")).cast("long")
    )
    mixed = token_budget_mix(
        docs, "doc_id", "source", "n_tokens", budget_per_source=2000, seed=42
    )
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@query(
    "q_shard_shuffle",
    oracle="""
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5('11:' || CAST(doc_id AS VARCHAR)), 1, 15))
           ::BIGINT AS h
  FROM documents)
SELECT doc_id,
       CAST(h % 8 AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY h % 8
                               ORDER BY h // 8, doc_id) - 1
            AS BIGINT) AS pos
FROM h
""",
    doc=(
        "Deterministic training-order shuffle + shard assignment (the "
        "last step before writing training shards): every doc gets a "
        "pseudo-random shard (md5 bucket mod 8) and a reproducible "
        "within-shard position (the hash's high bits order the shard). "
        "Pure function of (seed, id) — reruns/engines/auditors "
        "reproduce the exact placement, unlike ORDER BY rand(). ONE "
        "hash shuffle + partition-local sort (no global sort, "
        "plan-pinned) — the minimal movement any shard writer pays "
        "(operators/sampling.py shard_shuffle)."
    ),
)
def q_shard_shuffle(spark, sf_dir):
    from typebus_spark.operators.sampling import shard_shuffle

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return shard_shuffle(docs, "doc_id", n_shards=8, seed=11)


@query(
    "q_pack_sequences",
    oracle=f"""
WITH tt AS (
  SELECT doc_id, len({TOKS}) AS tok,
         ({_BUCKET_SQL.format(seed=42)} % 8) AS shard,
         md5('pack42:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents),
cum AS (
  SELECT doc_id, shard, tok,
         CAST(coalesce(sum(tok) OVER (PARTITION BY shard ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before
  FROM tt)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       cum_before // 512 AS start_seq,
       (cum_before + tok - 1) // 512 AS end_seq,
       CAST(tok AS BIGINT) AS n_tokens
FROM cum
""",
    doc=(
        "Sequence packing (concat-and-chunk, the standard pretraining "
        "shape): shard by id hash, concatenate in hash order, split "
        "every 512 tokens; each doc reports the sequence range it "
        "spans. Shards are independent — the only window partitions by "
        "shard, so packing parallelizes across the corpus with bounded "
        "per-task state."
    ),
)
def q_pack_sequences(spark, sf_dir):
    from typebus_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(tokens("text")).cast("long")
    )
    return pack_sequences(
        docs, "doc_id", "n_tok", max_tokens=512, n_shards=8, seed=42
    )


@query(
    "q_vocab_topk",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest(list_transform({TOKS}, x -> lower(x))) AS token
             FROM documents)
SELECT token,
       CAST(count(*) AS BIGINT) AS tf,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM tok
GROUP BY token
ORDER BY tf DESC, token
LIMIT 40
""",
    doc=(
        "Vocabulary build: top-40 tokens by corpus term frequency with "
        "document frequency — one explode + one token-key shuffle, "
        "TakeOrdered top-k, deterministic (tf, token) tie-break."
    ),
)
def q_vocab_topk(spark, sf_dir):
    return vocab_topk(t(spark, sf_dir, "documents"), "doc_id", "text", k=40)


@query(
    "q_token_entropy",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest(list_transform({TOKS}, x -> lower(x))) AS token
             FROM documents),
counts AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(log2(CAST(sum(c) AS DOUBLE))
             - sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
               / CAST(sum(c) AS DOUBLE), 6) AS entropy
FROM counts
GROUP BY doc_id
""",
    doc=(
        "Per-document unigram token entropy (vocabulary-diversity "
        "quality signal, Gopher-style): two hash aggregations with "
        "map-side partials, no windows, no collects."
    ),
)
def q_token_entropy(spark, sf_dir):
    return token_entropy(t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "q_tfidf_top_terms",
    oracle=f"""
WITH tok AS (SELECT doc_id, unnest(list_transform({TOKS}, x -> lower(x))) AS term
             FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n),
ranked AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rk
  FROM scored)
SELECT doc_id, term, tfidf, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
""",
    doc=(
        "TF-IDF keyword extraction: top-3 terms per document — term "
        "counts and document frequencies as two partial-agg passes, the "
        "(term, df) table broadcast back, per-doc rank via "
        "WindowGroupLimit. Smoothed idf = ln((N+1)/(df+1)); all "
        "arithmetic double-deterministic per row, round(6)."
    ),
)
def q_tfidf_top_terms(spark, sf_dir):
    from typebus_spark.functions.text import tokens_lower
    from typebus_spark.session import ensure_parallelism
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    # N stays IN the plan (1-row count aggregate, broadcast into the
    # scoring join, mirroring the oracle's CROSS JOIN n) instead of a
    # driver-side docs.count(): the eager count was a build-time scan
    # job — an extra corpus pass at scale and a plan-cache blocker.
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    tok = ensure_parallelism(docs.select("doc_id", "text")).select(
        "doc_id",
        F.explode(tokens_lower("text")).alias("term"),
    )
    # tf feeds BOTH the df aggregate and the scoring join — without the
    # persist each consumer re-executes the full explode + (doc, term)
    # shuffle (double-scan disease, r9; single-reuse persists are the
    # sanctioned fix). The cached frame is one row per (doc, term),
    # far smaller than the exploded token stream that builds it.
    from pyspark import StorageLevel

    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log((F.col("_n") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf", F.col("rk").cast("long").alias("rk"))
    )


@query(
    "q_repetition_stats",
    oracle=f"""
WITH tt AS (SELECT doc_id, {TOKS} AS toks FROM documents)
SELECT doc_id,
       CAST(len({_shingles_sql(3)}) AS BIGINT) AS n_ngrams,
       CAST(len(list_distinct({_shingles_sql(3)})) AS BIGINT) AS n_distinct,
       CAST(len({_shingles_sql(3)})
            - len(list_distinct({_shingles_sql(3)})) AS BIGINT) AS n_repeated
FROM tt
""",
    doc=(
        "Per-document repeated 3-gram counts (C4/Gopher-style internal "
        "repetition signal) — pure projection, no shuffle, scan-speed "
        "at any corpus size."
    ),
)
def q_repetition_stats(spark, sf_dir):
    return repetition_stats(t(spark, sf_dir, "documents"), "doc_id", "text", n=3)


@query(
    "q_bigram_logprob",
    oracle=f"""
WITH tt AS (SELECT source, {TOKS} AS toks FROM documents),
ex AS (SELECT source, unnest({_shingles_sql(2)}) AS bg FROM tt),
uni AS (SELECT unnest(toks) AS w FROM tt),
ugc AS (SELECT w, count(*) AS c1 FROM uni GROUP BY w),
v AS (SELECT count(DISTINCT w) AS vs FROM uni),
bgc AS (SELECT bg, count(*) AS c2 FROM ex GROUP BY bg),
scored AS (
  SELECT source,
         CAST(round(ln(CAST(c2 + 1 AS DOUBLE)
                       / CAST(c1 + vs AS DOUBLE)) * 1e9, 0) AS BIGINT)
           AS lp_u
  FROM ex
  JOIN bgc USING (bg)
  JOIN ugc ON string_split(bg, ' ')[1] = ugc.w
  CROSS JOIN v)
SELECT source, count(*) AS n_bigrams,
       round(CAST(sum(lp_u) AS DOUBLE) / 1e9
             / CAST(count(*) AS DOUBLE), 6) AS avg_logprob
FROM scored GROUP BY source
""",
    doc=(
        "Statistical-LM quality scoring (KenLM-perplexity-filter shape, "
        "CCNet/Gopher style, bigram order): Laplace-smoothed corpus "
        "bigram model scored per source. The model is two corpus "
        "aggregates joined back onto the bigram stream; each ln() is "
        "fixed to integer nano-units per bigram before summation so "
        "the aggregate is exact and partitioning-invariant."
    ),
)
def q_bigram_logprob(spark, sf_dir):
    from typebus_spark.operators.corpus_stats import bigram_logprob

    return bigram_logprob(t(spark, sf_dir, "documents"), "source", "text")


CHUNK_W, CHUNK_S = 128, 96


@query(
    "q_chunk_overlap",
    oracle=f"""
WITH tt AS (SELECT doc_id, {TOKS} AS toks FROM documents),
base AS (SELECT doc_id, toks, len(toks) AS n FROM tt),
st AS (SELECT doc_id, toks, n,
              unnest(range(0, greatest(n, 1), {CHUNK_S})) AS s
       FROM base),
ch AS (SELECT doc_id, CAST(s // {CHUNK_S} AS BIGINT) AS chunk_id,
              list_slice(toks, s + 1, least(s + {CHUNK_W}, n)) AS chunk
       FROM st)
SELECT doc_id, chunk_id, CAST(len(chunk) AS BIGINT) AS n_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_hash
FROM ch
""",
    doc=(
        "Overlapping token-window chunking (RAG/eval prep): "
        f"{CHUNK_W}-token windows every {CHUNK_S} tokens "
        f"({CHUNK_W - CHUNK_S} overlap), one row per chunk with an md5 "
        "content hash — pure scan-side explode+slice, no shuffle, so "
        "chunk identity is a pure function of the document (re-chunking "
        "an updated corpus never moves chunks in unchanged docs)."
    ),
)
def q_chunk_overlap(spark, sf_dir):
    from typebus_spark.operators.text_analysis import chunk_tokens

    return chunk_tokens(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        window=CHUNK_W,
        stride=CHUNK_S,
    )


@query(
    "q_robust_outliers",
    oracle=f"""
WITH tt AS (SELECT doc_id, source, len({TOKS}) AS n FROM documents),
med AS (SELECT source,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY n) AS med
        FROM tt GROUP BY source),
dev AS (SELECT tt.source, tt.n, med.med,
               abs(tt.n - med.med) AS adev
        FROM tt JOIN med ON tt.source = med.source),
mad AS (SELECT source,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad
        FROM dev GROUP BY source)
SELECT d.source, d.med AS median_tokens, m.mad AS mad_tokens,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON d.source = m.source
GROUP BY 1, 2, 3
""",
    doc=(
        "Robust per-source length-outlier detection (median + MAD, the "
        "quality filter that survives heavy-tailed corpora where "
        "mean/stddev break): docs with |len - median| > 3 MAD flagged "
        "per source. Two exact interpolated-percentile aggregates "
        "(shuffle on the source key only), medians broadcast back — "
        "fully hash-checked because Spark percentile() and DuckDB "
        "percentile_cont use the same linear interpolation on the same "
        "sorted values (verified bit-identical across all sources)."
    ),
)
def q_robust_outliers(spark, sf_dir):
    from typebus_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        "source", F.size(tokens("text")).alias("n")
    )
    med = base.groupBy("source").agg(
        F.expr("percentile(n, 0.5)").alias("median_tokens")
    )
    dev = base.join(F.broadcast(med), "source").withColumn(
        "adev", F.abs(F.col("n") - F.col("median_tokens"))
    )
    mad = dev.groupBy("source").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_tokens")
    )
    out = dev.join(F.broadcast(mad), "source")
    return out.groupBy("source", "median_tokens", "mad_tokens").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.col("adev") > 3 * F.col("mad_tokens")).cast("long")
        ).alias("n_outliers"),
    )


@query(
    "q_heavy_hitter_tokens",
    oracle=f"""
WITH tok AS (SELECT unnest(list_transform({TOKS}, x -> lower(x))) AS token
             FROM documents),
tot AS (SELECT count(*) AS t FROM tok),
c AS (SELECT token, count(*) AS n FROM tok GROUP BY 1)
SELECT token, CAST(n AS BIGINT) AS n
FROM c, tot WHERE n * 500 > t
""",
    doc=(
        "EXACT heavy-hitter tokens (frequency > 1/500 of the corpus "
        "token stream) via the two-pass sketch-then-verify shape: a "
        "single-scan KSP frequent-items sketch (df.stat.freqItems, "
        "JVM treeAggregate, ~1/support-entry state per partition, no "
        "key-domain shuffle) proposes a guaranteed-superset candidate "
        "set; one more scan counts candidates exactly (non-candidates "
        "collapse to a null group that still feeds the exact total) "
        "and an integer-arithmetic threshold drops false positives. "
        "This is the vocabulary/stopword analysis a plain groupBy "
        "cannot do at 100 TB — there the shuffle state IS the "
        "vocabulary; here it is len(candidates)+1 rows. Hash-checked "
        "against the plain GROUP BY / HAVING oracle because the final "
        "counts are exact."
    ),
)
def q_heavy_hitter_tokens(spark, sf_dir):
    from typebus_spark.functions.text import tokens_lower
    from typebus_spark.operators.sketch import heavy_hitters

    docs = t(spark, sf_dir, "documents")
    # tokens_lower, not transform(split, lower): the site the r13
    # lambda-free sweep missed — the interpreted per-token lambda ran
    # TWICE here (freqItems sketch scan + exact-count scan).
    tok = docs.select(F.explode(tokens_lower("text")).alias("token"))
    return heavy_hitters(tok, "token", num=1, den=500)


@query(
    "q_mix_rebalance_sample",
    oracle="""
WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_before
           FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(n_before) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS k FROM c),
thr AS (SELECT source, n_before,
               least(10000, CAST(round(10000.0 * n / (k * n_before), 0)
                                 AS BIGINT)) AS sample_thr
        FROM c, tot),
s AS (SELECT d.source, d.doc_id
      FROM documents d JOIN thr ON d.source = thr.source
      WHERE (('0x' || substr(md5('7:' || CAST(d.doc_id AS VARCHAR)), 1, 15))
               ::BIGINT % 10000) < thr.sample_thr)
SELECT thr.source, thr.n_before, thr.sample_thr,
       CAST(count(s.doc_id) AS BIGINT) AS n_after,
       CAST(coalesce(sum(s.doc_id), 0) AS BIGINT) AS id_checksum
FROM thr LEFT JOIN s ON thr.source = s.source
GROUP BY 1, 2, 3
""",
    doc=(
        "Deterministic domain-rebalancing resample (the training-mix "
        "op: downsample over-represented sources to a ~uniform mix, "
        "keep probability min(1, N/(k*n_source))): per-source keep "
        "thresholds from one tiny aggregate broadcast back over the "
        "scan, then per-row Bernoulli sampling on the 60-bit md5 "
        "bucket — the exact sample is a pure function of (seed, "
        "doc_id), so reruns/engines/auditors reproduce it row for row "
        "(operators/sampling.py rebalance_audit). The corpus is never "
        "shuffled; result is the per-source before/after audit with an "
        "id checksum pinning the exact surviving row set. The audit is "
        "built from the THRESHOLD table so a source sampled to zero "
        "still reports its real threshold (n_after = 0), matching the "
        "oracle's thr CTE."
    ),
)
def q_mix_rebalance_sample(spark, sf_dir):
    from typebus_spark.operators.sampling import rebalance_audit

    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    return rebalance_audit(docs, "doc_id", "source", seed=7)


TEMPERATURE_BUDGET = 400


@query(
    "q_mix_temperature",
    oracle=f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang),
w AS (
  SELECT lang, n_docs,
         CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000000)
              AS BIGINT) AS wi
  FROM counts),
r AS (
  SELECT lang, n_docs,
         CAST(wi AS DOUBLE) / CAST(sum(wi) OVER () AS DOUBLE) AS p,
         least(1.0,
               {TEMPERATURE_BUDGET}.0
               * (CAST(wi AS DOUBLE) / CAST(sum(wi) OVER () AS DOUBLE))
               / CAST(n_docs AS DOUBLE)) AS rate
  FROM w),
s AS (
  SELECT d.lang, CAST(count(*) AS BIGINT) AS n_sampled
  FROM documents d JOIN r ON d.lang = r.lang
  WHERE CAST(('0x' || substr(md5('tm7:' || CAST(d.doc_id AS VARCHAR)),
                             1, 8)) AS BIGINT)
        / 4294967296.0 < r.rate
  GROUP BY d.lang)
SELECT r.lang, r.n_docs, round(r.p, 6) AS p, round(r.rate, 6) AS rate,
       coalesce(s.n_sampled, CAST(0 AS BIGINT)) AS n_sampled
FROM r LEFT JOIN s ON r.lang = s.lang
""",
    doc=(
        "Temperature-based language sampling at alpha=1/2 (the "
        "XLM-R/mBERT/T5 multilingual mixture: p_i proportional to "
        "sqrt(n_i), upweighting low-resource languages; "
        "q_mix_rebalance_sample is the alpha->0 uniform limit). sqrt "
        "weights fixed to integer nano-units before normalizing so the "
        "weight sum is order-free and every probability is a single "
        "division of integer-valued operands (no pow — transcendentals "
        "don't cross engines). Budget 400 docs: a low-resource lang hits "
        "the least(1.0) rate cap (fr at sf0.01), en does not, so both branches are "
        "driver-checked at the sf0.01 gate. Realized sample via the stable md5-uniform "
        "keep rule; k-row rate table broadcast back over a pruned "
        "scan."
    ),
)
def q_mix_temperature(spark, sf_dir):
    from typebus_spark.operators.mixing import temperature_mix

    return temperature_mix(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "lang",
        budget=TEMPERATURE_BUDGET,
        seed=7,
    )


@query(
    "q_bpe_pair_counts",
    oracle=f"""
WITH words AS (
  SELECT lower(x) AS w, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest({TOKS}) AS x FROM documents)
  GROUP BY 1),
pairs AS (
  SELECT substr(w, CAST(i AS INT), 2) AS pair, freq
  FROM words, unnest(generate_series(1, length(w) - 1)) AS t(i)
  WHERE length(w) >= 2)
SELECT pair, CAST(sum(freq) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair LIMIT 30
""",
    doc=(
        "BPE-trainer pair statistics (the inner loop of byte-pair/"
        "WordPiece tokenizer induction): corpus-weighted counts of "
        "adjacent symbol pairs, top-30 merge candidates. The key scale "
        "property of real BPE trainers is preserved: pairs explode "
        "over the DISTINCT word vocabulary weighted by word frequency "
        "— corpus text is scanned once into a (word, freq) aggregate "
        "(sub-linear vocab growth), and the quadratic-ish character "
        "work runs on the vocab only. Adjacent pairs come from one "
        "single-arg transform over a 1..len-1 sequence (JVM codegen, "
        "no UDF); deterministic (n, pair) tie-break on the top-k."
    ),
)
def q_bpe_pair_counts(spark, sf_dir):
    from typebus_spark.functions.text import tokens_lower
    from typebus_spark.session import ensure_parallelism

    docs = ensure_parallelism(t(spark, sf_dir, "documents").select("text"))
    words = (
        docs.select(
            F.explode(tokens_lower("text")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        "freq",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(30)
    )


_GOPHER_FEAT_SQL = f"""
WITH tt AS (SELECT doc_id, {TOKS} AS toks,
                   string_split(text, chr(10)) AS lines, text
            FROM documents),
feat AS (SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_words,
    list_reduce(list_transform(toks, x -> CAST(length(x) AS BIGINT)),
                (a, b) -> a + b) AS len_sum,
    CAST(len(toks) - len(list_distinct(toks)) AS BIGINT) AS n_dup,
    CAST(len(list_filter(toks, x -> list_contains({_sql_list(STOPWORDS)},
                                                  lower(x)))) AS BIGINT)
      AS stop_hits,
    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
      AS BIGINT) AS n_alpha,
    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
      + CAST((length(text) - length(replace(text, '...', ''))) // 3
             AS BIGINT) AS n_sym,
    CAST(len(lines) AS BIGINT) AS n_lines,
    CAST(len(list_filter(lines, l -> trim(l) LIKE '-%'
                                     OR trim(l) LIKE '\u2022%'))
      AS BIGINT) AS n_bullet,
    CAST(len(list_filter(lines, l -> trim(l) LIKE '%...')) AS BIGINT)
      AS n_ellipsis
  FROM tt)
"""


def _gopher_conds() -> dict[str, str]:
    """Per-rule SQL conditions over the ``feat`` CTE of
    ``_GOPHER_FEAT_SQL`` — shared by the standalone gate oracle and the
    curated-mix pipeline oracle."""
    from typebus_spark.operators.text_analysis import GOPHER_THRESHOLDS as g

    return {
        "ok_words": f"n_words BETWEEN {g['min_words']} AND {g['max_words']}",
        "ok_mean_len": (
            f"CAST(len_sum AS DOUBLE) / n_words BETWEEN"
            f" {g['min_mean_word_len']} AND {g['max_mean_word_len']}"
        ),
        "ok_symbols": (
            f"CAST(n_sym AS DOUBLE) / n_words <= {g['max_symbol_ratio']}"
        ),
        "ok_lines": (
            f"CAST(n_bullet AS DOUBLE) / n_lines <= {g['max_bullet_frac']}"
            f" AND CAST(n_ellipsis AS DOUBLE) / n_lines"
            f" <= {g['max_ellipsis_frac']}"
        ),
        "ok_alpha": (
            f"CAST(n_alpha AS DOUBLE) / n_words >= {g['min_alpha_frac']}"
        ),
        "ok_stops": f"stop_hits >= {g['min_stop_hits']}",
        "ok_dup": (
            f"CAST(n_dup AS DOUBLE) / n_words <= {g['max_dup_ratio']}"
        ),
    }


def _gopher_oracle() -> str:
    conds = _gopher_conds()
    flags = ",\n       ".join(
        f"CAST({c} AS BIGINT) AS {name}" for name, c in conds.items()
    )
    keep = " AND ".join(f"({c})" for c in conds.values())
    return f"""
{_GOPHER_FEAT_SQL}
SELECT doc_id, n_words,
       round(CAST(len_sum AS DOUBLE) / n_words, 4) AS mean_word_len,
       round(CAST(n_dup AS DOUBLE) / n_words, 4) AS dup_ratio,
       stop_hits,
       {flags},
       CAST({keep} AS BIGINT) AS keep
FROM feat
"""


@query(
    "q_filter_gopher",
    oracle=_gopher_oracle(),
    doc=(
        "Gopher-style rule-based quality gate (word-count / mean-word-"
        "length bounds, symbol & bullet/ellipsis ratios, alpha-word "
        "fraction, stop-word minimum, duplicate-token cap) with one 0/1 "
        "flag per rule — pure scan-side Catalyst expressions, exact "
        "integer/IEEE arithmetic so every flag is oracle-replayable."
    ),
)
def q_filter_gopher(spark, sf_dir):
    return gopher_rules(t(spark, sf_dir, "documents"), "doc_id", "text")


def _repetition_oracle() -> str:
    from typebus_spark.operators.text_analysis import (
        REPETITION_THRESHOLDS as r,
    )

    t2, d3 = r["max_top2_frac"], r["max_dup3_frac"]
    return f"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t,
         length(replace(text, ' ', '')) AS tc
  FROM documents
  WHERE len(string_split_regex(trim(text), '\\s+')) >= 3
),
grams AS (
  SELECT doc_id, tc, 2 AS n,
         unnest(list_transform(generate_series(1, len(t)-1),
                               i -> t[i] || ' ' || t[i+1])) AS g
  FROM base
  UNION ALL
  SELECT doc_id, tc, 3,
         unnest(list_transform(generate_series(1, len(t)-2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
  FROM base
),
cnts AS (
  SELECT doc_id, n, g, any_value(tc) AS tc, count(*) AS c,
         count(*) * length(replace(g, ' ', '')) AS cc
  FROM grams GROUP BY doc_id, n, g
),
per AS (
  SELECT doc_id, any_value(tc) AS tc,
         max(CASE WHEN n = 2 THEN cc END) AS top2,
         CAST(coalesce(sum(CASE WHEN n = 3 AND c >= 2 THEN cc END), 0)
              AS BIGINT) AS dup3
  FROM cnts GROUP BY doc_id
)
SELECT doc_id,
       round(CAST(top2 AS DOUBLE) / tc, 6) AS top2_frac,
       round(CAST(dup3 AS DOUBLE) / tc, 6) AS dup3_frac,
       CAST(CAST(top2 AS DOUBLE) / tc <= {t2} AS BIGINT) AS ok_top2,
       CAST(CAST(dup3 AS DOUBLE) / tc <= {d3} AS BIGINT) AS ok_dup3,
       CAST(CAST(top2 AS DOUBLE) / tc <= {t2}
            AND CAST(dup3 AS DOUBLE) / tc <= {d3} AS BIGINT) AS keep
FROM per
"""


@query(
    "q_filter_repetition",
    oracle=_repetition_oracle(),
    doc=(
        "Gopher n-gram repetition filters (Rae et al. 2021 table A1 "
        "repetition-removal section): per-doc fraction of characters in "
        "the most frequent word 2-gram and in duplicated word 3-grams, "
        "with 0/1 flags and the keep conjunction — the boilerplate-"
        "phrase half q_filter_gopher's single-token duplicate ratio "
        "misses. Both gram widths ride one POSITION explode "
        "(explode(sequence) + plain element_at/concat projections) and "
        "a stack(2,...) unpivot — exactly two Generates, plan-pinned; "
        "the inline-over-struct-array form was 1.8x slower on the "
        "interpreted higher-order-function path and was replaced "
        "(r10). One (doc,n,gram) hash aggregate with map-side "
        "combine, one per-doc aggregate; fractions are single "
        "integer/integer divisions so every flag bit matches DuckDB."
    ),
)
def q_filter_repetition(spark, sf_dir):
    from typebus_spark.operators.text_analysis import repetition_fractions

    return repetition_fractions(t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "q_reservoir_per_group",
    oracle="""
SELECT source, doc_id, rk FROM (
  SELECT source, doc_id,
         CAST(row_number() OVER (
            PARTITION BY source
            ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id)
          AS BIGINT) AS rk
  FROM documents)
WHERE rk <= 5
""",
    doc=(
        "Deterministic per-source k-sample: rank by md5(seed:id) inside "
        "each source, keep first 5. Planned as WindowGroupLimit "
        "(per-partition partial top-k), so the shuffle carries "
        "O(partitions*k) rows per group at any corpus size."
    ),
)
def q_reservoir_per_group(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return reservoir_per_group(docs, "doc_id", "source", k=5).select(
        "source", "doc_id", "rk"
    )


@query(
    "q_source_overlap",
    oracle=f"""
WITH tt AS (SELECT source, {TOKS} AS toks FROM documents),
ex AS (SELECT source, unnest({_shingles_sql(3)}) AS s FROM tt),
sh AS (SELECT DISTINCT source,
              ('0x' || substr(md5(s), 1, 15))::BIGINT AS shingle FROM ex),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n
          FROM sh GROUP BY source),
inter AS (SELECT a.source AS src_a, b.source AS src_b,
                 CAST(count(*) AS BIGINT) AS inter
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.source < b.source GROUP BY 1, 2)
SELECT src_a, src_b, sa.n AS n_a, sb.n AS n_b, inter,
       round(inter / (sa.n + sb.n - inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.source = src_a
JOIN sizes sb ON sb.source = src_b
""",
    doc=(
        "Pairwise source-level shingle Jaccard (corpus-composition "
        "diagnostic): the dedup family's inverted 60-bit shingle index "
        "keyed by SOURCE — pair cost is collisions-proportional and the "
        "result is |sources|^2 rows regardless of corpus size."
    ),
)
def q_source_overlap(spark, sf_dir):
    return source_overlap(
        t(spark, sf_dir, "documents"), "source", "text", shingle_n=3
    )


def _pplx_ctes(p: str = "") -> str:
    """The bigram-LM document-scoring CTE chain (ends at ``{p}docs``:
    doc_id, n_bigrams, avg_logprob), name-prefixable so it composes
    with other CTE blocks (the curated-mix pipeline joins it against
    the Gopher feature block, whose names would otherwise collide)."""
    return f"""{p}tt AS (SELECT doc_id, {TOKS} AS toks FROM documents),
{p}ex AS (SELECT doc_id, unnest({_shingles_sql(2)}) AS bg FROM {p}tt),
{p}uni AS (SELECT unnest(toks) AS w FROM {p}tt),
{p}ugc AS (SELECT w, count(*) AS c1 FROM {p}uni GROUP BY w),
{p}v AS (SELECT count(DISTINCT w) AS vs FROM {p}uni),
{p}bgc AS (SELECT bg, count(*) AS c2 FROM {p}ex GROUP BY bg),
{p}scored AS (
  SELECT doc_id,
         CAST(round(ln(CAST(c2 + 1 AS DOUBLE)
                       / CAST(c1 + vs AS DOUBLE)) * 1e9, 0) AS BIGINT)
           AS lp_u
  FROM {p}ex
  JOIN {p}bgc USING (bg)
  JOIN {p}ugc ON string_split(bg, ' ')[1] = {p}ugc.w
  CROSS JOIN {p}v),
{p}docs AS (
  SELECT doc_id, count(*) AS n_bigrams,
         round(CAST(sum(lp_u) AS DOUBLE) / 1e9
               / CAST(count(*) AS DOUBLE), 6) AS avg_logprob
  FROM {p}scored GROUP BY doc_id)"""


_PPLX_TIER_CASE = (
    "CASE ntile(3) OVER (ORDER BY avg_logprob DESC, doc_id) "
    "WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END"
)


@query(
    "q_perplexity_buckets",
    oracle=f"""
WITH {_pplx_ctes()}
SELECT doc_id, n_bigrams, avg_logprob,
       CAST(ntile(3) OVER (ORDER BY avg_logprob DESC, doc_id) AS BIGINT)
         AS bucket,
       {_PPLX_TIER_CASE}
         AS tier
FROM docs
""",
    doc=(
        "CCNet-style perplexity tiering: corpus bigram-LM score per "
        "document, corpus split into equal-population head/middle/tail "
        "tiers. Exact ntile semantics computed WITHOUT a single-"
        "partition window — range partition on (score, id), local rank, "
        "per-partition offset shift (driver traffic = one count per "
        "range partition)."
    ),
)
def q_perplexity_buckets(spark, sf_dir):
    from typebus_spark.operators.corpus_stats import perplexity_buckets

    return perplexity_buckets(
        t(spark, sf_dir, "documents"), "doc_id", "text"
    )


N_BPE_MERGES = 4


def _bpe_train_oracle(n_merges: int = N_BPE_MERGES) -> str:
    """Replay the FULL iterative BPE trainer in DuckDB: vocab aggregate
    → per-round weighted pair counts → top-1 merge (n DESC, pair ASC)
    → double-space literal replace (leftmost-first semantics, verified
    identical to Spark's replace) → next round. Each round's merge is
    pulled into the next round's replace via scalar subqueries."""
    parts = [
        f"""words AS (
  SELECT lower(x) AS w, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest({TOKS}) AS x FROM documents) GROUP BY 1),
v0 AS (SELECT freq,
              '  ' || array_to_string(string_split(w, ''), '  ') || '  '
                AS s
       FROM words WHERE length(w) >= 2)"""
    ]
    for r in range(n_merges):
        parts.append(
            f"""p{r} AS (
  SELECT t.syms[i] || ' ' || t.syms[i + 1] AS pair, t.freq
  FROM (SELECT freq, string_split_regex(trim(s), ' +') AS syms
        FROM v{r}) t,
       unnest(generate_series(1, len(t.syms) - 1)) AS g(i)
  WHERE len(t.syms) >= 2),
m{r} AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS n
         FROM p{r} GROUP BY pair ORDER BY n DESC, pair LIMIT 1)"""
        )
        if r + 1 < n_merges:
            lft = f"string_split((SELECT pair FROM m{r}), ' ')[1]"
            rgt = f"string_split((SELECT pair FROM m{r}), ' ')[2]"
            parts.append(
                f"""v{r + 1} AS (
  SELECT freq,
         replace(s, ' ' || {lft} || '  ' || {rgt} || ' ',
                 ' ' || {lft} || {rgt} || ' ') AS s
  FROM v{r})"""
            )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r + 1} AS BIGINT) AS round, pair, n FROM m{r}"
        for r in range(n_merges)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union


@query(
    "q_bpe_train_merges",
    oracle=_bpe_train_oracle(),
    doc=(
        "Iterative BPE tokenizer training (the full merge-learning "
        f"loop, {N_BPE_MERGES} rounds): corpus scanned ONCE into a "
        "(word, freq) vocab, each round counts weighted adjacent-symbol "
        "pairs over the persisted vocab and applies the argmax merge "
        "via a double-space literal replace whose left-to-right "
        "semantics equal leftmost-first BPE on both engines — ONE row "
        "reaches the driver per round, so the trainer is iterative-"
        "distributed like the Lloyd codebook, and the whole loop is "
        "hash-checked."
    ),
)
def q_bpe_train_merges(spark, sf_dir):
    from typebus_spark.operators.text_analysis import bpe_train_merges

    merges = bpe_train_merges(
        t(spark, sf_dir, "documents"), "text", n_merges=N_BPE_MERGES
    )
    return spark.createDataFrame(
        merges, schema="round long, pair string, n long"
    )


def _bpe_encode_oracle(n_merges: int = N_BPE_MERGES) -> str:
    """Derive the merges with the trainer's CTE chain, then ENCODE the
    corpus: per word, the same double-space replace chain (merge r
    spliced from m{r} via scalar subqueries), post-merge symbol count
    summed per document."""
    train = _bpe_train_oracle(n_merges)
    # _bpe_train_oracle ends with a UNION of per-round SELECTs; keep
    # only its CTE block (everything before the first top-level SELECT)
    idx = train.index("\nSELECT CAST(1 AS BIGINT)")
    ctes = train[len("WITH ") : idx]
    enc = [
        f"""e0 AS (
  SELECT doc_id, lower(x) AS w,
         '  ' || array_to_string(string_split(lower(x), ''), '  ')
            || '  ' AS s
  FROM (SELECT doc_id, unnest({TOKS}) AS x FROM documents))"""
    ]
    for r in range(n_merges):
        lft = f"string_split((SELECT pair FROM m{r}), ' ')[1]"
        rgt = f"string_split((SELECT pair FROM m{r}), ' ')[2]"
        enc.append(
            f"""e{r + 1} AS (
  SELECT doc_id, w,
         replace(s, ' ' || {lft} || '  ' || {rgt} || ' ',
                 ' ' || {lft} || {rgt} || ' ') AS s
  FROM e{r})"""
        )
    return (
        "WITH "
        + ctes
        + ",\n"
        + ",\n".join(enc)
        + f"""
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(length(w)) AS BIGINT) AS n_chars,
       CAST(sum(len(string_split_regex(trim(s), ' +'))) AS BIGINT)
         AS n_tokens,
       round(CAST(sum(length(w)) AS DOUBLE)
             / sum(len(string_split_regex(trim(s), ' +'))), 6)
         AS chars_per_token
FROM e{n_merges} GROUP BY doc_id
"""
    )


_BPE_MERGE_MEMO: dict[tuple, list] = {}


@query(
    "q_bpe_encode",
    oracle=_bpe_encode_oracle(),
    doc=(
        "Tokenizer APPLY (train once, encode forever — the step that "
        "turns q_bpe_train_merges into a usable tokenizer): the "
        f"{N_BPE_MERGES} trained merges replay over every word as a "
        "scan-side literal replace chain (leftmost-first BPE semantics "
        "on both engines), and the post-merge symbol count per "
        "document is the BPE token count a token-budget planner "
        "consumes. One explode scan + one per-doc reduce; the oracle "
        "re-derives the merges AND re-encodes, so training and "
        "application are hash-checked together."
    ),
)
def q_bpe_encode(spark, sf_dir):
    from typebus_spark.operators.text_analysis import (
        bpe_encode_token_counts,
        bpe_train_merges,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    merges = _BPE_MERGE_MEMO.get(key)
    if merges is None:
        merges = [
            pair
            for _, pair, _ in bpe_train_merges(
                t(spark, sf_dir, "documents"), "text",
                n_merges=N_BPE_MERGES,
            )
        ]
        _BPE_MERGE_MEMO[key] = merges
    return bpe_encode_token_counts(
        t(spark, sf_dir, "documents"), "doc_id", "text", merges
    )


_MIX_RATES = {"head": 10_000, "middle": 5_000, "tail": 1_000}
_MIX_SEED = 13
_MIX_RATE_CASE = (
    "CASE tier WHEN 'head' THEN 10000 WHEN 'middle' THEN 5000 "
    "ELSE 1000 END"
)


def _curated_mix_oracle() -> str:
    keep = " AND ".join(f"({c})" for c in _gopher_conds().values())
    bucket = _BUCKET_SQL.format(seed=_MIX_SEED)
    return f"""
{_GOPHER_FEAT_SQL},
{_pplx_ctes('px_')},
gk AS (SELECT doc_id, n_words FROM feat WHERE {keep}),
tiers AS (SELECT doc_id, {_PPLX_TIER_CASE} AS tier FROM px_docs),
cand AS (SELECT gk.doc_id, gk.n_words, tiers.tier
         FROM gk JOIN tiers USING (doc_id)),
kept AS (SELECT * FROM cand WHERE {bucket} < {_MIX_RATE_CASE}),
base AS (SELECT tier, CAST(count(*) AS BIGINT) AS n_candidates,
                CAST(sum(n_words) AS BIGINT) AS cand_words
         FROM cand GROUP BY tier),
ka AS (SELECT tier, CAST(count(*) AS BIGINT) AS n_kept,
              CAST(sum(n_words) AS BIGINT) AS kept_words,
              CAST(sum(doc_id) AS BIGINT) AS id_checksum
       FROM kept GROUP BY tier)
SELECT base.tier, n_candidates, cand_words,
       COALESCE(n_kept, 0) AS n_kept,
       COALESCE(kept_words, 0) AS kept_words,
       COALESCE(id_checksum, 0) AS id_checksum
FROM base LEFT JOIN ka ON base.tier = ka.tier
"""


@query(
    "q_pipeline_curated_mix",
    oracle=_curated_mix_oracle(),
    doc=(
        "End-to-end curation recipe (the composition a training-data "
        "run actually executes): Gopher rule gate -> bigram-LM "
        "perplexity tiering -> per-tier deterministic importance "
        "sampling (head 100% / middle 50% / tail 10%, md5-bucket "
        "Bernoulli so the exact surviving set is engine-replayable) -> "
        "per-tier audit with token totals and an id checksum pinning "
        "the surviving rows. Every stage is the already-verified "
        "operator; the pipeline query proves they compose."
    ),
)
def q_pipeline_curated_mix(spark, sf_dir):
    from typebus_spark.operators.corpus_stats import perplexity_buckets
    from typebus_spark.operators.sampling import weighted_sample

    docs = t(spark, sf_dir, "documents")
    g = (
        gopher_rules(docs, "doc_id", "text")
        .filter(F.col("keep") == 1)
        .select("doc_id", "n_words")
    )
    tiers = perplexity_buckets(docs, "doc_id", "text").select(
        "doc_id", "tier"
    )
    from pyspark import StorageLevel

    # (doc_id, n_words, tier) — doc-count-sized, but its upstream is
    # the two CPU-dense scans (gopher features + bigram-LM perplexity);
    # BOTH the candidate audit and the kept audit consume it, and Spark
    # re-executes the whole upstream per consumer (the r9 double-scan
    # rule, CLAUDE.md) — persist the reduced frame.
    cand = g.join(tiers, "doc_id").persist(StorageLevel.MEMORY_AND_DISK)
    rate = (
        F.when(F.col("tier") == "head", _MIX_RATES["head"])
        .when(F.col("tier") == "middle", _MIX_RATES["middle"])
        .otherwise(_MIX_RATES["tail"])
        .cast("long")
    )
    kept = weighted_sample(
        cand.withColumn("sample_thr", rate),
        "doc_id",
        "sample_thr",
        seed=_MIX_SEED,
    )
    base = cand.groupBy("tier").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates"),
        F.sum("n_words").cast("long").alias("cand_words"),
    )
    ka = kept.groupBy("tier").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("n_words").cast("long").alias("kept_words"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )
    return base.join(ka, "tier", "left").select(
        "tier",
        "n_candidates",
        "cand_words",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("kept_words", F.lit(0)).cast("long").alias("kept_words"),
        F.coalesce("id_checksum", F.lit(0)).cast("long").alias("id_checksum"),
    )


_DSIR_BUCKETS = 1024
_DSIR_SEED = 5


@query(
    "q_dsir_weights",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, (source = 'src0') AS is_t,
         (('0x' || substr(md5('{_DSIR_SEED}:' || t.tok), 1, 15))::BIGINT
          % {_DSIR_BUCKETS}) AS b
  FROM (SELECT doc_id, source,
               unnest(list_transform({TOKS}, x -> lower(x))) AS tok
        FROM documents) t),
lm AS (SELECT b, CAST(count(*) AS BIGINT) AS c_r,
              CAST(sum(CAST(is_t AS BIGINT)) AS BIGINT) AS c_t
       FROM tok GROUP BY b),
tot AS (SELECT CAST(sum(c_r) AS BIGINT) AS n_r,
               CAST(sum(c_t) AS BIGINT) AS n_t FROM lm),
ratio AS (
  SELECT b,
         CAST(round((ln(CAST(c_t + 1 AS DOUBLE)
                        / CAST(n_t + {_DSIR_BUCKETS} AS DOUBLE))
                     - ln(CAST(c_r + 1 AS DOUBLE)
                          / CAST(n_r + {_DSIR_BUCKETS} AS DOUBLE))) * 1e6,
                    0) AS BIGINT) AS lr_u
  FROM lm CROSS JOIN tot)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
       CAST(sum(lr_u) AS BIGINT) AS logweight
FROM tok JOIN ratio USING (b)
GROUP BY doc_id
""",
    doc=(
        "DSIR importance weights (Xie et al. 2023): per-document "
        "log p_target/p_raw under add-1-smoothed hashed-unigram LMs "
        "(target = the src0 domain, raw = whole corpus) — the "
        "data-selection score that targets a quality domain when "
        "resampling a raw 100 TB crawl. Both LMs are bounded "
        f"{_DSIR_BUCKETS}-bucket aggregates broadcast back over one "
        "token scan; per-bucket ln ratios are fixed to integer "
        "MICRO-units before the per-doc sum so the weights are exact "
        "BIGINTs — engine-portable and safely rankable (the coarse "
        "grid keeps ln ulp drift ~6 orders from any round boundary; "
        "see dsir_logweights docstring)."
    ),
)
def q_dsir_weights(spark, sf_dir):
    from typebus_spark.operators.corpus_stats import dsir_logweights

    docs = t(spark, sf_dir, "documents")
    return dsir_logweights(
        docs,
        "doc_id",
        "text",
        target_filter=(F.col("source") == "src0"),
        n_buckets=_DSIR_BUCKETS,
        seed=_DSIR_SEED,
    )


def _url_hx(lo: int, mod: int) -> str:
    """Engine-portable hex slice of md5('url:'||doc_id) — the synthetic
    URL axis (the fixtures carry no URL column, so the query derives a
    deterministic one; the operator under test is real)."""
    return (
        "(CAST(conv(substring(md5(concat('url:', CAST(doc_id AS STRING))), "
        f"{lo}, 4), 16, 10) AS BIGINT) % {mod})"
    )


# scheme case, www subdomain, public suffix, default port, path id,
# trailing slash, utm tracking query, fragment — every axis the
# normalizer must handle, all md5-derived so both engines agree.
_SYNTH_URL_SQL = f"""concat(
  CASE WHEN {_url_hx(29, 5)} = 0 THEN 'HTTPS' ELSE 'https' END, '://',
  CASE WHEN {_url_hx(5, 2)} = 0 THEN 'www.' ELSE '' END,
  source, '.',
  element_at(array('com','org','net','co.uk','github.io'),
             CAST({_url_hx(1, 5)} AS INT) + 1),
  CASE WHEN {_url_hx(21, 7)} = 0 THEN ':443' ELSE '' END,
  '/p/', CAST({_url_hx(9, 3)} AS STRING),
  CASE WHEN {_url_hx(25, 6)} = 0 THEN '/' ELSE '' END,
  CASE WHEN {_url_hx(13, 3)} = 0 THEN '?utm_campaign=x' ELSE '' END,
  CASE WHEN {_url_hx(17, 4)} = 0 THEN '#sec' ELSE '' END)"""

_DOMAIN_CAP = 3
_DOMAIN_BLOCKLIST = ("src0.com", "src3.co.uk")


@query(
    "q_domain_caps",
    oracle=f"""
WITH h AS (
  SELECT doc_id, source, md5('url:' || CAST(doc_id AS VARCHAR)) AS m
  FROM documents),
c AS (
  SELECT doc_id, source,
    ['com','org','net','co.uk','github.io'][
      CAST(('0x' || substr(m, 1, 4))::BIGINT % 5 AS INT) + 1] AS sfx,
    CASE WHEN ('0x' || substr(m, 5, 4))::BIGINT % 2 = 0
         THEN 'www.' ELSE '' END AS www,
    CAST(('0x' || substr(m, 9, 4))::BIGINT % 3 AS VARCHAR) AS pth
  FROM h),
n AS (
  SELECT doc_id, source || '.' || sfx AS domain,
         'https://' || www || source || '.' || sfx || '/p/' || pth AS url
  FROM c
  WHERE source || '.' || sfx NOT IN {repr(_DOMAIN_BLOCKLIST)}),
d AS (
  SELECT domain, url, count(*) AS ndu, min(doc_id) AS kid
  FROM n GROUP BY 1, 2),
r AS (
  SELECT domain, ndu,
         row_number() OVER (
           PARTITION BY domain
           ORDER BY md5('dc:' || CAST(kid AS VARCHAR)), kid) AS rk
  FROM d)
SELECT domain,
       CAST(sum(ndu) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(CASE WHEN rk <= {_DOMAIN_CAP} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM r GROUP BY domain
""",
    doc=(
        "URL/domain-level curation (C4 / RefinedWeb web step the "
        "pipeline previously lacked — r10 verdict item 6): synthesize "
        "a deterministic URL axis from md5(doc_id) (scheme case, www, "
        "5 public suffixes incl. two multi-label, default port, "
        "trailing slash, utm query, fragment), then run the REAL "
        "operator chain — normalize_url (regex canonicalization) → "
        "registrable-domain extraction (frozen-PSL-snapshot rules) → "
        "blocklist gate → exact-URL dedup (keep lowest doc_id) → "
        "per-domain cap 3 (md5-ranked, reservoir pattern). The oracle "
        "derives the NORMALIZED url in closed form from the same hash "
        "axes, so it cross-checks the whole regex chain, not just the "
        "aggregation. Single corpus scan: one shuffle on (domain,url) "
        "with map-side partials, the domain window and final aggregate "
        "reuse the partitioning (plan-pinned)."
    ),
)
def q_domain_caps(spark, sf_dir):
    from typebus_spark.operators.url_curation import curate_urls

    docs = t(spark, sf_dir, "documents").selectExpr(
        "doc_id", _SYNTH_URL_SQL + " AS url"
    )
    return curate_urls(
        docs, "url", "doc_id", cap=_DOMAIN_CAP, blocklist=_DOMAIN_BLOCKLIST
    )


# --- PSL registrable-domain torture query (r11 verdict item 2) -------
# Host axes cover every rule class in the frozen snapshot: 1/2/3-label
# plain suffixes, 1/2-label wildcards, and both exception families.
_PSL_SUFFIX_ARRAY = (
    "'com','co.uk','com.au','github.io','blogspot.co.uk',"
    "'kobe.jp','ck','qld.edu.au'"
)


def _psl_hx(lo: int, mod: int) -> str:
    """Spark-side hex slice of md5('psl:'||doc_id) — deterministic host
    axis (same idiom as _url_hx, different salt)."""
    return (
        "(CAST(conv(substring(md5(concat('psl:', CAST(doc_id AS STRING))), "
        f"{lo}, 4), 16, 10) AS BIGINT) % {mod})"
    )


def _psl_hx_duck(lo: int, mod: int) -> str:
    return (
        "(('0x' || substr(md5('psl:' || CAST(doc_id AS VARCHAR)), "
        f"{lo}, 4))::BIGINT % {mod})"
    )


# [optional sub2.]sub1.name.SUFFIX — name is 'www' on one axis value so
# the *.ck wildcard row also exercises the !www.ck exception.
_PSL_HOST_SQL = f"""concat(
  CASE WHEN {_psl_hx(13, 3)} = 0
       THEN concat('t', CAST({_psl_hx(17, 5)} AS STRING), '.')
       ELSE '' END,
  's', CAST({_psl_hx(9, 4)} AS STRING), '.',
  CASE WHEN {_psl_hx(5, 7)} = 0 THEN 'www'
       ELSE concat('n', CAST({_psl_hx(5, 7)} AS STRING)) END, '.',
  element_at(array({_PSL_SUFFIX_ARRAY}),
             CAST({_psl_hx(1, 8)} AS INT) + 1))"""


@query(
    "q_domain_psl",
    oracle=f"""
WITH a AS (
  SELECT doc_id,
    {_psl_hx_duck(1, 8)} AS sfx_i,
    CASE WHEN {_psl_hx_duck(5, 7)} = 0 THEN 'www'
         ELSE 'n' || CAST({_psl_hx_duck(5, 7)} AS VARCHAR) END AS name,
    's' || CAST({_psl_hx_duck(9, 4)} AS VARCHAR) AS sub1,
    ['com','co.uk','com.au','github.io','blogspot.co.uk',
     'kobe.jp','ck','qld.edu.au'][CAST({_psl_hx_duck(1, 8)} AS INT) + 1]
      AS sfx
  FROM documents),
d AS (
  SELECT CASE
    -- wildcard classes: suffix swallows one more label ...
    WHEN sfx_i IN (5, 6) THEN
      CASE WHEN sfx_i = 6 AND name = 'www'
           THEN 'www.ck'             -- ... unless the exception wins
           ELSE sub1 || '.' || name || '.' || sfx END
    -- plain suffixes of any label count: name.suffix
    ELSE name || '.' || sfx END AS domain
  FROM a)
SELECT domain, CAST(count(*) AS BIGINT) AS n_hosts
FROM d GROUP BY domain
""",
    doc=(
        "True Public-Suffix-List registrable-domain extraction (r11 "
        "verdict item 2 — the last-2/last-3 heuristic mis-bucketed "
        "*.co.uk-class domains): synthesize a deterministic host axis "
        "from md5(doc_id) covering every rule class in the frozen PSL "
        "snapshot (plain 1/2/3-label suffixes incl. blogspot.co.uk and "
        "qld.edu.au, the *.kobe.jp and *.ck wildcards, the !www.ck "
        "exception), run the REAL registrable_domain CASE, and group. "
        "The oracle derives each expected domain in CLOSED FORM from "
        "the same hash axes — an independent derivation, not a replay "
        "— so it cross-checks the whole longest-rule-wins dispatch. "
        "Scan-side projection + one groupBy with map-side partials; "
        "the IN-lists plan as InSet (hash lookup inside codegen)."
    ),
)
def q_domain_psl(spark, sf_dir):
    from typebus_spark.operators.url_curation import psl_registrable_sql

    docs = t(spark, sf_dir, "documents")
    hosts = docs.selectExpr(_PSL_HOST_SQL + " AS host")
    return (
        hosts.selectExpr(psl_registrable_sql("host", "spark") + " AS domain")
        .groupBy("domain")
        .agg(F.expr("CAST(count(1) AS BIGINT) AS n_hosts"))
    )


# --- full-PSL broadcast-table dispatch (r12 verdict item 3) ----------
# Suffix axis deliberately dominated by registries the frozen literal
# snapshot LACKS (.ir/.kz/.by/.tz/.uz come only from PSL_EXTRA_RULES):
# a green row proves TABLE dispatch, not default-* fallback — the
# literal path would bucket 'a.b.example.co.ir' under 'co.ir'.
_PSLF_SUFFIX_ARRAY = (
    "'co.ir','com.kz','gov.by','ac.tz','co.uz','co.uk','kobe.jp',"
    "'unknowntld'"
)

_PSLF_HOST_SQL = f"""concat(
  CASE WHEN {_psl_hx(13, 3)} = 0
       THEN concat('t', CAST({_psl_hx(17, 5)} AS STRING), '.')
       ELSE '' END,
  's', CAST({_psl_hx(9, 4)} AS STRING), '.',
  CASE WHEN {_psl_hx(5, 7)} = 0 THEN 'city'
       ELSE concat('n', CAST({_psl_hx(5, 7)} AS STRING)) END, '.',
  element_at(array({_PSLF_SUFFIX_ARRAY}),
             CAST({_psl_hx(1, 8)} AS INT) + 1))"""


@query(
    "q_domain_psl_full",
    oracle=f"""
WITH a AS (
  SELECT doc_id,
    {_psl_hx_duck(1, 8)} AS sfx_i,
    CASE WHEN {_psl_hx_duck(5, 7)} = 0 THEN 'city'
         ELSE 'n' || CAST({_psl_hx_duck(5, 7)} AS VARCHAR) END AS name,
    's' || CAST({_psl_hx_duck(9, 4)} AS VARCHAR) AS sub1,
    ['co.ir','com.kz','gov.by','ac.tz','co.uz','co.uk','kobe.jp',
     'unknowntld'][CAST({_psl_hx_duck(1, 8)} AS INT) + 1] AS sfx
  FROM documents),
d AS (
  SELECT CASE
    -- *.kobe.jp wildcard swallows one label, !city.kobe.jp punches out
    WHEN sfx_i = 6 THEN
      CASE WHEN name = 'city' THEN 'city.kobe.jp'
           ELSE sub1 || '.' || name || '.' || sfx END
    -- unknown TLD: PSL default '*' rule, last two labels
    WHEN sfx_i = 7 THEN name || '.' || sfx
    -- plain rules (incl. the extra-rule registries): name.suffix
    ELSE name || '.' || sfx END AS domain
  FROM a)
SELECT domain, CAST(count(*) AS BIGINT) AS n_hosts
FROM d GROUP BY domain
""",
    doc=(
        "Registrable-domain extraction via the BROADCAST rules table "
        "(operators/psl_table.py — the full-list scale path the frozen "
        "snapshot file names; r12 verdict item 3): the host axis is "
        "dominated by registries only PSL_EXTRA_RULES carries, so a "
        "green row proves table dispatch, with the *.kobe.jp wildcard "
        "+ !city.kobe.jp exception and the default-* rule riding "
        "along. The oracle derives every expected domain in closed "
        "form from the same hash axes. Plan: ≤4 broadcast hash joins "
        "against the ≤9k-row rules dim (memoized per app), no shuffle "
        "before the final groupBy (pinned in tests/test_psl_table.py)."
    ),
)
def q_domain_psl_full(spark, sf_dir):
    from typebus_spark.operators.psl_table import registrable_domain_table

    docs = t(spark, sf_dir, "documents")
    hosts = docs.selectExpr(_PSLF_HOST_SQL + " AS host")
    return (
        registrable_domain_table(hosts, "host")
        .groupBy("domain")
        .agg(F.expr("CAST(count(1) AS BIGINT) AS n_hosts"))
    )


# --- HTML -> text extraction (r11 verdict item 3) --------------------
# The fixtures carry clean text, so the query synthesizes a
# deterministic HTML wrapper (script/style/comment blocks, nav+footer
# boilerplate lines, escaped entities) around each document — the
# operator under test is real; the axes are engine-portable md5 hex.
_BOILER_DENS = 0.6


def _html_ds(dialect: str) -> str:
    return (
        "CAST(doc_id AS STRING)" if dialect == "spark"
        else "CAST(doc_id AS VARCHAR)"
    )


def _html_hx(mod: int, dialect: str) -> str:
    if dialect == "spark":
        return (
            "(CAST(conv(substring(md5(concat('html:', "
            "CAST(doc_id AS STRING))), 1, 4), 16, 10) AS BIGINT) "
            f"% {mod})"
        )
    return (
        "(('0x' || substr(md5('html:' || CAST(doc_id AS VARCHAR)), "
        f"1, 4))::BIGINT % {mod})"
    )


def _html_synth_sql(dialect: str) -> str:
    """Six-line synthetic page: head with script/style blocks (whose <
    and && would corrupt a naive tag strip), a comment, an h1, a
    link-only nav line on half the docs, the document text with escaped
    entities, and a link-only footer."""
    ds = _html_ds(dialect)
    nav = _html_hx(2, dialect)
    return (
        "concat_ws(chr(10), "
        "'<html><head><style>.nav > a</style>"
        "<script>if (1 < 2 && 2 > 1) go();</script></head>', "
        f"concat('<body><!-- id ', {ds}, ' --><h1>Doc ', {ds}, '</h1>'), "
        f"CASE WHEN {nav} = 0 THEN "
        "'<div class=\"nav\"><a href=\"/\">Home</a> "
        "<a href=\"/about\">About</a> <a href=\"/faq\">FAQ</a></div>' "
        "ELSE '<p>standalone midline</p>' END, "
        "concat('<p>', text, "
        "' &amp; tail &lt;b&gt;&nbsp;x&#39;s &quot;q&quot;</p>'), "
        "'<footer><a href=\"/tos\">Terms</a> "
        "<a href=\"/priv\">Privacy</a></footer>', "
        "'</body></html>')"
    )


def _extract_oracle() -> str:
    from typebus_spark.operators.html_extract import extract_text_sql

    ext = extract_text_sql(_html_synth_sql("duckdb"), "duckdb")
    return f"""
SELECT doc_id,
       CAST(length({ext}) AS BIGINT) AS clean_len,
       md5({ext}) AS clean_md5
FROM documents
"""


@query(
    "q_extract_text",
    oracle=_extract_oracle(),
    doc=(
        "HTML -> text extraction, the missing FIRST stage of the "
        "C4/RefinedWeb pipeline (r11 verdict item 3): synthesize a "
        "deterministic 6-line HTML page around each document (script/"
        "style blocks whose < and && would corrupt a naive tag strip, "
        "comments, nav/footer link lines, six escaped entities), run "
        "the REAL extract_text chain (block drops -> tag strip -> "
        "entity decode -> whitespace collapse; operators/"
        "html_extract.py — pure regexp_replace/replace, no UDF, no "
        "Generate), emit per-doc md5+length of the clean text. The "
        "oracle replays the identical chain in DuckDB dialect (global "
        "regex flag, backslash escaping and empty-list handling are "
        "the only mechanical differences). Plan: single pruned scan, "
        "one projection, whole-stage codegen."
    ),
)
def q_extract_text(spark, sf_dir):
    from typebus_spark.operators.html_extract import extract_text_sql

    ext = extract_text_sql(_html_synth_sql("spark"), "spark")
    return t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"CAST(length({ext}) AS BIGINT) AS clean_len",
        f"md5({ext}) AS clean_md5",
    )


def _boiler_oracle() -> str:
    from typebus_spark.operators.html_extract import (
        boilerplate_counts_sql,
        drop_boilerplate_sql,
        extract_text_sql,
    )

    html = _html_synth_sql("duckdb")
    n_lines, n_boiler = boilerplate_counts_sql(
        html, "duckdb", _BOILER_DENS
    )
    kept = extract_text_sql(
        drop_boilerplate_sql(html, "duckdb", _BOILER_DENS), "duckdb"
    )
    return f"""
SELECT doc_id, {n_lines} AS n_lines, {n_boiler} AS n_boiler,
       md5({kept}) AS kept_md5
FROM documents
"""


@query(
    "q_html_boilerplate",
    oracle=_boiler_oracle(),
    doc=(
        "Boilerplate-line removal by link density (Kohlschuetter-style "
        "heuristic): per line of the synthetic page, the fraction of "
        "visible characters inside <a> elements; lines above "
        f"{_BOILER_DENS} (the nav on half the docs, the footer on all) "
        "drop before extraction. Per-line logic runs as a bounded "
        "higher-order filter over the split-lines array (lambdas stay "
        "on bounded arrays — the codegen-boundary rule; a page's line "
        "count is bounded, unlike token streams), so the plan is still "
        "one pruned scan + one projection, no Generate, no shuffle. "
        "Oracle replays the chain with DuckDB list_filter."
    ),
)
def q_html_boilerplate(spark, sf_dir):
    from typebus_spark.operators.html_extract import (
        boilerplate_counts_sql,
        drop_boilerplate_sql,
        extract_text_sql,
    )

    html = _html_synth_sql("spark")
    n_lines, n_boiler = boilerplate_counts_sql(html, "spark", _BOILER_DENS)
    kept = extract_text_sql(
        drop_boilerplate_sql(html, "spark", _BOILER_DENS), "spark"
    )
    return t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"{n_lines} AS n_lines",
        f"{n_boiler} AS n_boiler",
        f"md5({kept}) AS kept_md5",
    )
