"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting (north-star extensions, BASELINE.json).

Everything is a pure Catalyst expression pipeline — single scan, no
shuffle (per-document computation), no UDFs — so a 100 TB corpus
processes at parquet-scan speed with full whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from typebus_spark.functions.text import norm_text, tokens, tokens_lower

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately minimal + deterministic (the real-world analog swaps in
# fastText/CLD3 via a pandas UDF; the heuristic IS the operator contract).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "nicht"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count, char count, avg token length."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars_actual"),
        F.round(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
    )


from functools import lru_cache


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features + composite score ∈ [0,1]:
    length band, punctuation density, stopword ratio, repetition
    (distinct-token ratio). Mirrors the usual LLM-data quality filters."""
    return df.select(*_quality_cols(id_col, text_col))


@lru_cache(maxsize=16)
def _quality_cols(id_col: str, text_col: str) -> tuple:
    """Cached quality-feature projection (~80 py4j round trips to build;
    the clean-corpus pipeline is stateful, so the bench rebuilds it per
    pass)."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.!?,;:]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))
    )
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tok
    stop_ratio = stop_hits / n_tok
    punct_ratio = punct / n_chars
    length_ok = (n_tok >= 20) & (n_tok <= 10000)
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.6), F.lit(0.2)).otherwise(
            F.lit(0.0)
        )
        + F.when(punct_ratio <= 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(distinct_ratio >= 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return (
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_token_ratio"),
        F.round(score, 1).alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-lexicon language ID: per language, count marker hits among
    lowercased tokens; argmax wins, 'und' when no hits. Deterministic
    tiebreak by language code order."""
    toks = tokens_lower(text_col)

    def _hits(ws: list[str]) -> F.Column:
        # single-arg lambda: a 2-arg lambda would receive the element
        # INDEX as its second argument (pyspark higher-order fn contract)
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    hit_cols = [
        _hits(ws).alias(f"hits_{code}") for code, ws in LANG_MARKERS.items()
    ]
    scored = df.select(F.col(id_col), *hit_cols)
    best = F.lit(0)
    lang = F.lit("und")
    for code in LANG_MARKERS:  # insertion order = deterministic tiebreak
        c = F.col(f"hits_{code}")
        better = c > best
        lang = F.when(better, F.lit(code)).otherwise(lang)
        best = F.when(better, c).otherwise(best)
    return scored.select(
        F.col(id_col),
        lang.alias("pred_lang"),
        best.alias("marker_hits"),
    )


LANGID_BUCKETS = 4096
LANGID_GRAM = 3
LANGID_SEED = 7


def _char_grams(s: F.Column, gram: int = LANGID_GRAM) -> F.Column:
    """Character n-grams of the normalized text (1-gram fallback for
    strings shorter than ``gram``)."""
    n = F.length(s)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n - (gram - 1), F.lit(1))),
        lambda i: F.substr(s, i, F.lit(gram)),
    )


def _langid_bucket(g: F.Column, seed: int, n_buckets: int) -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), g)), 1, 15),
            16,
            10,
        ).cast("long")
        % n_buckets
    )


def langid_train_profile(
    train: DataFrame,
    n_buckets: int = LANGID_BUCKETS,
    seed: int = LANGID_SEED,
) -> tuple[DataFrame, DataFrame]:
    """Train the per-language hashed char-3-gram profiles. Returns
    ``(delta, langs)``: ``delta(lang, b, d_u)`` — the micro-unit log-
    likelihood delta over the unseen-bucket default for every TRAINED
    (lang, bucket) — and ``langs(lang, def_u)`` — the per-language
    unseen-bucket default. Exact integers (see ``lang_id_ngram``), so
    the profiles can be FROZEN as literals
    (tools/freeze_langid_profile.py) exactly like the IVF codebook."""
    tg = train.select(
        F.col("lang"),
        F.explode(_char_grams(norm_text("text"))).alias("g"),
    ).select("lang", _langid_bucket(F.col("g"), seed, n_buckets).alias("b"))
    prof = tg.groupBy("lang", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = tg.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))

    def u(x: F.Column) -> F.Column:
        return F.round(F.log(x) * 1e6, 0).cast("long")

    langs = tot.select(
        "lang", u(F.lit(1.0) / (F.col("n") + n_buckets)).alias("def_u")
    )
    delta = (
        prof.join(tot, "lang")
        .join(langs, "lang")
        .select(
            "lang",
            "b",
            (
                u((F.col("c") + F.lit(1.0)) / (F.col("n") + n_buckets))
                - F.col("def_u")
            ).alias("d_u"),
        )
    )
    return delta, langs


def langid_frozen_profile(spark) -> tuple[DataFrame, DataFrame]:
    """(delta, langs) frames from the FROZEN literals
    (_langid_profile.py, generated by tools/freeze_langid_profile.py).
    Train-once-classify-many: no training subtree in the plan; two
    local relations (1.9k + 6 rows) that broadcast. The driver oracle
    re-derives the same numbers from the fixture in SQL every round,
    and tests pin live-training == frozen."""
    from typebus_spark.operators._langid_profile import (
        PROFILE_DELTA,
        PROFILE_LANGS,
    )

    delta = spark.createDataFrame(
        PROFILE_DELTA, "lang string, b long, d_u long"
    )
    langs = spark.createDataFrame(PROFILE_LANGS, "lang string, def_u long")
    return delta, langs


def lang_id_ngram(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train: DataFrame | None = None,
    n_buckets: int = LANGID_BUCKETS,
    seed: int = LANGID_SEED,
    profile: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Hash-embedded character-n-gram centroid language classifier —
    the statistical upgrade of the marker-lexicon ``lang_id`` (the
    langid.py / fastText-style approach, linear-model variant):
    per language, TRAIN a hashed char-3-gram unigram LM from a labeled
    frame ``train(lang, text)``; classify each document by the add-1
    smoothed naive-Bayes log-likelihood ``Σ_g ln p_lang(bucket(g))``,
    argmax over languages (deterministic tiebreak: lang code asc).

    Engine-portable by the DSIR micro-unit scheme
    (``corpus_stats.dsir_logweights``): every per-(lang, bucket) ln is
    fixed to integer MICRO-units before any per-document sum, so
    scores are exact integers and cross-engine ulp drift sits ~6
    orders below the rounding grid. Decomposition keeps unseen buckets
    free: score = Σ_matched (lp_u − def_u) + n_grams · def_u, so only
    TRAINED buckets join (the delta table is bounded by the training
    corpus and broadcast).

    Scale shape: training aggregates are train-corpus-bounded and
    broadcast; the corpus is scanned once into a gram explode + one
    (id, bucket) reduce; the lang fan-out happens AFTER reduction
    (|langs| rows per doc). No global sort — the argmax is a per-doc
    window.

    Pass either ``train`` (profiles derived in-plan — the training
    subtree re-executes per run) or ``profile`` (pre-trained
    ``(delta, langs)`` frames, e.g. the FROZEN literals from
    tools/freeze_langid_profile.py — the production shape: train once,
    classify many).

    Returns ``(id, pred_lang, score_u)``.
    """
    from pyspark.sql import Window

    from typebus_spark.session import ensure_parallelism

    if profile is not None:
        delta, langs = profile
    else:
        if train is None:
            raise ValueError("lang_id_ngram needs train= or profile=")
        delta, langs = langid_train_profile(train, n_buckets, seed)

    # The gram count is a CLOSED FORM of the text length (one gram per
    # char position, 1-gram fallback), so n_grams never touches the
    # explode pipeline — computing it from the gram stream made the
    # plan execute the explode+md5 scan twice (no exchange reuse across
    # the two aggregates; measured 2x the query's scan cost at sf0.1).
    base = ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
    ng = base.select(
        F.col(id_col).alias("_id"),
        F.greatest(
            F.length(norm_text(text_col)) - (LANGID_GRAM - 1), F.lit(1)
        ).cast("long").alias("n_grams"),
    )
    # Gram INSTANCES broadcast-join the trained delta directly — the
    # (id, bucket) pre-reduce shuffled ~47% of the gram stream for
    # nothing (map-side partial aggregation after the join already
    # collapses to <= docs x |langs| rows before the only shuffle).
    # Lambda-free gram stream (r10): position explode + substr
    # projection stays in whole-stage codegen; the transform-lambda
    # form (_char_grams) ran interpreted — 2.3x slower at the 10x A/B
    # (19.7/11.4 s vs 7.4/5.0 s, bit-identical per-lang checksums).
    g = (
        base.select(
            F.col(id_col).alias("_id"),
            norm_text(text_col).alias("_s"),
        )
        .select(
            "_id",
            "_s",
            F.expr(
                f"explode(sequence(1, greatest(length(_s)"
                f" - {LANGID_GRAM - 1}, 1)))"
            ).alias("_i"),
        )
        .select(
            "_id",
            _langid_bucket(
                F.expr(f"substr(_s, _i, {LANGID_GRAM})"), seed, n_buckets
            ).alias("b"),
        )
    )
    matched = (
        g.join(F.broadcast(delta), "b")
        .groupBy("_id", "lang")
        .agg(F.sum(F.col("d_u")).cast("long").alias("mu"))
    )
    scored = (
        ng.crossJoin(F.broadcast(langs))
        .join(matched, ["_id", "lang"], "left_outer")
        .select(
            "_id",
            "lang",
            (
                F.coalesce(F.col("mu"), F.lit(0))
                + F.col("n_grams") * F.col("def_u")
            ).alias("score_u"),
        )
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("score_u").desc(), F.col("lang").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("lang").alias("pred_lang"),
            "score_u",
        )
    )


def fingerprint(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 5,
    minhash_k: int = 4,
) -> DataFrame:
    """Document fingerprints: full-content hash (md5 of normalized text)
    + a k-element MinHash sketch of word shingles (winnowing analog —
    robust to small edits). Both engine-portable (md5).

    The sketch is computed explode-side (shingles → k min-aggregates) in
    ONE pass; building it as a k-element array expression makes Catalyst
    inline the whole shingle pipeline k times (see operators.dedup).
    """
    from typebus_spark.functions.text import exploded_shingle_rows

    # raw explode (no distinct): min() over duplicates is identical and
    # skipping distinct saves a shuffle; lambda-free stream (r10)
    sh = exploded_shingle_rows(
        df, id_col, text_col, shingle_n
    ).withColumnRenamed("_s", "shingle")
    sketch = sh.groupBy("_id").agg(
        F.array(
            *[
                F.min(
                    F.md5(F.concat(F.lit(f"{k}:"), F.col("shingle")))
                ).alias(f"m{k}")
                for k in range(minhash_k)
            ]
        ).alias("minhash")
    )
    hashes = df.select(
        F.col(id_col), F.md5(norm_text(text_col)).alias("content_hash")
    )
    return hashes.join(
        sketch, hashes[id_col] == sketch["_id"], "left_outer"
    ).select(id_col, "content_hash", "minhash")


def linear_classifier(
    features: list[tuple["F.Column", float]], bias: float
) -> "F.Column":
    """Model inference as a scan-side expression: logit = bias + sum
    w_i * f_i, built strictly left-to-right in double precision so the
    score is bit-identical on any engine.

    The deployment shape for a distilled quality/langid classifier
    (fasttext-style linear head) over a 100 TB corpus: the weights are
    plan literals broadcast with the plan — no model server, no UDF, no
    shuffle; scoring runs inside whole-stage codegen at scan speed.
    Keep the logit raw (no sigmoid): monotone in the probability, and
    ``exp()`` is not bit-portable across libm implementations.
    """
    z = F.lit(float(bias))
    for col, w in features:
        z = z + F.lit(float(w)) * col.cast("double")
    return z


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG/eval-prep primitive:
    each document becomes fixed-size token windows starting every
    ``stride`` tokens (``window - stride`` tokens of overlap carry
    context across boundaries). Emits one row per chunk with its token
    count and an md5 content hash (join key for chunk-level dedup and
    retrieval indexes).

    Pure scan-side expression — explode of a ``sequence`` of starts +
    ``slice`` — so it runs at scan speed on any corpus size with no
    shuffle; the simple fixed-stride scheme (a trailing chunk may be
    short, like standard text splitters) keeps chunk membership a pure
    function of the document, so re-chunking an updated corpus never
    moves chunks inside unchanged documents.
    """
    from typebus_spark.session import ensure_parallelism

    if not 0 < stride <= window:
        raise ValueError("need 0 < stride <= window")
    base = ensure_parallelism(
        df.select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col),
        tokens(text_col).alias("_toks"),
    )
    ex = base.select(
        F.col(id_col),
        "_toks",
        F.explode(
            F.expr(f"sequence(0, greatest(size(_toks) - 1, 0), {stride})")
        ).alias("_s"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_s") + 1, window)
    return ex.select(
        F.col(id_col),
        F.expr(f"CAST(_s DIV {stride} AS BIGINT)").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


GOPHER_THRESHOLDS = {
    "min_words": 20,
    "max_words": 80,
    "min_mean_word_len": 2.5,
    "max_mean_word_len": 8.0,
    "max_symbol_ratio": 0.1,
    "max_bullet_frac": 0.9,
    "max_ellipsis_frac": 0.3,
    "min_alpha_frac": 0.8,
    "min_stop_hits": 2,
    "max_dup_ratio": 0.55,
}


def gopher_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021, table A1):
    the canonical pre-training heuristic gate — word-count bounds, mean
    word length bounds, symbol-to-word ratio (# and ellipses), fraction
    of bullet-/ellipsis-shaped lines, alphabetic-word fraction, a
    minimum stop-word count, and a duplicate-token-ratio cap (the
    single-line analog of Gopher's duplicate-line fractions).

    Emits the measured features plus one 0/1 flag per rule and the
    conjunction ``keep`` — keeping flags separate lets a curation run
    report WHICH rule fired per document, not just the survivor set.

    Everything is a Catalyst scan-side expression (no UDF, no shuffle):
    at 100 TB this runs at parquet-scan speed and composes with the
    dedup/mixing stages downstream. Thresholds are data-set knobs
    (``GOPHER_THRESHOLDS``); the defaults discriminate on the synthetic
    corpus while keeping every rule exercised. Exact integer/IEEE
    arithmetic only (single divisions of integer-valued operands), so
    the DuckDB oracle reproduces every flag bit-identically.
    """
    g = GOPHER_THRESHOLDS
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    feat = df.selectExpr(
        f"{id_col}",
        f"split(trim({text_col}), '\\\\s+') AS _toks",
        f"split({text_col}, '\\n') AS _lines",
        f"{text_col} AS _text",
    ).selectExpr(
        f"{id_col}",
        "CAST(size(_toks) AS BIGINT) AS n_words",
        "aggregate(_toks, 0L, (a, x) -> a + length(x)) AS _len_sum",
        "CAST(size(_toks) - size(array_distinct(_toks)) AS BIGINT)"
        " AS _n_dup",
        f"CAST(size(filter(_toks, x -> lower(x) IN ({stop_list})))"
        " AS BIGINT) AS stop_hits",
        "CAST(size(filter(_toks, x -> x rlike '[A-Za-z]')) AS BIGINT)"
        " AS _n_alpha",
        "CAST(length(_text) - length(replace(_text, '#', '')) AS BIGINT)"
        " + CAST((length(_text) - length(replace(_text, '...', '')))"
        " DIV 3 AS BIGINT) AS _n_sym",
        "CAST(size(_lines) AS BIGINT) AS _n_lines",
        "CAST(size(filter(_lines, l -> trim(l) LIKE '-%'"
        " OR trim(l) LIKE '•%')) AS BIGINT) AS _n_bullet",
        "CAST(size(filter(_lines, l -> trim(l) LIKE '%...')) AS BIGINT)"
        " AS _n_ellipsis",
    )
    return feat.selectExpr(
        f"{id_col}",
        "n_words",
        "round(CAST(_len_sum AS DOUBLE) / n_words, 4) AS mean_word_len",
        "round(CAST(_n_dup AS DOUBLE) / n_words, 4) AS dup_ratio",
        "stop_hits",
        f"CAST(n_words BETWEEN {g['min_words']} AND {g['max_words']}"
        " AS BIGINT) AS ok_words",
        "CAST(CAST(_len_sum AS DOUBLE) / n_words"
        f" BETWEEN {g['min_mean_word_len']}D AND {g['max_mean_word_len']}D"
        " AS BIGINT) AS ok_mean_len",
        "CAST(CAST(_n_sym AS DOUBLE) / n_words"
        f" <= {g['max_symbol_ratio']}D AS BIGINT) AS ok_symbols",
        "CAST(CAST(_n_bullet AS DOUBLE) / _n_lines"
        f" <= {g['max_bullet_frac']}D AND"
        " CAST(_n_ellipsis AS DOUBLE) / _n_lines"
        f" <= {g['max_ellipsis_frac']}D AS BIGINT) AS ok_lines",
        "CAST(CAST(_n_alpha AS DOUBLE) / n_words"
        f" >= {g['min_alpha_frac']}D AS BIGINT) AS ok_alpha",
        f"CAST(stop_hits >= {g['min_stop_hits']} AS BIGINT) AS ok_stops",
        "CAST(CAST(_n_dup AS DOUBLE) / n_words"
        f" <= {g['max_dup_ratio']}D AS BIGINT) AS ok_dup",
        f"CAST(n_words BETWEEN {g['min_words']} AND {g['max_words']}"
        f" AND CAST(_len_sum AS DOUBLE) / n_words"
        f" BETWEEN {g['min_mean_word_len']}D AND {g['max_mean_word_len']}D"
        f" AND CAST(_n_sym AS DOUBLE) / n_words <= {g['max_symbol_ratio']}D"
        f" AND CAST(_n_bullet AS DOUBLE) / _n_lines"
        f" <= {g['max_bullet_frac']}D"
        f" AND CAST(_n_ellipsis AS DOUBLE) / _n_lines"
        f" <= {g['max_ellipsis_frac']}D"
        f" AND CAST(_n_alpha AS DOUBLE) / n_words >= {g['min_alpha_frac']}D"
        f" AND stop_hits >= {g['min_stop_hits']}"
        f" AND CAST(_n_dup AS DOUBLE) / n_words <= {g['max_dup_ratio']}D"
        " AS BIGINT) AS keep",
    )


REPETITION_THRESHOLDS = {
    # Chosen to discriminate on the synthetic corpus while keeping both
    # rules exercised (sf0.01: ~393/500 keep, 27 docs with dup3 > 0).
    "max_top2_frac": 0.12,
    "max_dup3_frac": 0.10,
}


def repetition_fractions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_top2_frac: float = REPETITION_THRESHOLDS["max_top2_frac"],
    max_dup3_frac: float = REPETITION_THRESHOLDS["max_dup3_frac"],
) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021, table A1 "repetition
    removal"): per document, the fraction of characters covered by the
    most frequent word 2-gram (``top2_frac``) and by all duplicated word
    3-grams (``dup3_frac``), plus one 0/1 flag per rule and the
    conjunction ``keep``. ``gopher_rules`` carries the single-token
    duplicate ratio and ``corpus_stats.repetition_stats`` the raw
    repeated-3-gram COUNTS; this is the char-fraction n-gram half of
    the repetition section
    (the "fraction of characters in the most common n-gram" /
    "in duplicated n-grams" family), which catches boilerplate phrases
    single-token ratios miss.

    Characters are counted multiplicatively (occurrences x non-space
    gram length) without overlap correction — the standard cheap
    variant; the oracle replays the same definition so the driver gate
    checks the arithmetic, not a prose spec.

    Shape at scale: one scan -> one explode of ~2x tokens gram rows ->
    hash aggregate on (doc, n, gram) with map-side partial combine ->
    per-doc aggregate. Same shuffle profile as the shingle-dedup family
    (sub-quadratic, no driver data). Docs under 3 tokens are excluded
    (no 3-gram exists; Spark ``sequence`` would also flip descending).
    Fractions are single divisions of integer-valued operands, so the
    IEEE result is bit-identical across engines (gopher_rules
    convention); flags compare the unrounded quotient on both sides.
    """
    from typebus_spark.session import ensure_parallelism

    toks = tokens(text_col)
    base = ensure_parallelism(
        df.select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col),
        toks.alias("_t"),
        F.length(F.replace(F.col(text_col), F.lit(" "), F.lit("")))
        .cast("long")
        .alias("_tc"),
    ).where(F.size(F.col("_t")) >= 3)
    # LAMBDA-FREE gram stream: explode the position index, build both
    # gram widths as plain element_at/concat projections, unpivot with
    # stack — every expression stays inside whole-stage codegen. The
    # first formulation (inline over two transform(...) struct arrays)
    # computed identical rows but ran the interpreted lambda path:
    # 100x-salted A/B (interleaved, 500k docs) measured 62-88 s inline
    # vs 34-56 s here. Still one linear gram stream -> one (doc,n,gram)
    # hash aggregate with map-side combine.
    grams = (
        base.select(
            F.col(id_col),
            F.col("_tc"),
            F.col("_t"),
            F.expr("explode(sequence(1, size(_t)-1))").alias("_i"),
        )
        .selectExpr(
            id_col,
            "_tc",
            "concat(element_at(_t, _i), ' ', element_at(_t, _i+1))"
            " AS _g2",
            "IF(_i <= size(_t)-2, concat(element_at(_t, _i), ' ',"
            " element_at(_t, _i+1), ' ', element_at(_t, _i+2)), NULL)"
            " AS _g3",
        )
        .selectExpr(id_col, "_tc", "stack(2, 2, _g2, 3, _g3) AS (n, g)")
        .where("g IS NOT NULL")
    )
    cnts = grams.groupBy(id_col, "n", "g").agg(
        F.first("_tc").alias("_tc"),
        F.count(F.lit(1)).alias("_c"),
    )
    per = cnts.select(
        F.col(id_col),
        F.col("_tc"),
        F.col("n"),
        F.col("_c"),
        (
            F.col("_c")
            * F.length(F.replace(F.col("g"), F.lit(" "), F.lit("")))
        ).alias("_cc"),
    ).groupBy(id_col).agg(
        F.first("_tc").alias("_tc"),
        F.max(F.when(F.col("n") == 2, F.col("_cc"))).alias("_top2"),
        F.coalesce(
            F.sum(
                F.when((F.col("n") == 3) & (F.col("_c") >= 2), F.col("_cc"))
            ),
            F.lit(0).cast("long"),
        ).alias("_dup3"),
    )
    top2 = F.col("_top2").cast("double") / F.col("_tc")
    dup3 = F.col("_dup3").cast("double") / F.col("_tc")
    return per.select(
        F.col(id_col),
        F.round(top2, 6).alias("top2_frac"),
        F.round(dup3, 6).alias("dup3_frac"),
        (top2 <= F.lit(max_top2_frac)).cast("long").alias("ok_top2"),
        (dup3 <= F.lit(max_dup3_frac)).cast("long").alias("ok_dup3"),
        (
            (top2 <= F.lit(max_top2_frac)) & (dup3 <= F.lit(max_dup3_frac))
        )
        .cast("long")
        .alias("keep"),
    )


def bpe_encode_token_counts(
    df: DataFrame, id_col: str, text_col: str, merges: list[str]
) -> DataFrame:
    """Tokenizer APPLY — the encode step completing ``bpe_train_merges``
    (train once, encode the corpus forever): every lowercased word is
    double-space symbol-encoded and the trained merges replay in
    training order (chained literal ``replace``, leftmost-first BPE
    semantics — see the trainer docstring); the post-merge symbol count
    is the document's BPE token count, the number a token-budget /
    batch planner actually needs.

    ``merges`` is the ordered list of ``"left right"`` pair strings
    from the trainer. Returns ``(id, n_words, n_chars, n_tokens,
    chars_per_token)``.

    Scale shape: ONE explode scan; the merge chain is a scan-side
    expression (k literal replaces, no shuffle); one groupBy(id)
    reduce with map-side partials. Merge strings splice as F.lit
    VALUES (py4j-safe — CLAUDE.md r6 BPE lesson).
    """
    from typebus_spark.session import ensure_parallelism

    w = F.lower(F.col("w"))
    s: F.Column = F.concat(
        F.lit("  "), F.array_join(F.split(w, ""), "  "), F.lit("  ")
    )
    for pair in merges:
        left, right = pair.split(" ")
        s = F.replace(
            s, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
        )
    n_sym = F.size(F.split(F.trim(s), " +"))
    return (
        ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col).alias("_id"),
            F.explode(tokens(text_col)).alias("w"),
        )
        .select(
            "_id",
            F.length(w).alias("n_ch"),
            n_sym.alias("n_sym"),
        )
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_ch").cast("long").alias("n_chars"),
            F.sum("n_sym").cast("long").alias("n_tokens"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_words",
            "n_chars",
            "n_tokens",
            F.round(
                F.col("n_chars").cast("double") / F.col("n_tokens"), 6
            ).alias("chars_per_token"),
        )
    )


def bpe_train_merges(
    df: DataFrame, text_col: str, n_merges: int = 4
) -> list[tuple[int, str, int]]:
    """Iterative BPE merge learning (the full trainer loop whose single
    inner step is ``q_bpe_pair_counts``): learn ``n_merges`` merges,
    each round re-tokenizing the vocabulary with the merges so far.

    Returns ``[(round, pair, merged_count), ...]`` — the merge table a
    tokenizer ships with.

    Scale shape (the real-BPE-trainer trick): the corpus is scanned
    ONCE into a ``(word, freq)`` vocabulary aggregate; every round runs
    on the (persisted) vocab only — sub-linear in corpus size — as one
    weighted pair aggregate + a global top-1 (TakeOrdered, no global
    sort), so exactly ONE row reaches the driver per round. Merges are
    applied by literal string replace over a double-space symbol
    encoding ('  h  e  l  l  o  '): every boundary carries two spaces,
    a match consumes one per side and the replacement restores it, so
    left-to-right non-overlapping replace is EXACTLY leftmost-first BPE
    merge application — and both Spark and DuckDB replace() share that
    semantic, which is what makes the whole iterative trainer
    oracle-replayable (verified: identical char-split, replace, and
    sequence behavior on both engines).
    """
    from pyspark import StorageLevel

    from typebus_spark.functions.text import tokens as _tokens
    from typebus_spark.session import ensure_parallelism

    words = (
        ensure_parallelism(df.select(F.col(text_col).alias("text")))
        .select(F.explode(F.transform(_tokens("text"), F.lower)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .filter(F.length("w") >= 2)
    )
    vocab = words.selectExpr(
        "freq",
        "concat('  ', concat_ws('  ', split(w, '')), '  ') AS s",
    ).persist(StorageLevel.MEMORY_AND_DISK)

    merges: list[tuple[int, str, int]] = []
    cur = F.col("s")
    for r in range(n_merges):
        top = (
            vocab.select("freq", F.split(F.trim(cur), " +").alias("syms"))
            .filter("size(syms) >= 2")
            .selectExpr(
                "freq",
                "explode(transform(sequence(1, size(syms) - 1), "
                "i -> concat(element_at(syms, i), ' ', "
                "element_at(syms, i + 1)))) AS pair",
            )
            .groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, n = top[0]["pair"], int(top[0]["n"])
        left, right = pair.split(" ")
        merges.append((r + 1, pair, n))
        # the learned symbols splice in as F.lit VALUES (py4j-safe), not
        # SQL-literal text — a quote or backslash inside a corpus word
        # can't break the plan the way an f-string into F.expr would
        cur = F.replace(
            cur, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
        )
    return merges
