"""Text-analysis inventory queries over ``documents`` (north-star).

Oracle-SQL equivalence notes (see tests/oracle.py for the compare):
- Spark ``split(trim(x),'\\s+')`` ≡ DuckDB ``regexp_split_to_array``.
- Counts are cast to BIGINT on the Spark side (DuckDB len()/count() are
  BIGINT).
- md5 hex strings verified bit-identical across engines, so fingerprints
  and MinHash sketches are fully oracle-checked.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from typebus_spark.operators.text_analysis import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from typebus_spark.suite import query, t

TOKS = "regexp_split_to_array(trim(text), '\\s+')"
LTOKS = f"list_transform({TOKS}, x -> lower(x))"


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@query(
    "q_text_token_stats",
    oracle=f"""
WITH tt AS (SELECT doc_id, {TOKS} AS toks, text FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       length(text) AS n_chars_actual,
       round(list_reduce(list_transform(toks, x -> CAST(length(x) AS DOUBLE)),
                         (a, b) -> a + b) / len(toks), 4) AS avg_token_len
FROM tt
""",
    doc="Token counting (north-star text analysis): whitespace tokens, single scan, no shuffle.",
)
def q_text_token_stats(spark, sf_dir):
    df = token_stats(t(spark, sf_dir, "documents"), "doc_id", "text")
    return df.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars_actual").cast("long").alias("n_chars_actual"),
        "avg_token_len",
    )


@query(
    "q_text_quality",
    oracle=f"""
WITH tt AS (SELECT doc_id, {TOKS} AS toks, text FROM documents),
feat AS (
  SELECT doc_id,
         len(toks) AS n_tok,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS punct,
         len(list_filter(toks, x -> list_contains({_sql_list(STOPWORDS)}, lower(x)))) AS stop_hits,
         len(list_distinct(toks)) AS n_distinct
  FROM tt)
SELECT doc_id,
       n_tok AS n_tokens,
       round(stop_hits / n_tok, 4)  AS stopword_ratio,
       round(punct / n_chars, 4)    AS punct_ratio,
       round(n_distinct / n_tok, 4) AS distinct_token_ratio,
       round(
         (CASE WHEN n_tok >= 20 AND n_tok <= 10000 THEN 0.4 ELSE 0.0 END)
       + (CASE WHEN stop_hits / n_tok >= 0.01 AND stop_hits / n_tok <= 0.6
               THEN 0.2 ELSE 0.0 END)
       + (CASE WHEN punct / n_chars <= 0.1 THEN 0.2 ELSE 0.0 END)
       + (CASE WHEN n_distinct / n_tok >= 0.1 THEN 0.2 ELSE 0.0 END), 1)
         AS quality_score
FROM feat
""",
    doc="Quality scoring (length/punct/stopword/repetition heuristics).",
)
def q_text_quality(spark, sf_dir):
    df = quality_score(t(spark, sf_dir, "documents"), "doc_id", "text")
    return df.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "stopword_ratio",
        "punct_ratio",
        "distinct_token_ratio",
        "quality_score",
    )


def _langid_oracle() -> str:
    hits = ",\n         ".join(
        f"len(list_filter(ltoks, x -> list_contains({_sql_list(ws)}, x))) AS hits_{c}"
        for c, ws in LANG_MARKERS.items()
    )
    codes = list(LANG_MARKERS)
    # mirror the sequential strict-improvement argmax (earlier code wins ties)
    case = "CASE\n"
    for i in range(len(codes) - 1, -1, -1):
        prev = ", ".join(f"hits_{c}" for c in codes[:i]) or "0"
        case += (
            f"  WHEN hits_{codes[i]} > greatest({prev}, 0) "
            f"THEN '{codes[i]}'\n"
        )
    case += "  ELSE 'und' END"
    greatest_all = ", ".join(f"hits_{c}" for c in codes)
    return f"""
WITH tt AS (SELECT doc_id, {LTOKS} AS ltoks FROM documents),
h AS (SELECT doc_id,
         {hits}
      FROM tt)
SELECT doc_id,
       {case} AS pred_lang,
       greatest({greatest_all}, 0) AS marker_hits
FROM h
"""


@query(
    "q_text_langid",
    oracle=_langid_oracle(),
    doc="Language ID via marker-lexicon hits (n-gram heuristic analog).",
)
def q_text_langid(spark, sf_dir):
    df = lang_id(t(spark, sf_dir, "documents"), "doc_id", "text")
    return df.select(
        "doc_id",
        "pred_lang",
        F.col("marker_hits").cast("long").alias("marker_hits"),
    )


def _shingles_sql(n: int, toks: str = "toks") -> str:
    return (
        f"CASE WHEN len({toks}) < {n} THEN [array_to_string({toks}, ' ')] "
        f"ELSE list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')) END"
    )


def _fingerprint_oracle(shingle_n: int = 5, k: int = 4) -> str:
    mins = ", ".join(
        f"list_min(list_transform(sh, s -> md5('{i}:' || s)))" for i in range(k)
    )
    return f"""
WITH tt AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
sh AS (SELECT doc_id, text,
              list_distinct({_shingles_sql(shingle_n)}) AS sh FROM tt)
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
       array_to_string([{mins}], ',') AS minhash
FROM sh
""".replace("\n", " ")


@query(
    "q_text_fingerprint",
    oracle=_fingerprint_oracle(),
    doc="Document fingerprinting: content hash + portable md5 MinHash sketch.",
)
def q_text_fingerprint(spark, sf_dir):
    df = fingerprint(t(spark, sf_dir, "documents"), "doc_id", "text")
    # serialize the sketch array: the driver's canonicalizer (pandas
    # factorize) cannot hash list cells — join to a deterministic string
    return df.select(
        "doc_id",
        "content_hash",
        F.concat_ws(",", "minhash").alias("minhash"),
    )


@query(
    "q_text_bpe_tokens",
    oracle="""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n]'))
         AS n_subwords,
       len(list_distinct(regexp_extract_all(
           text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n]'))) AS n_distinct
FROM documents
""",
    doc="BPE-ish subword tokenization (regex pretokenizer analog).",
)
def q_text_bpe_tokens(spark, sf_dir):
    import pyspark.sql.functions as FF

    docs = t(spark, sf_dir, "documents")
    toks = FF.expr(
        "regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]', 0)"
    )
    return docs.select(
        "doc_id",
        FF.size(toks).cast("long").alias("n_subwords"),
        FF.size(FF.array_distinct(toks)).cast("long").alias("n_distinct"),
    )


@query(
    "q_multimodal_blob_stats",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256,
       'text/plain' AS mime
FROM documents
""",
    doc="Multimodal binary column plumbing: opaque blob + JVM-side metadata (no decode).",
)
def q_multimodal_blob_stats(spark, sf_dir):
    from typebus_spark.operators.multimodal import attach_blob, blob_stats

    docs = t(spark, sf_dir, "documents")
    media = attach_blob(docs, "text", "text/plain", "doc_id")
    return blob_stats(media, "doc_id").select(
        "doc_id",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "sha256",
        "mime",
    )


def _multimodal_decode_oracle() -> str:
    """The deterministic fake decoder derives every output from
    sha256(blob) bytes (operators/multimodal.py:_fake_decode), and DuckDB
    has sha256 — so the oracle replicates the decode spec in SQL and the
    Arrow/mapInPandas plumbing is hash-checked end-to-end, not rows-only.
    Byte i of the digest is ('0x' || substr(hex, 2i+1, 2))::INT."""

    def byte(i: int) -> str:
        return f"('0x' || substr(sha256(text), {2 * i + 1}, 2))::INT"

    feats = ", ".join(
        f"printf('%.6f', {byte(i)} / 255.0)" for i in range(8)
    )
    return f"""
SELECT doc_id,
       CAST(16 + ({byte(0)} % 64) AS BIGINT) AS width,
       CAST(16 + ({byte(1)} % 64) AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS n_frames,
       concat_ws(',', {feats}) AS features,
       CAST(NULL AS VARCHAR) AS decode_error
FROM documents
"""


@query(
    "q_multimodal_decode",
    oracle=_multimodal_decode_oracle(),
    doc=(
        "Multimodal decode stage: Arrow-batched mapInPandas over media "
        "structs (decoder stubbed deterministically; the oracle "
        "replicates the fake-decode spec from sha256 bytes, so the "
        "UDF plumbing is hash-checked)."
    ),
)
def q_multimodal_decode(spark, sf_dir):
    from typebus_spark.operators.multimodal import attach_blob, decode_media

    docs = t(spark, sf_dir, "documents")
    media = attach_blob(docs, "text", "text/plain", "doc_id")
    decoded = decode_media(media, "doc_id")
    # fixed-precision feature formatting matches the oracle's printf
    return decoded.select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
        F.concat_ws(
            ",",
            F.transform("features", lambda x: F.format_string("%.6f", x)),
        ).alias("features"),
        "decode_error",
    )


def _sha_byte(i: int) -> str:
    """DuckDB SQL for byte ``i`` of sha256(text) as an INT (the fake
    decoder's source of pseudo dimensions)."""
    return f"('0x' || substr(sha256(text), {2 * i + 1}, 2))::INT"


@query(
    "q_multimodal_resize",
    oracle=f"""
WITH dims AS (
  SELECT doc_id, text,
         16 + ({_sha_byte(0)} % 64) AS w,
         16 + ({_sha_byte(1)} % 64) AS h
  FROM documents),
fit AS (
  SELECT doc_id, text, w, h, greatest(w, h) AS mx,
         CASE WHEN greatest(w, h) <= 32 THEN w
              ELSE greatest(1, (w * 32) // greatest(w, h)) END AS out_w,
         CASE WHEN greatest(w, h) <= 32 THEN h
              ELSE greatest(1, (h * 32) // greatest(w, h)) END AS out_h
  FROM dims)
SELECT doc_id,
       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       CAST(out_w AS BIGINT) AS out_w, CAST(out_h AS BIGINT) AS out_h,
       sha256(text || '|' || out_w::VARCHAR || 'x' || out_h::VARCHAR)
         AS resized_sha,
       CAST(NULL AS VARCHAR) AS resize_error
FROM fit
""",
    doc=(
        "Multimodal resize stage: decode + aspect-fit resize FUSED in "
        "one Arrow-batched mapInPandas pass (pixels never shuffle "
        "between stages); integer floor-division target dims and the "
        "stub resample sha are replicated by the oracle, so the fused "
        "UDF plumbing is hash-checked end-to-end."
    ),
)
def q_multimodal_resize(spark, sf_dir):
    from typebus_spark.operators.multimodal import attach_blob, resize_media

    docs = t(spark, sf_dir, "documents")
    media = attach_blob(docs, "text", "image/png", "doc_id")
    resized = resize_media(media, "doc_id", max_w=32, max_h=32)
    return resized.select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("out_w").cast("long").alias("out_w"),
        F.col("out_h").cast("long").alias("out_h"),
        "resized_sha",
        "resize_error",
    )


@query(
    "q_multimodal_framesample",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 1 + ({_sha_byte(2)} % 8)
              ELSE 1 END AS n_frames
  FROM documents)
SELECT doc_id, CAST(unnest(range(0, n_frames, 2)) AS BIGINT) AS frame_idx
FROM d
WHERE n_frames > 1
""",
    doc=(
        "Multimodal frame sampling over a mixed-modality table (every "
        "third doc is 'video/'): decode yields per-item frame counts, "
        "sampled indices explode as a pure sequence expression — no "
        "UDF, no shuffle; only sampled frames would feed the (stubbed) "
        "per-frame decode."
    ),
)
def q_multimodal_framesample(spark, sf_dir):
    from typebus_spark.operators.multimodal import (
        attach_blob,
        decode_media,
        frame_sample,
    )

    docs = t(spark, sf_dir, "documents")
    mime = F.when(F.col("doc_id") % 3 == 0, F.lit("video/mp4")).otherwise(
        F.lit("image/png")
    )
    media = attach_blob(docs, "text", mime, "doc_id")
    decoded = decode_media(media, "doc_id")
    return frame_sample(decoded, "doc_id", every_n=2).select(
        "doc_id", F.col("frame_idx").cast("long").alias("frame_idx")
    )


def _fixture_media_frame(spark, sf_dir, fxs, mod: int):
    """(doc_id, media) frame assigning real fixture blobs to documents
    by ``doc_id % mod`` — the blobs enter the plan as a broadcast
    literal frame (5 tiny rows), the documents scan stays column-pruned
    to doc_id."""
    import base64

    fx_df = spark.createDataFrame(
        [
            (i, fx["name"], bytearray(base64.b64decode(fx["b64"])), fx["mime"])
            for i, fx in enumerate(fxs)
        ],
        "k long, name string, blob binary, mime string",
    )
    from typebus_spark.session import ensure_parallelism

    # the downstream pure-Python codec is CPU-bound per row and the
    # small parquet arrives as 1-2 partitions — spread before decode
    docs = ensure_parallelism(
        t(spark, sf_dir, "documents").select(
            "doc_id", (F.col("doc_id") % mod).alias("k")
        )
    )
    return docs.join(F.broadcast(fx_df), "k").select(
        "doc_id",
        F.struct(
            F.col("blob"),
            F.col("mime"),
            F.create_map(F.lit("fixture"), F.col("name")).alias("meta"),
        ).alias("media"),
    )


def _fixture_name_expr(fxs, mod: int) -> F.Column:
    names = [fx["name"] for fx in fxs]
    return F.element_at(
        F.lit(names), (F.col("doc_id") % mod).cast("int") + 1
    ).alias("name")


def _real_decode_oracle() -> str:
    """VALUES-join oracle from the FROZEN fixture literals
    (_media_fixtures.py): DuckDB cannot inflate zlib, but because the
    blobs are fixed fixtures the expected decode IS a literal table —
    the Spark side still runs the real stdlib decoders on executors,
    and any codec drift breaks the hash against this frozen record."""
    from typebus_spark.operators._media_fixtures import MEDIA_FIXTURES

    rows = []
    for i, fx in enumerate(MEDIA_FIXTURES):
        d = fx["decoded"]
        feats = ",".join(f"{v:.6f}" for v in d["features"])
        rows.append(
            f"({i}, '{fx['name']}', {d['width']}, {d['height']}, "
            f"{d['n_frames']}, '{feats}')"
        )
    values = ",\n    ".join(rows)
    return f"""
WITH fx(k, name, width, height, n_frames, feats) AS (VALUES
    {values})
SELECT d.doc_id, fx.name,
       CAST(fx.width AS BIGINT) AS width,
       CAST(fx.height AS BIGINT) AS height,
       CAST(fx.n_frames AS BIGINT) AS n_frames,
       fx.feats AS feats,
       CAST(NULL AS VARCHAR) AS decode_error
FROM documents d JOIN fx ON d.doc_id % 5 = fx.k
"""


@query(
    "q_multimodal_real_decode",
    oracle=_real_decode_oracle(),
    doc=(
        "REAL media decode — pure-stdlib PNG (zlib inflate + RFC 2083 "
        "unfilter, gray/RGB/RGBA) and WAV (RIFF) codecs running inside "
        "the Arrow-batched mapInPandas stage on executors "
        "(operators/codecs.py, decoder='real'): five real fixture "
        "blobs fan out over documents by doc_id %% 5, and actual "
        "pixel/sample-derived dims + 8-segment feature means are "
        "hash-checked against the FROZEN fixture record. decode_error "
        "must be NULL on every row — a codec regression shows up as a "
        "value, not a crash."
    ),
)
def q_multimodal_real_decode(spark, sf_dir):
    from typebus_spark.operators._media_fixtures import MEDIA_FIXTURES
    from typebus_spark.operators.multimodal import decode_media

    media = _fixture_media_frame(spark, sf_dir, MEDIA_FIXTURES, 5)
    decoded = decode_media(media, "doc_id", decoder="real")
    return decoded.select(
        "doc_id",
        _fixture_name_expr(MEDIA_FIXTURES, 5),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
        F.concat_ws(
            ",", F.transform("features", lambda x: F.format_string("%.6f", x))
        ).alias("feats"),
        "decode_error",
    )


def _real_resize_oracle() -> str:
    from typebus_spark.operators._media_fixtures import MEDIA_FIXTURES

    rows = []
    pngs = [fx for fx in MEDIA_FIXTURES if "resized" in fx]
    for i, fx in enumerate(pngs):
        d, r = fx["decoded"], fx["resized"]
        rows.append(
            f"({i}, '{fx['name']}', {d['width']}, {d['height']}, "
            f"{r['out_w']}, {r['out_h']}, '{r['resized_sha']}')"
        )
    values = ",\n    ".join(rows)
    return f"""
WITH fx(k, name, width, height, out_w, out_h, resized_sha) AS (VALUES
    {values})
SELECT d.doc_id, fx.name,
       CAST(fx.width AS BIGINT) AS width,
       CAST(fx.height AS BIGINT) AS height,
       CAST(fx.out_w AS BIGINT) AS out_w,
       CAST(fx.out_h AS BIGINT) AS out_h,
       fx.resized_sha,
       CAST(NULL AS VARCHAR) AS resize_error
FROM documents d JOIN fx ON d.doc_id % 3 = fx.k
"""


@query(
    "q_multimodal_real_resize",
    oracle=_real_resize_oracle(),
    doc=(
        "REAL fused decode+resize — the PNG fixtures are actually "
        "decoded AND nearest-neighbor downsampled into a 16x16 box in "
        "ONE mapInPandas pass (operators/codecs.real_resize; pixels "
        "never cross an executor boundary twice), and the sha256 of "
        "the RESIZED pixel bytes is hash-checked against the frozen "
        "record — the hash witnesses actual resampling, not just "
        "target dims. Covers fit-passthrough, width-limited, and "
        "height-limited aspect cases."
    ),
)
def q_multimodal_real_resize(spark, sf_dir):
    from typebus_spark.operators._media_fixtures import MEDIA_FIXTURES
    from typebus_spark.operators.multimodal import resize_media

    pngs = [fx for fx in MEDIA_FIXTURES if "resized" in fx]
    media = _fixture_media_frame(spark, sf_dir, pngs, 3)
    resized = resize_media(media, "doc_id", max_w=16, max_h=16, decoder="real")
    return resized.select(
        "doc_id",
        _fixture_name_expr(pngs, 3),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("out_w").cast("long").alias("out_w"),
        F.col("out_h").cast("long").alias("out_h"),
        "resized_sha",
        "resize_error",
    )


def _phash_oracle() -> str:
    from typebus_spark.operators._media_fixtures import MEDIA_FIXTURES

    pngs = [fx for fx in MEDIA_FIXTURES if "phash" in fx]
    values = ",\n    ".join(
        f"({i}, '{fx['phash']}')" for i, fx in enumerate(pngs)
    )
    return f"""
WITH fx(k, phash) AS (VALUES
    {values})
SELECT fx.phash,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(d.doc_id) AS BIGINT) AS min_doc_id,
       CAST(sum(d.doc_id) AS BIGINT) AS id_checksum
FROM documents d JOIN fx ON d.doc_id % 3 = fx.k
GROUP BY fx.phash
"""


@query(
    "q_multimodal_phash",
    oracle=_phash_oracle(),
    doc=(
        "Perceptual image dedup over REAL pixels: 64-bit average-hash "
        "(decode + integer-grayscale + 8x8 nearest-neighbor sample + "
        "strict-integer mean threshold, operators/codecs.average_hash) "
        "computed on executors in one mapInPandas stage, then "
        "groupBy(phash) — the multimodal analog of exact content-hash "
        "dedup: identical-looking images (incl. exact NN rescales, "
        "invariance pinned by test) collide on a 16-char hex key; the "
        "hex substring-splits into 16-bit bands for hamming-tolerant "
        "LSH when near-dup is wanted. Hash values hash-checked against "
        "the frozen fixture record."
    ),
)
def q_multimodal_phash(spark, sf_dir):
    from typebus_spark.operators._media_fixtures import MEDIA_FIXTURES
    from typebus_spark.operators.multimodal import perceptual_hash_media

    pngs = [fx for fx in MEDIA_FIXTURES if "phash" in fx]
    media = _fixture_media_frame(spark, sf_dir, pngs, 3)
    hashed = perceptual_hash_media(media, "doc_id")
    return hashed.groupBy("phash").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
    )


def _langid_ngram_oracle() -> str:
    from typebus_spark.operators._langid_fixture import LANGID_TRAIN
    from typebus_spark.operators.text_analysis import (
        LANGID_BUCKETS,
        LANGID_SEED,
    )

    B, S = LANGID_BUCKETS, LANGID_SEED
    values = ",\n    ".join(f"('{l}', '{t}')" for l, t in LANGID_TRAIN)

    def norm(c: str) -> str:
        return f"trim(regexp_replace(lower({c}), '\\s+', ' ', 'g'))"

    grams = (
        "unnest(list_transform(range(1, greatest(len(s) - 2, 1) + 1), "
        "i -> substr(s, i, 3)))"
    )
    bkt = f"('0x' || substr(md5('{S}:' || g), 1, 15))::BIGINT % {B}"
    return f"""
WITH train(lang, txt) AS (VALUES
    {values}),
tn AS (SELECT lang, {norm('txt')} AS s FROM train),
tg AS (SELECT lang, {grams} AS g FROM tn),
tb AS (SELECT lang, {bkt} AS b FROM tg),
prof AS (SELECT lang, b, count(*) AS c FROM tb GROUP BY 1, 2),
tot AS (SELECT lang, count(*) AS n FROM tb GROUP BY 1),
langs AS (SELECT lang, n,
                 CAST(round(ln(1.0 / (n + {B})) * 1e6, 0) AS BIGINT)
                   AS def_u
          FROM tot),
delta AS (SELECT p.lang, p.b,
                 CAST(round(ln((p.c + 1.0) / (t.n + {B})) * 1e6, 0)
                      AS BIGINT) - l.def_u AS d_u
          FROM prof p JOIN tot t USING (lang) JOIN langs l USING (lang)),
dn AS (SELECT doc_id, {norm('text')} AS s FROM documents),
dg AS (SELECT doc_id, {grams} AS g FROM dn),
db AS (SELECT doc_id, {bkt} AS b FROM dg),
ng AS (SELECT doc_id,
              CAST(greatest(len(s) - 2, 1) AS BIGINT) AS n_grams
       FROM dn),
matched AS (SELECT g.doc_id, d.lang,
                   CAST(sum(d.d_u) AS BIGINT) AS mu
            FROM db g JOIN delta d USING (b) GROUP BY 1, 2),
scored AS (SELECT ng.doc_id, l.lang,
                  coalesce(m.mu, 0) + ng.n_grams * l.def_u AS score_u
           FROM ng CROSS JOIN langs l
           LEFT JOIN matched m
             ON m.doc_id = ng.doc_id AND m.lang = l.lang)
SELECT doc_id, lang AS pred_lang, CAST(score_u AS BIGINT) AS score_u
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score_u DESC, lang ASC) AS rn
      FROM scored)
WHERE rn = 1
"""


@query(
    "q_text_langid_ngram",
    oracle=_langid_ngram_oracle(),
    doc=(
        "Hash-embedded char-3-gram centroid language classifier (the "
        "langid.py-style statistical upgrade of q_text_langid's marker "
        "lexicon): six-language labeled fixture trains hashed-unigram "
        "LMs (md5 buckets, add-1 smoothing); docs classified by exact "
        "integer micro-unit NB log-likelihood argmax (the DSIR "
        "portability scheme — no raw transcendental compare crosses "
        "the engine boundary). Held-out accuracy pinned 18/18 by "
        "tests/test_operators.py. Training tables are bounded + "
        "broadcast; corpus scanned once, lang fan-out after the "
        "(id, bucket) reduce; per-doc window argmax, no global sort."
    ),
)
def q_text_langid_ngram(spark, sf_dir):
    from typebus_spark.operators.text_analysis import (
        lang_id_ngram,
        langid_frozen_profile,
    )

    return lang_id_ngram(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        profile=langid_frozen_profile(spark),
    )


def _phash_near_oracle() -> str:
    from typebus_spark.operators._media_fixtures import PHASH_NEAR_FIXTURES

    values = ",\n    ".join(
        f"({i}, '{fx['phash']}')"
        for i, fx in enumerate(PHASH_NEAR_FIXTURES)
    )
    return f"""
WITH fx(k, phash) AS (VALUES
    {values}),
cat AS (SELECT fx.phash, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents d JOIN fx ON d.doc_id % 4 = fx.k
        GROUP BY fx.phash),
bands AS (SELECT phash, n_docs, b,
                 substr(phash, b + 1, 1) AS bv
          FROM cat, range(16) AS t(b)),
cand AS (SELECT DISTINCT l.phash AS a, r.phash AS b,
                l.n_docs AS n_docs_a, r.n_docs AS n_docs_b
         FROM bands l JOIN bands r
           ON l.b = r.b AND l.bv = r.bv AND l.phash < r.phash)
SELECT a, b,
       CAST(bit_count(xor(('0x' || substr(a, 1, 8))::BIGINT,
                          ('0x' || substr(b, 1, 8))::BIGINT))
          + bit_count(xor(('0x' || substr(a, 9, 8))::BIGINT,
                          ('0x' || substr(b, 9, 8))::BIGINT)) AS INT)
         AS hamming,
       n_docs_a, n_docs_b
FROM cand
WHERE bit_count(xor(('0x' || substr(a, 1, 8))::BIGINT,
                    ('0x' || substr(b, 1, 8))::BIGINT))
    + bit_count(xor(('0x' || substr(a, 9, 8))::BIGINT,
                    ('0x' || substr(b, 9, 8))::BIGINT)) <= 8
"""


@query(
    "q_multimodal_phash_near",
    oracle=_phash_near_oracle(),
    doc=(
        "FUZZY perceptual near-dup (the hamming-LSH step "
        "q_multimodal_phash only advertised): four real PNG fixtures — "
        "incl. a perturbed variant at average-hash hamming 3 from its "
        "base — fan over documents, hashes computed from REAL pixels "
        "on executors, then the DISTINCT-hash catalog is banded "
        "per-hex-char (16x4-bit bands — pigeonhole recall-complete for "
        "hamming <= 15, the r10 fix for the 4-band recall hole), "
        "self-joined on (band, value) — never a cartesian — and "
        "candidates verify hamming <= 8 via bit_count(xor) on the two "
        "32-bit halves. Unrelated fixtures must NOT pair; the banding "
        "+ hamming arithmetic is replayed verbatim by the oracle."
    ),
)
def q_multimodal_phash_near(spark, sf_dir):
    from typebus_spark.operators._media_fixtures import PHASH_NEAR_FIXTURES
    from typebus_spark.operators.multimodal import (
        perceptual_hash_media,
        phash_near_pairs,
    )

    media = _fixture_media_frame(spark, sf_dir, PHASH_NEAR_FIXTURES, 4)
    hashed = perceptual_hash_media(media, "doc_id")
    catalog = hashed.groupBy("phash").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return phash_near_pairs(catalog, "phash", max_hamming=8, n_bands=16)


@query(
    "q_text_redact",
    oracle=r"""
WITH r1 AS (
  SELECT source, text,
         regexp_replace(text, '\bspark\b', '[MASKED]', 'g') AS red1,
         len(regexp_extract_all(text, '\bspark\b')) AS c1
  FROM documents),
r2 AS (
  SELECT source,
         regexp_replace(red1, '\b(table|window)\b', '[MASKED]', 'g')
           AS red,
         c1 + len(regexp_extract_all(red1, '\b(table|window)\b')) AS cnt
  FROM r1)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_redacted,
       CAST(sum(cnt) AS BIGINT) AS total_redactions,
       min(md5(red)) AS spot_hash
FROM r2 GROUP BY source
""",
    doc=(
        "Regex scrubbing/redaction (the PII-removal stage of a "
        "training-data pipeline; functions.text.PII_PATTERNS carries "
        "the real email/phone/IP/card defaults — the digit-free "
        "fixture exercises the machinery with term patterns): chained "
        "regexp_replace + regexp_count, pure scan-side expressions, "
        "no shuffle; redacted output is spot-hash-checked (md5) so "
        "the rewrite itself is oracle-verified, not just the counts."
    ),
)
def q_text_redact(spark, sf_dir):
    from typebus_spark.functions.text import redact

    docs = t(spark, sf_dir, "documents")
    red, cnt = redact(
        "text", [r"\bspark\b", r"\b(table|window)\b"]
    )
    return (
        docs.select("source", red.alias("red"), cnt.alias("cnt"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("cnt") > 0).cast("int"))
            .cast("long")
            .alias("n_docs_redacted"),
            F.sum("cnt").cast("long").alias("total_redactions"),
            F.min(F.md5("red")).alias("spot_hash"),
        )
    )


# distilled-classifier literals: same weights on both engines
_CLF_W = {"len100": 0.8, "stop": 2.0, "distinct": 1.5, "charlen": -0.1}
_CLF_BIAS = -1.2


@query(
    "q_quality_classifier",
    oracle=f"""
WITH tt AS (SELECT source, {TOKS} AS toks, text FROM documents),
feat AS (
  SELECT source,
         len(toks) / 100.0 AS f_len,
         len(list_filter(toks, x -> list_contains(
             {_sql_list(STOPWORDS)}, lower(x)))) / len(toks) AS f_stop,
         len(list_distinct(toks)) / len(toks) AS f_distinct,
         length(text) / len(toks) AS f_charlen
  FROM tt),
s AS (
  SELECT source,
         round({_CLF_BIAS} + {_CLF_W['len100']} * f_len
               + {_CLF_W['stop']} * f_stop
               + {_CLF_W['distinct']} * f_distinct
               + {_CLF_W['charlen']} * f_charlen, 6) AS logit
  FROM feat),
u AS (
  SELECT source,
         CASE WHEN logit >= 0 THEN 'keep' ELSE 'drop' END AS label,
         CAST(round(logit * 1e6, 0) AS BIGINT) AS logit_u
  FROM s)
SELECT source, label, count(*) AS n_docs,
       CAST(sum(logit_u) AS DOUBLE) / 1e6 / CAST(count(*) AS DOUBLE)
         AS mean_logit
FROM u GROUP BY source, label
""",
    doc=(
        "Model-based quality filtering (distilled linear classifier, "
        "fasttext-style head): the weight vector rides the plan as "
        "literals and the logit evaluates inside whole-stage codegen — "
        "no model server, no UDF, no shuffle; classify-at-scan is the "
        "only shape that scores 100 TB without an inference "
        "bottleneck. Logit kept raw (sigmoid's exp() is not "
        "bit-portable); per-class mean logit aggregated exactly via "
        "integer micro-units."
    ),
)
def q_quality_classifier(spark, sf_dir):
    from typebus_spark.functions.text import tokens
    from typebus_spark.operators.text_analysis import (
        STOPWORDS,
        linear_classifier,
    )

    docs = t(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tok = F.size(toks)
    feats = [
        (n_tok / F.lit(100.0), _CLF_W["len100"]),
        (
            F.size(F.filter(toks, lambda x: F.lower(x).isin(*STOPWORDS)))
            / n_tok,
            _CLF_W["stop"],
        ),
        (F.size(F.array_distinct(toks)) / n_tok, _CLF_W["distinct"]),
        (F.length(F.col("text")) / n_tok, _CLF_W["charlen"]),
    ]
    logit = F.round(linear_classifier(feats, _CLF_BIAS), 6)
    n = F.count(F.lit(1))
    return (
        docs.select(
            "source",
            F.when(logit >= 0, "keep").otherwise("drop").alias("label"),
            F.round(logit * 1e6, 0).cast("long").alias("logit_u"),
        )
        .groupBy("source", "label")
        .agg(
            n.alias("n_docs"),
            (F.sum("logit_u").cast("double") / 1e6 / n.cast("double")).alias(
                "mean_logit"
            ),
        )
    )


def _audio_chunks_oracle() -> str:
    """Mirror of operators/multimodal.py:audio_chunks — the pseudo audio
    header derives from sha256 bytes, window starts from range()."""

    def byte(i: int) -> str:
        return f"('0x' || substr(sha256(text), {2 * i + 1}, 2))::INT"

    return f"""
WITH hdr AS (
  SELECT doc_id,
         8000 + ({byte(0)} % 3) * 4000 AS sample_rate,
         (8000 + ({byte(0)} % 3) * 4000) * (1 + ({byte(1)} % 10))
           + ({byte(2)} % 997) * 7 AS n_samples
  FROM documents)
SELECT doc_id,
       CAST(sample_rate AS BIGINT) AS sample_rate,
       start_sample // sample_rate AS chunk_idx,
       CAST(least(sample_rate, n_samples - start_sample) AS BIGINT)
         AS n_in_chunk
FROM (SELECT doc_id, sample_rate, n_samples,
             unnest(range(0, n_samples, sample_rate)) AS start_sample
      FROM hdr)
"""


@query(
    "q_multimodal_audio_chunks",
    oracle=_audio_chunks_oracle(),
    doc=(
        "Audio chunking stage (completes the image/video/audio modality "
        "matrix): 1-second window boundaries per blob, exploded as pure "
        "sequence expressions from a deterministic pseudo header "
        "(sha256-derived sample rate/duration, same spec style as the "
        "stubbed decode) — no UDF, no shuffle; per-chunk decode is the "
        "stub decoder's job. Window math is hash-checked end to end."
    ),
)
def q_multimodal_audio_chunks(spark, sf_dir):
    from typebus_spark.operators.multimodal import attach_blob, audio_chunks

    docs = t(spark, sf_dir, "documents")
    media = attach_blob(docs, "text", "audio/wav", "doc_id")
    return audio_chunks(media, "doc_id")
