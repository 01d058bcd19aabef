"""Text expressions — tokenization, shingles, portable hashing.

All JVM-side built-ins. Hashing uses ``md5`` (hex string) rather than
``xxhash64``/``hash`` because md5 is bit-identical across engines
(verified vs DuckDB), making MinHash/LSH signatures oracle-checkable;
lexicographic min over uniformly-distributed hex strings is a valid
min-hash. For pure-Spark speed paths, pass ``fast=True`` to use xxhash64
(same semantics, engine-local values).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def norm_text(col: Column | str) -> Column:
    """Canonical form for exact-dup hashing: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


from functools import lru_cache


@lru_cache(maxsize=64)
def _tokens_by_name(col: str) -> Column:
    return F.split(F.trim(F.col(col)), r"\s+")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the trimmed text (per-name fragment cache —
    rebuilt across most text/dedup/corpus queries otherwise)."""
    if isinstance(col, str):
        return _tokens_by_name(col)
    return F.split(F.trim(col), r"\s+")


def tokens_lower(col: Column | str) -> Column:
    """Lowercased whitespace tokens via lower-then-split: identical
    values to ``transform(tokens(c), lower)`` (per-character lowering
    never touches whitespace, so boundaries and per-token results
    agree), but LAMBDA-FREE — the transform form evaluates its lambda
    on the interpreted expression path per token of an unbounded array
    (the r10 HOF rule; measured on the dsir/tfidf token streams r13)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(F.lower(c)), r"\s+")


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-ish subword split: word chunks, digit runs, punctuation as
    separate tokens (regex analog of a byte-pair pretokenizer)."""
    return F.expr(
        f"filter(regexp_extract_all({_sql(col)}, "
        r"'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0), x -> x != '')"
    )


def _sql(col: Column | str) -> str:
    if isinstance(col, str):
        return col
    raise ValueError("bpe_ish_tokens requires a column name string")


def shingles(toks: Column, n: int) -> Column:
    """Word n-gram shingles: positions 1..len-n+1, space-joined. Documents
    shorter than n words yield a single whole-document shingle."""
    return F.when(
        F.size(toks) < n, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def tokenized_rows(df, id_col: str, text_col: str):
    """Spread ``(_id, _t)`` rows: the token ARRAY per document, input
    repartitioned across cores first (tokenize/explode/hashing are
    compute-bound and a small file arrives as one partition). A query
    that derives several streams from the same tokenization (unigram +
    bigram counts, say) should persist THIS frame — one text scan, one
    regex split, one spread shuffle instead of one per stream (r13:
    bigram_logprob's second full scan+tokenize was ~45% of its wall)."""
    from typebus_spark.session import ensure_parallelism

    return ensure_parallelism(
        df.select(F.col(id_col), F.col(text_col))
    ).select(F.col(id_col).alias("_id"), tokens(text_col).alias("_t"))


def shingle_rows_from_tokens(tok, n: int):
    """LAMBDA-FREE exploded word n-gram stream over ``(_id, _t)`` rows:
    ``(_id, _s)`` rows, one per shingle instance (duplicates kept).

    Position explode + plain slice/concat_ws projections stay inside
    whole-stage codegen; the ``explode(shingles(...))`` transform-array
    form evaluates its lambda on the interpreted expression path and
    measured 2.0-2.6x slower on the 10x distinct-shingle stream with
    identical rows (r10 A/B). Documents shorter than ``n`` words yield
    the single whole-document shingle (``slice`` clamps past the end),
    exactly matching ``shingles``'s fallback."""
    return tok.select(
        "_id",
        "_t",
        F.expr(
            f"explode(sequence(1, greatest(size(_t) - {n - 1}, 1)))"
        ).alias("_i"),
    ).select(
        "_id",
        F.expr(f"concat_ws(' ', slice(_t, _i, {n}))").alias("_s"),
    )


def exploded_shingle_rows(df, id_col: str, text_col: str, n: int):
    """``shingle_rows_from_tokens`` over a fresh ``tokenized_rows``
    scan — the one-stream convenience form (identical plan to the
    pre-split implementation)."""
    return shingle_rows_from_tokens(tokenized_rows(df, id_col, text_col), n)


def minhash_signature(sh: Column, num_hashes: int) -> Column:
    """Portable MinHash: element k = min over shingles of
    md5(k || ':' || shingle). Array of hex strings, length num_hashes."""

    def _minhash(k: int) -> Column:
        # NB: single-arg lambda — a second lambda arg would receive the
        # element index, not the closure value
        return F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{k}:"), s)))
        )

    return F.array(*[_minhash(k) for k in range(num_hashes)])


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature: band b = md5 of its rows joined — equal band
    hash ⇒ candidate pair. Returns array<struct<band:int, h:string>>."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.element_at(signature, b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("h"),
            )
            for b in range(bands)
        ]
    )


def hamming64(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two 64-bit signatures (e.g. SimHash —
    computed scalably in operators.dedup.simhash_signatures)."""
    return F.bit_count(_c(a).bitwiseXOR(_c(b)))


# Default scrub patterns for PII-bearing corpora (emails, NANP-ish phone
# numbers, IPv4, 13-16 digit card-like runs). The synthetic fixture has
# no digit-bearing text, so the inventory query exercises the same
# machinery with term patterns; swap in these defaults for a real crawl.
PII_PATTERNS = [
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    r"\b\d{3}[-.\s]?\d{3}[-.\s]?\d{4}\b",
    r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    r"\b\d{13,16}\b",
]


def redact(
    col: Column | str, patterns: list[str], mask: str = "[MASKED]"
) -> tuple[Column, Column]:
    """(redacted_text, n_redactions) for a regex pattern list.

    Chained ``regexp_replace`` + summed ``regexp_count`` — pure
    scan-side expressions (no shuffle, no UDF), so scrubbing a 100 TB
    corpus runs at read speed and composes with any downstream
    operator. Patterns use the shared Java/RE2 subset (character
    classes, ``\\b``, bounded repeats) so the DuckDB oracle replicates
    them verbatim.
    """
    red = _c(col)
    cnt = F.lit(0).cast("long")
    for p in patterns:
        cnt = cnt + F.regexp_count(red, F.lit(p)).cast("long")
        red = F.regexp_replace(red, p, mask)
    return red, cnt
