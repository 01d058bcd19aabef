"""URL/domain-level corpus curation — the C4 / RefinedWeb web-curation
step (Raffel et al. 2020 §2.2; Penedo et al. 2023 §3.1): URL
normalization, exact-URL dedup, registrable-domain extraction,
blocklist gating and per-domain document caps.

The reference (a Scala event bus) has no corpus operators at all
(SURVEY.md §2.2); this module is part of the LLM-training-pipeline
surface the engine adds on top. Everything is pure built-in string
expressions — no UDFs — so the whole pipeline stays inside
whole-stage codegen and pushes down like any other projection.

Scale shape: the registrable domain is the NATURAL bucketing key of a
web corpus (every per-domain policy — caps, rate limits, quality
priors — groups by it), so the single shuffle of ``curate_urls`` is a
hash partition on (domain, url) with map-side partial aggregation;
hub-domain skew is bounded by the cap itself (the window rank never
materializes more than the domain's rows, and AQE skew-split handles
the read side). No collect, no cartesian, no data-sized driver state.
"""

from __future__ import annotations

from functools import lru_cache

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# Multi-label public suffixes recognized by ``registrable_domain``. A
# production deployment swaps in the full Mozilla Public Suffix List
# (publicsuffix.org — a broadcast lookup table); this frozen subset
# keeps the operator dependency-free while exercising the exact
# last-2-vs-last-3 label logic the PSL requires.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "ac.uk", "gov.uk", "co.jp", "com.au", "com.br",
    "co.in", "github.io", "blogspot.com",
)

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"
_PREFIX_RE = r"^([^/]*//[^/?#]*)"


@lru_cache(maxsize=64)
def _normalize_sql(col: str) -> str:
    """One-string SQL form of the normalization chain (single F.expr —
    py4j budget rule, CLAUDE.md): strip fragment, strip utm_* tracking
    query, strip the default :443 port, lowercase scheme+authority,
    strip one trailing slash. Each step is RE2-compatible so the DuckDB
    oracle can replay it verbatim (only the group-reference syntax
    differs: ``$1`` here, ``\\1`` there)."""
    u0 = (
        f"regexp_replace(regexp_replace({col}, '#.*$', ''), "
        "'\\\\?utm_[^#]*$', '')"
    )
    u1 = f"regexp_replace({u0}, '^([a-zA-Z]+://[^/:?#]+):443', '$1')"
    pre = f"regexp_extract({u1}, '{_PREFIX_RE}', 1)"
    u2 = f"concat(lower({pre}), substring({u1}, length({pre}) + 1))"
    return f"regexp_replace({u2}, '/$', '')"


def normalize_url(col: str) -> F.Column:
    """Canonical URL for exact dedup: fragment and utm_* tracking
    params stripped, default https port stripped, scheme+host
    lowercased (path case preserved — it is significant), trailing
    slash stripped. Subdomains are NOT stripped — ``www.x.com/p`` and
    ``x.com/p`` are different resources; domain-level policy goes
    through :func:`registrable_domain` instead."""
    return F.expr(_normalize_sql(col))


def url_host(col: str) -> F.Column:
    """Lowercased hostname (authority minus port) of a URL column."""
    return F.lower(F.regexp_extract(F.col(col), _HOST_RE, 1))


@lru_cache(maxsize=8)
def _domain_sql(col: str) -> str:
    suffixes = ", ".join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES)
    parts = f"split({col}, '[.]')"
    last2 = (
        f"concat(try_element_at({parts}, -2), '.', "
        f"try_element_at({parts}, -1))"
    )
    last3 = (
        f"concat(try_element_at({parts}, -3), '.', {last2})"
    )
    return (
        f"coalesce(CASE WHEN size({parts}) >= 3 AND {last2} IN ({suffixes}) "
        f"THEN {last3} WHEN size({parts}) >= 2 THEN {last2} END, {col})"
    )


def registrable_domain(host_col: str) -> F.Column:
    """eTLD+1 (the PSL 'registrable domain'): last two host labels, or
    last three when the last two form a recognized multi-label public
    suffix (:data:`MULTI_LABEL_SUFFIXES`); a label-less host (e.g.
    ``localhost``) passes through. try_element_at keeps the expression
    ANSI-safe on short hosts."""
    return F.expr(_domain_sql(host_col))


def exact_url_dedup(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """Exact URL dedup after normalization: one row per normalized URL,
    keeping the lowest ``id_col`` (deterministic canonical pick). Plain
    hash groupBy — map-side partials make the shuffle carry one row per
    (partition, url)."""
    return (
        df.withColumn("_norm_url", normalize_url(url_col))
        .groupBy("_norm_url")
        .agg(F.min(id_col).alias(id_col))
        .withColumnRenamed("_norm_url", url_col)
    )


def _apply_blocklist(df: DataFrame, blocklist) -> DataFrame:
    """Blocklist gate on the ``domain`` column. A small literal tuple
    stays a scan-side NOT-IN filter; a DataFrame (single string column
    of registrable domains) gates via a broadcast LEFT ANTI join — the
    scale path: real web blocklists run to 10⁵–10⁶ domains, far past
    what an in-plan literal list should carry (plan size, compile,
    task-binary bloat). The anti-join keeps NULL-safe drop-if-present
    semantics identical to NOT IN over non-null lists."""
    if blocklist is None:
        return df
    if isinstance(blocklist, DataFrame):
        bcol = blocklist.columns[0]
        dim = blocklist.select(F.col(bcol).alias("_blocked_domain"))
        return df.join(
            F.broadcast(dim),
            df["domain"] == dim["_blocked_domain"],
            "left_anti",
        )
    if blocklist:
        lits = ", ".join("'" + d.replace("'", "''") + "'" for d in blocklist)
        return df.filter(F.expr(f"domain NOT IN ({lits})"))
    return df


def domain_caps(
    df: DataFrame,
    url_col: str,
    id_col: str,
    cap: int,
    blocklist: tuple[str, ...] | DataFrame = (),
    seed: str = "dc",
) -> DataFrame:
    """Per-domain document cap with blocklist gating: rows whose
    registrable domain is blocklisted drop; within each surviving
    domain rows rank by md5(seed:id) (deterministic pseudo-random — the
    reservoir_per_group pattern, engine-portable) and only the first
    ``cap`` survive. Returns the input columns + ``domain`` + ``rk``.
    ``blocklist`` may be a literal tuple (scan-side NOT IN) or a
    DataFrame of domains (broadcast anti-join — the large-blocklist
    scale path, see _apply_blocklist).

    The rank-then-filter plans as WindowGroupLimit (per-partition
    partial top-k), so a hub domain never shuffles more than
    O(partitions * cap) rows."""
    out = df.withColumn("domain", registrable_domain_of_url(url_col))
    out = _apply_blocklist(out, blocklist)
    rk = F.row_number().over(
        Window.partitionBy("domain").orderBy(
            F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))),
            F.col(id_col),
        )
    )
    return out.withColumn("rk", rk).filter(F.col("rk") <= cap)


@lru_cache(maxsize=8)
def _domain_of_url_sql(url_col: str) -> str:
    host = f"lower(regexp_extract({url_col}, '{_HOST_RE}', 1))"
    return _domain_sql(host)


def registrable_domain_of_url(url_col: str) -> F.Column:
    """registrable_domain(url_host(url)) as one spliced expression."""
    return F.expr(_domain_of_url_sql(url_col))


def curate_urls(
    df: DataFrame,
    url_col: str,
    id_col: str,
    cap: int,
    blocklist: tuple[str, ...] | DataFrame = (),
    seed: str = "dc",
) -> DataFrame:
    """Whole-curation summary per registrable domain: input docs →
    normalize → blocklist gate → exact-URL dedup (keep lowest id) →
    per-domain cap. Returns ``(domain, n_docs, n_urls, n_kept)``:
    raw docs mapped to the domain, distinct normalized URLs, and URLs
    surviving the cap.

    Single-scan shape (the r9 double-scan rule): ONE pass builds the
    (domain, url) grouped frame carrying both the per-URL doc count
    and the canonical id; the domain window and final aggregate then
    reuse its partitioning — scan → shuffle(domain,url) → window
    shuffle(domain) → agg, no second read of the corpus."""
    # spliced-SQL form (the py4j budget rule, CLAUDE.md): each stage is
    # one parsed expression string instead of a ~10-call Column tree —
    # the whole build is ~6 round trips plus the groupBys
    base = df.selectExpr(
        f"{id_col} AS _id",
        _normalize_sql(url_col) + " AS _url",
        _domain_of_url_sql(url_col) + " AS domain",
    )
    base = _apply_blocklist(base, blocklist)
    return (
        base.groupBy("domain", "_url")
        .agg(
            F.expr("count(1) AS _n_docs_url"),
            F.expr("min(_id) AS _keep_id"),
        )
        .withColumn(
            "_rk",
            F.expr(
                "row_number() OVER (PARTITION BY domain ORDER BY "
                f"md5(concat('{seed}:', CAST(_keep_id AS STRING))), "
                "_keep_id)"
            ),
        )
        .groupBy("domain")
        .agg(
            F.expr("CAST(sum(_n_docs_url) AS BIGINT) AS n_docs"),
            F.expr("CAST(count(1) AS BIGINT) AS n_urls"),
            F.expr(
                f"CAST(sum(CAST(_rk <= {int(cap)} AS BIGINT)) AS BIGINT)"
                " AS n_kept"
            ),
        )
    )
