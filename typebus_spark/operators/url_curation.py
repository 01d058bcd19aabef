"""URL/domain-level corpus curation — the C4 / RefinedWeb web-curation
step (Raffel et al. 2020 §2.2; Penedo et al. 2023 §3.1): URL
normalization, exact-URL dedup, registrable-domain extraction,
blocklist gating and per-domain document caps.

The reference (a Scala event bus) has no corpus operators at all
(SURVEY.md §2.2); this module is part of the LLM-training-pipeline
surface the engine adds on top. Everything is built-in string
expressions — no UDFs — and pushes down like any other projection;
the one deliberate codegen exception is the PSL dispatch's bounded
1-element lambda (see psl_registrable_sql: the expanded CASE
overflowed Janino's 64 KB method limit and re-paid the FAILED compile
every execution).

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

from typebus_spark.operators._psl_snapshot import (
    PSL_EXCEPTIONS_2LABEL,
    PSL_EXCEPTIONS_3LABEL,
    PSL_SUFFIXES_2LABEL,
    PSL_SUFFIXES_3LABEL,
    PSL_WILDCARD_BASES_1LABEL,
    PSL_WILDCARD_BASES_2LABEL,
    sql_in_list,
)

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"
_PREFIX_RE = r"^([^/]*//[^/?#]*)"


@lru_cache(maxsize=64)
def _normalize_sql(col: str) -> str:
    """One-string SQL form of the normalization chain (single F.expr —
    py4j budget rule, CLAUDE.md): strip fragment, strip each utm_*
    tracking param individually (separator fixed up — non-tracking
    params survive, r11 ADVICE), strip the default :443 port from
    https URLs only (r11 ADVICE: :443 is not http's default), lowercase
    scheme+authority, strip one trailing slash. Each step is
    RE2-compatible so a DuckDB oracle can replay it verbatim (only the
    group-reference syntax differs: ``$1`` here, ``\\1`` there).

    utm params are matched anywhere in the query string via the three
    exhaustive positions (``&utm_…``, leading ``?utm_…&``, lone
    ``?utm_…``); a literal ``&utm_`` inside a PATH segment (legal but
    vanishingly rare) would also match — accepted approximation."""
    u0 = f"regexp_replace({col}, '#.*$', '')"
    u1 = f"regexp_replace({u0}, '&utm_[^&]*', '')"
    u2 = f"regexp_replace({u1}, '[?]utm_[^&]*&', '?')"
    u3 = f"regexp_replace({u2}, '[?]utm_[^&]*$', '')"
    u4 = (
        f"regexp_replace({u3}, "
        "'(?i)^(https://[^/:?#]+):443([/?#]|$)', '$1$2')"
    )
    pre = f"regexp_extract({u4}, '{_PREFIX_RE}', 1)"
    u5 = f"concat(lower({pre}), substring({u4}, length({pre}) + 1))"
    return f"regexp_replace({u5}, '/$', '')"


def normalize_url(col: str) -> F.Column:
    """Canonical URL for exact dedup: fragment stripped, every utm_*
    tracking param stripped (other query params kept, in place),
    default https port stripped, scheme+host lowercased (path case
    preserved — it is significant), trailing slash stripped. Subdomains
    are NOT stripped — ``www.x.com/p`` and ``x.com/p`` are different
    resources; domain-level policy goes through
    :func:`registrable_domain` instead."""
    return F.expr(_normalize_sql(col))


def url_host(col: str) -> F.Column:
    """Lowercased hostname (authority minus port) of a URL column."""
    return F.lower(F.regexp_extract(F.col(col), _HOST_RE, 1))


def psl_registrable_sql(host: str, dialect: str = "spark") -> str:
    """The PSL registrable-domain CASE over a host expression, in either
    engine dialect — longest-rule-wins over the frozen snapshot's plain
    / wildcard / exception rules (operators/_psl_snapshot.py; publicsuffix
    .org, 2025 snapshot subset), with the PSL default ``*`` rule (unknown
    TLD → last two labels) as the ELSE arm. A host that IS a public
    suffix (or has a single label) has no registrable domain and passes
    through unchanged via the outer coalesce.

    Dialect differences are mechanical: label split (regex-class vs
    literal separator), negative list indexing (``try_element_at`` vs
    ``list_extract``), and NULL-propagating concat (Spark ``concat``
    propagates NULL; DuckDB ``concat`` IGNORES NULLs, so the DuckDB form
    must use ``||``). IN-lists splice from one frozen table so both
    engines read identical rules.

    The Spark form binds the label array ONCE as a lambda variable
    (``transform(array(split(host)), p -> CASE …)``): the naive
    expansion splices the host expression into every lastK reference —
    ~10 copies of a potentially regex-deep host (curate_urls derives
    host from a 600-char synthetic URL), and the resulting single CASE
    expression overflowed Janino's 64 KB method limit. A FAILED compile
    is not cached, so every execution re-paid it (~1.3 s/pass at
    sf0.001, 3× the query's honest cost) and then evaluated
    interpreted WITHOUT subexpression elimination — 10 regex extracts
    per row. The 1-element-array lambda is the bounded-array HOF case
    the codegen-boundary rule allows; host splices exactly twice
    (split + final coalesce). DuckDB has no such limit — its branch
    keeps the expanded form."""
    if dialect == "spark":

        def el(k: int) -> str:
            return f"try_element_at(p, {k})"

        def cat(a: str, b: str) -> str:
            return f"concat({a}, '.', {b})"

    elif dialect == "duckdb":
        parts = f"string_split({host}, '.')"

        def el(k: int) -> str:
            return f"list_extract({parts}, {k})"

        def cat(a: str, b: str) -> str:
            return f"({a} || '.' || {b})"

    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown dialect: {dialect!r}")

    last1 = el(-1)
    last2 = cat(el(-2), last1)
    last3 = cat(el(-3), last2)
    last4 = cat(el(-4), last3)
    exc3 = sql_in_list(PSL_EXCEPTIONS_3LABEL)
    exc2 = sql_in_list(PSL_EXCEPTIONS_2LABEL)
    sfx3 = sql_in_list(PSL_SUFFIXES_3LABEL)
    sfx2 = sql_in_list(PSL_SUFFIXES_2LABEL)
    wild2 = sql_in_list(PSL_WILDCARD_BASES_2LABEL)
    wild1 = sql_in_list(PSL_WILDCARD_BASES_1LABEL)
    case = (
        "CASE "
        # exception rules beat the wildcards they punch through
        f"WHEN {last3} IN ({exc3}) THEN {last3} "
        f"WHEN {last2} IN ({exc2}) THEN {last2} "
        # 3-label suffixes and 2-label wildcard bases → last 4 labels
        f"WHEN {last3} IN ({sfx3}) OR {last2} IN ({wild2}) THEN {last4} "
        # 2-label suffixes and 1-label wildcard bases → last 3 labels
        f"WHEN {last2} IN ({sfx2}) OR {last1} IN ({wild1}) THEN {last3} "
        # PSL default rule '*': the TLD is the suffix → last 2 labels
        f"ELSE {last2} END"
    )
    if dialect == "spark":
        return (
            f"coalesce(element_at(transform(array(split({host}, "
            f"'[.]')), p -> {case}), 1), {host})"
        )
    return f"coalesce({case}, {host})"


@lru_cache(maxsize=8)
def _domain_sql(col: str) -> str:
    return psl_registrable_sql(col, "spark")


def registrable_domain(host_col: str) -> F.Column:
    """eTLD+1 (the PSL 'registrable domain') under the frozen Public
    Suffix List snapshot (operators/_psl_snapshot.py — publicsuffix.org
    subset, 2025): plain, wildcard (``*.ck``-class) and exception
    (``!city.kobe.jp``-class) rules with longest-match-wins, defaulting
    unknown TLDs to last-2 labels per the PSL ``*`` rule. Fixes the r11
    last-2/last-3 heuristic that mis-bucketed ``*.co.uk``-class domains
    (r11 verdict item 2). A label-less host (``localhost``) or a host
    that IS a public suffix passes through. All literal IN-lists plan
    as InSet (hash lookup, still whole-stage codegen); the full 9k-rule
    list would swap to a broadcast lookup table (the _apply_blocklist
    DataFrame pattern) — same semantics, one broadcast join."""
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
