"""Event-analytics batch: funnel conversion, cohort retention, top-k
per group — the product-analytics idioms an event-bus consumer runs
over its own topics, delivered entirely by stock Catalyst (conditional
aggregation, window functions with WindowGroupLimit partial top-k).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from typebus_spark.suite import query, t


@query(
    "q_funnel",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id)
SELECT
  count(*) AS n_users,
  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_viewed,
  CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after,
  CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                 AND t_purchase > t_click
                THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased_after
FROM firsts
""",
    doc=(
        "Funnel conversion (view → click → purchase, strictly ordered "
        "first-touch): one conditional-aggregation pass per user, one "
        "corpus-level rollup — two hash aggregates, map-side partials, "
        "no self-joins."
    ),
)
def q_funnel(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(viewed.cast("int")).cast("long").alias("n_viewed"),
        F.sum(clicked.cast("int")).cast("long").alias("n_clicked_after"),
        F.sum(purchased.cast("int")).cast("long").alias("n_purchased_after"),
    )


@query(
    "q_cohort_retention",
    oracle="""
WITH cohorts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT e.user_id, c.cohort_week,
         CAST(datediff('week', c.cohort_week,
                       date_trunc('week', e.ts)) AS BIGINT) AS week_offset
  FROM events e JOIN cohorts c ON e.user_id = c.user_id)
SELECT cohort_week, week_offset,
       CAST(count(*) AS BIGINT) AS active_users
FROM activity
GROUP BY cohort_week, week_offset
""",
    doc=(
        "Cohort retention: users bucketed by first-seen week, activity "
        "counted per week offset — first-touch aggregate broadcast back "
        "onto the event stream, then distinct + rollup. The classic "
        "retention triangle in three hash-shuffles on the user key."
    ),
)
def q_cohort_retention(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    # to_date: DuckDB date_trunc yields DATE; match the type exactly
    cohorts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = (
        ev.join(F.broadcast(cohorts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    F.datediff(
                        F.to_date(F.date_trunc("week", F.col("ts"))),
                        F.col("cohort_week"),
                    )
                    / 7
                ).cast("long")
            ).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("long").alias("active_users")
    )


@query(
    "q_topk_per_group",
    oracle="""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents)
SELECT source, doc_id, n_chars, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
""",
    doc=(
        "Top-k PER GROUP (longest 3 docs per source): rank-filter that "
        "Catalyst executes with WindowGroupLimit — each map partition "
        "keeps only k rows per group BEFORE the shuffle, so the "
        "exchange carries O(k x groups x partitions), not the corpus."
    ),
)
def q_topk_per_group(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("source", "doc_id", "n_chars", F.col("rk").cast("long").alias("rk"))
    )


@query(
    "q_skew_key_report",
    oracle="""
WITH counts AS (
  SELECT user_id, count(*) AS n_events
  FROM events GROUP BY user_id),
tot AS (SELECT sum(n_events) AS total FROM counts),
r AS (
  SELECT user_id, n_events,
         CAST((n_events * 1000000) // total AS BIGINT) AS share_ppm,
         CAST((sum(n_events) OVER (ORDER BY n_events DESC, user_id
                                   ROWS UNBOUNDED PRECEDING) * 1000000)
              // total AS BIGINT) AS cum_ppm,
         row_number() OVER (ORDER BY n_events DESC, user_id) AS rank
  FROM counts, tot)
SELECT CAST(rank AS BIGINT) AS rank, user_id, n_events,
       share_ppm, cum_ppm
FROM r WHERE rank <= 10
""",
    doc=(
        "Key-skew diagnostics (decides when q_skew_salted_* treatment "
        "is needed): top-10 hottest keys with exact integer parts-per-"
        "million share and cumulative share. One hash aggregate over "
        "the key (map-side partials), the grand total as a broadcast "
        "scalar aggregate, and the top-10 via orderBy+limit "
        "(TakeOrderedAndProject — every map task keeps only its local "
        "top 10, no global sort). The rank/cumsum window then runs "
        "over exactly 10 rows; cumulative sums at rank k only involve "
        "rows of rank <= k, so windowing the survivors is exact."
    ),
)
def q_skew_key_report(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    total = counts.agg(F.sum("n_events").alias("total"))
    top10 = counts.orderBy(F.desc("n_events"), F.col("user_id")).limit(10)
    w = Window.orderBy(F.desc("n_events"), F.col("user_id"))
    cum = Window.orderBy(F.desc("n_events"), F.col("user_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top10.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "user_id",
            "n_events",
            F.expr("(n_events * 1000000) DIV total").alias("share_ppm"),
            (F.sum("n_events").over(cum) * 1000000)
            .cast("long")
            .alias("_cum"),
            F.col("total"),
        )
        .withColumn("cum_ppm", F.expr("_cum DIV total"))
        .select("rank", "user_id", "n_events", "share_ppm", "cum_ppm")
    )


def _zorder_sql(a: str, b: str, bits: int = 8) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({a} & {1 << i}) * {1 << i})")
        terms.append(f"(({b} & {1 << i}) * {1 << (i + 1)})")
    return " + ".join(terms)


@query(
    "q_zorder_layout",
    oracle=f"""
WITH k AS (
  SELECT (user_id % 256) AS ub,
         CAST(hour(ts) AS BIGINT) AS hb
  FROM events),
z AS (SELECT ub, hb, {_zorder_sql('ub', 'hb')} AS zkey FROM k)
SELECT zkey // 4096 AS zbucket,
       count(*) AS n,
       min(ub) AS min_ub, max(ub) AS max_ub,
       min(hb) AS min_hb, max(hb) AS max_hb
FROM z GROUP BY 1
""",
    doc=(
        "Z-order (Morton) layout key: interleave user-bucket and "
        "hour-of-day bits as a pure integer expression, then bucket by "
        "key range — every bucket shows TIGHT min/max on BOTH "
        "dimensions simultaneously (the Delta/Iceberg OPTIMIZE ZORDER "
        "effect: range-partitioned files prune on either filter "
        "column). Exact bit math, engine-portable, no UDF."
    ),
)
def q_zorder_layout(spark, sf_dir):
    from typebus_spark.operators.sink import zorder_key

    ev = t(spark, sf_dir, "events")
    k = ev.select(
        (F.col("user_id") % 256).alias("ub"),
        F.hour("ts").cast("long").alias("hb"),
    )
    z = k.select(
        "ub", "hb", zorder_key("ub", "hb").alias("zkey")
    )
    return z.groupBy(F.expr("zkey DIV 4096").alias("zbucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ub").alias("min_ub"),
        F.max("ub").alias("max_ub"),
        F.min("hb").alias("min_hb"),
        F.max("hb").alias("max_hb"),
    )


@query(
    "q_map_aggregate",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type)
SELECT user_id,
       '{' || string_agg('"' || event_type || '":' || n, ','
                         ORDER BY event_type) || '}' AS activity_map,
       CAST(count(*) AS BIGINT) AS n_types
FROM c GROUP BY user_id
""",
    doc=(
        "MAP-typed aggregation (complex-type surface): per-user "
        "event_type→count built with map_from_entries over a sorted "
        "entry list — one partial-agg shuffle on (user, type), one on "
        "user; serialized to canonical JSON (sorted keys) so the map "
        "value itself is hash-checked against the oracle's string "
        "construction, not just its cardinality."
    ),
)
def q_map_aggregate(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return per_type.groupBy("user_id").agg(
        F.to_json(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("event_type", "n")))
            )
        ).alias("activity_map"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )


@query(
    "q_sketch_kmv_users",
    oracle="""
WITH d AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15))
           ::BIGINT AS h
  FROM events),
r AS (SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM d),
kept AS (SELECT event_type, h FROM r WHERE rn <= 64),
agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
               max(h) AS hk
        FROM kept GROUP BY 1),
x AS (SELECT event_type,
             CASE WHEN n_kept < 64 THEN n_kept
                  ELSE CAST(round(63.0 * 1152921504606846976.0
                                  / CAST(hk AS DOUBLE), 0) AS BIGINT)
             END AS kmv_estimate
      FROM agg),
exact AS (SELECT event_type,
                 CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
          FROM events GROUP BY 1)
SELECT x.event_type, x.kmv_estimate, e.exact_users
FROM x JOIN exact e USING (event_type)
""",
    doc=(
        "KMV (k-minimum-values) distinct-count sketch per event type, "
        "k=64 — the engine-PORTABLE alternative to HyperLogLog "
        "(Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007): built on "
        "the repo's 60-bit md5 scheme, both engines keep identical "
        "minimum hashes, so unlike approx_count_distinct the ESTIMATE "
        "itself is hash-checked, alongside the exact count for an "
        "accuracy read. Bottom-k per group runs as a ranking window "
        "with WindowGroupLimit map-side pruning — k rows per group in "
        "flight, never the distinct set."
    ),
)
def q_sketch_kmv_users(spark, sf_dir):
    from typebus_spark.operators.sketch import kmv_distinct

    ev = t(spark, sf_dir, "events")
    est = kmv_distinct(ev, "event_type", "user_id", k=64, seed="kmv")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return est.join(exact, "event_type")


@query(
    "q_scd2_history",
    oracle="""
WITH p AS (SELECT user_id, ts, event_id, value FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, event_id, value,
             lag(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS pv
      FROM p),
ch AS (SELECT user_id, ts, event_id, value FROM c
       WHERE pv IS NULL OR value <> pv),
h AS (SELECT user_id, value, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM ch)
SELECT user_id, value, valid_from, valid_to,
       (valid_to IS NULL) AS is_current
FROM h
""",
    doc=(
        "SCD type-2 history build (the warehouse change-capture shape): "
        "per-user purchase-value change detection (lag-compare drops "
        "no-change rows) then validity intervals [valid_from, valid_to) "
        "via lead, open-ended row flagged current. Both windows "
        "partition by the user key — per-key state only, no global "
        "ordering, so the history of a 100 TB CDC stream builds with "
        "one shuffle on the key."
    ),
)
def q_scd2_history(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    ch = (
        p.withColumn("pv", F.lag("value").over(w))
        .filter(F.col("pv").isNull() | (F.col("value") != F.col("pv")))
        .drop("pv")
    )
    return (
        ch.withColumn("valid_to", F.lead("ts").over(w))
        .select(
            "user_id",
            "value",
            F.col("ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


@query(
    "q_rollup_incremental",
    oracle="""
SELECT date_trunc('hour', ts) AS h, event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
GROUP BY 1, 2
""",
    doc=(
        "Incremental materialized-view maintenance (continuous-"
        "aggregate / hypertable-rollup shape): the stored hourly rollup "
        "(here derived from the already-ingested 90% of events — in "
        "production a materialized parquet/Delta table) is merged with "
        "the NEW delta's partial aggregates by re-aggregating the "
        "union of aggregate rows — cost proportional to |delta| + "
        "|rollup|, never a full corpus re-scan. The oracle recomputes "
        "from scratch over ALL events, so the hash match PROVES the "
        "incremental merge is lossless (count/sum are associative; "
        "value kept in exact integer cents so merge order cannot drift "
        "the total)."
    ),
)
def q_rollup_incremental(spark, sf_dir):
    from typebus_spark.functions.money import cents

    ev = t(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts")).alias("h")

    def agg(df):
        return df.groupBy(hour, "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("value")).alias("value_cents"),
        )

    # the 90% already-rolled partition stands in for the stored rollup;
    # the 10% tail is the newly-arrived delta
    stored_rollup = agg(ev.filter(F.col("event_id") % 10 < 9))
    delta = agg(ev.filter(F.col("event_id") % 10 == 9))
    return (
        stored_rollup.unionByName(delta)
        .groupBy("h", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("value_cents").alias("value_cents"),
        )
    )


@query(
    "q_profile_quantiles",
    oracle="""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(n_chars, 0.25), 6) AS p25,
       round(quantile_cont(n_chars, 0.50), 6) AS p50,
       round(quantile_cont(n_chars, 0.75), 6) AS p75,
       round(quantile_cont(n_chars, 0.95), 6) AS p95
FROM documents GROUP BY source
""",
    doc=(
        "Per-source EXACT document-length quantiles (the distribution "
        "profile a curation run reports next to q_profile_table's "
        "min/max/null scan): one grouped percentile aggregate computing "
        "all four points from a single per-group buffer. Spark "
        "percentile() and DuckDB quantile_cont share the "
        "linear-interpolation definition h=(n-1)p and matched "
        "bit-exactly on every group in the validation probe. Residual "
        "boundary risk (r10 ADVICE): the two engines' lerp "
        "arithmetic could differ by 1 ulp, and round(...,6) only "
        "absorbs that away from exact half-boundaries — p25/p50/p75 "
        "have exact binary p so only p95's h=(n-1)*0.95 is exposed, "
        "and only when a future fixture lands a group's interpolated "
        "p95 within 1 ulp of a 5e-7 rounding boundary; if this query "
        "ever hash-flips on a new fixture, that is the first suspect "
        "(fix: anchor p95 to element_at(sorted, floor(h)+1) exact "
        "positions on both sides). Exact "
        "percentile state is O(distinct values) per group — fine for "
        "bounded domains like lengths at any scale; the unbounded-"
        "domain swap is approx_percentile (excluded from oracled "
        "queries by the portability rule)."
    ),
)
def q_profile_quantiles(spark, sf_dir):
    qs = F.expr(
        "percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.95D))"
    )
    return (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            qs.alias("_q"),
        )
        .select(
            "source",
            "n_docs",
            F.round(F.col("_q")[0], 6).alias("p25"),
            F.round(F.col("_q")[1], 6).alias("p50"),
            F.round(F.col("_q")[2], 6).alias("p75"),
            F.round(F.col("_q")[3], 6).alias("p95"),
        )
    )


@query(
    "q_profile_table",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS ok_nulls,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS ok_distinct,
       min(l_orderkey) AS ok_min,
       max(l_orderkey) AS ok_max,
       CAST(count(DISTINCT l_returnflag) AS BIGINT) AS rf_distinct,
       min(l_returnflag) AS rf_min,
       max(l_returnflag) AS rf_max,
       min(l_shipdate) AS sd_min,
       max(l_shipdate) AS sd_max,
       min(l_quantity) AS q_min,
       max(l_quantity) AS q_max
FROM lineitem
""",
    doc=(
        "Single-pass table profiling (the ANALYZE/data-quality shape): "
        "row count, per-column null counts, EXACT distinct counts, and "
        "typed min/max in ONE aggregation over the table — Catalyst "
        "plans the multi-distinct as an Expand with map-side partials, "
        "so profiling a 100 TB table costs one scan plus a "
        "per-aggregate-bounded shuffle, with no per-column passes. "
        "Doubles appear only under min/max (exact, drift-free); the "
        "approximate profiling variant at scale is q_sketch_cardinality."
    ),
)
def q_profile_table(spark, sf_dir):
    # DECOMPOSED, not the single Expand aggregate (r9): Catalyst plans
    # a 2-distinct profile as an Expand that pushes 3 projections of
    # EVERY row through one aggregate — measured 2.25 s vs 0.40 s
    # fresh-plan at sf0.1 for the three narrow scans below. The
    # decomposition also wins at 100 TB on columnar storage: each scan
    # is pruned to exactly the columns its aggregate needs (4 + 1 + 1
    # columns) instead of one 4-column scan tripled in-flight, and the
    # two distinct aggregates shuffle pre-reduced partials exactly as
    # before. The three results are 1-row frames, so the recombine is
    # two broadcast joins of scalars.
    #
    # NO ensure_parallelism (r13): min/max/count/sum profiling is
    # scan-bound, not CPU-dense — the spread repartition was a full
    # 4-column shuffle re-executed by all THREE consumers of this
    # frame, and dropping it measured 1.04 -> 0.46 s warm-best at
    # sf0.1 (interleaved 4-variant A/B; persist and a fused
    # groupBy-decomposition both lost to simply not shuffling). At
    # 100 TB the scan already arrives with thousands of splits, so the
    # spread was a no-op there and pure tax here.
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate", "l_quantity"
    )
    plain = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_orderkey").isNull().cast("long")).alias("ok_nulls"),
        F.min("l_orderkey").alias("ok_min"),
        F.max("l_orderkey").alias("ok_max"),
        F.min("l_returnflag").alias("rf_min"),
        F.max("l_returnflag").alias("rf_max"),
        F.min("l_shipdate").alias("sd_min"),
        F.max("l_shipdate").alias("sd_max"),
        F.min("l_quantity").alias("q_min"),
        F.max("l_quantity").alias("q_max"),
    )
    # NULL rows are filtered BEFORE the distinct scans: countDistinct
    # (and the oracle's count(DISTINCT)) exclude NULLs, while groupBy /
    # .distinct() keep a NULL group — a latent off-by-one if either
    # column ever holds NULLs (this query counts ok_nulls, so they are
    # contemplated). ADVICE r9.
    okd = (
        li.filter(F.col("l_orderkey").isNotNull())
        .groupBy("l_orderkey")
        .agg(F.lit(1).alias("_one"))
        .agg(F.count(F.lit(1)).alias("ok_distinct"))
    )
    rfd = (
        li.select("l_returnflag")
        .filter(F.col("l_returnflag").isNotNull())
        .distinct()
        .agg(F.count(F.lit(1)).alias("rf_distinct"))
    )
    return plain.crossJoin(okd).crossJoin(rfd).select(
        "n_rows", "ok_nulls", "ok_distinct", "ok_min", "ok_max",
        "rf_distinct", "rf_min", "rf_max", "sd_min", "sd_max",
        "q_min", "q_max",
    )
