"""Second relational batch: cube/grouping sets, EXCEPT, exact
percentiles, scalar subqueries (via the engine.sql surface), date
arithmetic. All stock Catalyst (§2.2)."""

from __future__ import annotations

import pyspark.sql.functions as F

from typebus_spark.sql import sql as engine_sql
from typebus_spark.suite import query, t


@query(
    "q7_nation_volume",
    oracle="""
WITH li AS (
  SELECT l_orderkey, l_suppkey, l_shipdate,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS epc,
         CAST(round(l_discount * 100, 0) AS BIGINT)      AS dc
  FROM lineitem)
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       year(l_shipdate) AS ship_year,
       CAST(sum(epc * (100 - dc)) AS DOUBLE) / 10000.0 AS volume
FROM li
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_nationkey <> n2.n_nationkey
GROUP BY 1, 2, 3
""",
    doc="TPC-H Q7 style cross-nation trade volume (self-joined dim, year bucketing).",
)
def q7_nation_volume(spark, sf_dir):
    from typebus_spark.functions.money import cents, money

    rev_e4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    # ONE nation dim probed twice via ALIASES (r13): per-side renamed
    # projections made two distinct canonical broadcast subplans — the
    # 25-row table was scanned AND broadcast-built twice, in sequence
    # (two of the query's 7 floor stages). Aliasing one frame keeps the
    # canonical plan identical, so AQE builds the broadcast once and
    # ReusedExchange serves the supplier side (the source_overlap s1/s2
    # and PSL unified-dim pattern, CLAUDE.md r13).
    nd = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nd.alias("n1")
    n2 = nd.alias("n2")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .filter(F.col("n1.n_nationkey") != F.col("n2.n_nationkey"))
        .groupBy(
            F.col("n1.n_name").alias("cust_nation"),
            F.col("n2.n_name").alias("supp_nation"),
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(money(F.sum(rev_e4), 10000).alias("volume"))
        .select(
            "cust_nation",
            "supp_nation",
            F.col("ship_year").cast("long").alias("ship_year"),
            "volume",
        )
    )


@query(
    "q10_returned_revenue",
    oracle="""
WITH li AS (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS epc,
         CAST(round(l_discount * 100, 0) AS BIGINT)      AS dc
  FROM lineitem WHERE l_returnflag = 'R')
SELECT c_custkey, c_name,
       CAST(sum(epc * (100 - dc)) AS DOUBLE) / 10000.0 AS lost_revenue,
       count(*) AS n_returned_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN li     ON l_orderkey = o_orderkey
GROUP BY c_custkey, c_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 style: customers ranked by returned-item revenue, deterministic top-k.",
)
def q10_returned_revenue(spark, sf_dir):
    from typebus_spark.functions.money import cents, money

    rev_e4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            money(F.sum(rev_e4), 10000).alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_cube_events",
    oracle="""
SELECT event_type, month(ts) AS m,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
         AS total
FROM events
GROUP BY CUBE (event_type, month(ts))
""",
    doc="CUBE grouping sets over type × month.",
)
def q_cube_events(spark, sf_dir):
    from typebus_spark.functions.money import cents, money

    ev = t(spark, sf_dir, "events").select(
        "event_type", F.month("ts").alias("m"), "value"
    )
    return ev.cube("event_type", "m").agg(
        F.count(F.lit(1)).alias("n"),
        money(F.sum(cents("value")), 100).alias("total"),
    )


@query(
    "q_grouping_sets_orders",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
    doc="Explicit GROUPING SETS via the engine.sql surface.",
)
def q_grouping_sets_orders(spark, sf_dir):
    return engine_sql(
        spark,
        sf_dir,
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
    )


@query(
    "q_except_viewers_not_buyers",
    oracle="""
SELECT user_id FROM events
WHERE event_type = 'view' AND ts < TIMESTAMP '2024-01-08'
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-08'
""",
    doc=(
        "Set operation: EXCEPT — first-week viewers who hadn't "
        "purchased yet (time-windowed so the fixture yields a "
        "non-trivial result; over all time every viewer eventually "
        "buys)."
    ),
)
def q_except_viewers_not_buyers(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-08").cast("timestamp")
    )
    viewers = ev.filter(F.col("event_type") == "view").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return viewers.subtract(buyers)  # EXCEPT (distinct semantics)


@query(
    "q_percentiles",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(min(value), 2) AS lo,
       round(max(value), 2) AS hi
FROM events
GROUP BY event_type
""",
    doc="Exact interpolated percentiles (Spark percentile ≡ DuckDB quantile_cont).",
)
def q_percentiles(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
    )


@query(
    "q_sql_scalar_subquery",
    oracle="""
SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
FROM customer c
WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
""",
    doc="Correlated scalar subquery through engine.sql (Catalyst decorrelation).",
)
def q_sql_scalar_subquery(spark, sf_dir):
    return engine_sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """,
    )


@query(
    "q_ship_latency",
    oracle="""
SELECT o_orderpriority,
       round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_days,
       max(date_diff('day', o_orderdate, l_shipdate)) AS max_days,
       count(*) AS n
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    doc="Date arithmetic: order→ship latency per priority.",
)
def q_ship_latency(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    dd = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.avg(dd), 4).alias("avg_days"),
            F.max(dd).cast("long").alias("max_days"),
            F.count(F.lit(1)).alias("n"),
        )
    )
