"""Relational inventory, part 4 — the six TPC-H shapes that need a
``partsupp``/``l_shipmode`` stand-in (Q2/Q9/Q11/Q12/Q16/Q20).

The driver star schema carries no ``partsupp`` table and no
``l_shipmode``/``l_receiptdate``/``l_commitdate`` columns, so these six
queries derive the missing relation from ``lineitem`` itself — the
observed (part, supplier) trade pairs ARE the supply catalog — and swap
the ship-mode dimension for ``l_returnflag``. Each docstring notes the
adaptation; the query SHAPE (correlated min, profit decomposition,
scalar-subquery threshold, conditional priority counts, distinct-pair
counting, majority-share semi-join) is the TPC-H original's.

Same physical discipline as relational.py: broadcast dims, one fact
shuffle, map-side partials, exact integer-cents arithmetic end-to-end
(see functions/money.py) with a single final division, pinned by
``tests/test_plans.py``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from typebus_spark.functions.money import cents, money
from typebus_spark.suite import query, t


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS cost_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey, l_suppkey),
ranked AS (
  SELECT l_partkey, l_suppkey, cost_c,
         min(cost_c) OVER (PARTITION BY l_partkey) AS best_c
  FROM ps)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       CAST(cost_c AS DOUBLE) / 100.0 AS supply_cost
FROM ranked
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE cost_c = best_c AND p_size = 15 AND p_type = 'SMALL'
""",
    doc=(
        "TPC-H Q2 adapted (no partsupp: the supply catalog is the "
        "observed lineitem (part, supplier) pairs, cost = min extended "
        "price in exact cents): for every size-15 SMALL part, the "
        "EUROPE supplier(s) quoting the minimum cost. The correlated "
        "min-cost subquery becomes a window min over the pair aggregate "
        "— one fact shuffle on (part, supp), then a tiny window; all "
        "dims broadcast. Ties keep every best supplier, as the original "
        "does."
    ),
)
def q2_min_cost_supplier(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", cents("l_extendedprice").alias("price_c")
    )
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = (
        t(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    p = (
        t(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
        .select("p_partkey", "p_brand")
    )
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = (
        l.join(F.broadcast(eu_supp.select("s_suppkey")),
               l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("price_c").alias("cost_c"))
    )
    w = Window.partitionBy("l_partkey")
    best = ps.withColumn("best_c", F.min("cost_c").over(w)).filter(
        F.col("cost_c") == F.col("best_c")
    )
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(eu_supp), best.l_suppkey == eu_supp.s_suppkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            money(F.col("cost_c"), 100).alias("supply_cost"),
        )
    )


@query(
    "q9_product_profit",
    oracle="""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                - 100 * CAST(round(p_retailprice * 100, 0) AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE)
       / 10000.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, year(o_orderdate)
""",
    doc=(
        "TPC-H Q9 adapted (no partsupp: supply cost = the part's retail "
        "price, so profit = discounted revenue − retailprice·qty): "
        "profit on '%gear%' parts by supplier nation and order year. "
        "Every term stays in exact 1e-4-dollar integers until one final "
        "division; l_quantity is integer-valued in the fixtures and "
        "cast, not rounded. Part/supplier/nation broadcast; the only "
        "shuffles are the orders join and the final small aggregate."
    ),
)
def q9_product_profit(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        cents("l_extendedprice").alias("price_c"),
        cents("l_discount").alias("disc_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", cents("p_retailprice").alias("retail_c"))
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (
                F.col("price_c") * (F.lit(100) - F.col("disc_c"))
                - F.lit(100) * F.col("retail_c") * F.col("qty")
            ).alias("profit_e4"),
        )
    )
    return profit.groupBy("nation", "o_year").agg(
        money(F.sum("profit_e4"), 10000).alias("sum_profit")
    )


@query(
    "q11_important_parts",
    oracle="""
WITH val AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
              AS BIGINT) AS value_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey)
SELECT l_partkey AS ps_partkey,
       CAST(value_c AS DOUBLE) / 100.0 AS part_value
FROM val
WHERE 1000 * value_c > (SELECT CAST(sum(value_c) AS BIGINT) FROM val)
""",
    doc=(
        "TPC-H Q11 adapted (no partsupp: a part's 'stock value' at a "
        "nation's suppliers = the traded extended-price total from "
        "lineitem): parts holding more than 0.1% of NATION_7's total "
        "value. The correlated scalar threshold stays integer on both "
        "engines (1000·value > total — no float fraction crosses the "
        "engine boundary). Spark materializes the per-part aggregate "
        "once and broadcasts the one-row total back over it."
    ),
)
def q11_important_parts(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", cents("l_extendedprice").alias("price_c")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_7")
        .select("n_nationkey")
    )
    supp7 = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    val = (
        l.join(F.broadcast(supp7), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("price_c").alias("value_c"))
    )
    total = val.agg(F.sum("value_c").alias("total_c"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.lit(1000) * F.col("value_c") > F.col("total_c"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            money(F.col("value_c"), 100).alias("part_value"),
        )
    )


@query(
    "q12_priority_by_returnflag",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
""",
    doc=(
        "TPC-H Q12 adapted (no l_shipmode/l_receiptdate: the grouping "
        "dimension is l_returnflag and the date band is the 1997 ship "
        "year): high- vs low-priority line counts per return flag. The "
        "ship-date filter pushes to the lineitem scan before the orders "
        "join; the conditional counts are one map-side partial "
        "aggregate over a 3-group key."
    ),
)
def q12_priority_by_returnflag(spark, sf_dir):
    l = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 14, 23, 36, 45)
  AND l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    doc=(
        "TPC-H Q16 adapted (no partsupp: the part-supplier relation is "
        "the distinct observed lineitem pairs; the 'customer complaint' "
        "exclusion is suppliers in negative account balance): distinct "
        "supplier counts per (brand, type, size) over eight sizes. "
        "Distinct-pair projection first (map-side), then a broadcast "
        "part join, a broadcast anti-join for excluded suppliers, and "
        "one count-distinct aggregate."
    ),
)
def q16_supplier_part_counts(spark, sf_dir):
    # NO distinct-pairs pre-projection (r13): the final
    # countDistinct(l_suppkey) per (brand, type, size) group already
    # collapses duplicate (partkey, suppkey) observations — the
    # DISTINCT was a full shuffle of every lineitem pair that the
    # aggregate then re-deduplicated. Dropping it also lets the
    # broadcast part filter (8 of 50 sizes) prune rows BEFORE the only
    # remaining exchange, so the distinct-agg shuffles the filtered
    # partial-distinct set instead of the whole pair space (strictly
    # fewer bytes at any scale; 1.19 -> 0.84 s warm-best at sf0.1).
    pairs = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 7, 10, 14, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .join(
            F.broadcast(bad),
            pairs.l_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt")
        )
    )


@query(
    "q20_promotable_suppliers",
    oracle="""
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty97
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey),
majority AS (
  SELECT DISTINCT l_suppkey
  FROM (SELECT l_suppkey, qty97,
               CAST(sum(qty97) OVER (PARTITION BY l_partkey) AS BIGINT)
                 AS part_total
        FROM shipped)
  WHERE 2 * qty97 > part_total)
SELECT s_suppkey, s_name
FROM supplier
JOIN majority ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
""",
    doc=(
        "TPC-H Q20 adapted (no partsupp availqty: a supplier is "
        "'promotable' when it shipped the MAJORITY of a red part's 1997 "
        "volume — 2·own > part total, the exact-integer form of the "
        "original's 0.5·sum threshold): ASIA suppliers dominating at "
        "least one 'red%' part. The per-part total is a window sum over "
        "the already-aggregated (part, supplier) frame — no second "
        "shuffle of the fact table — and the nation/region probe is a "
        "broadcast semi-join at the end."
    ),
)
def q20_promotable_suppliers(spark, sf_dir):
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    shipped = (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty97"))
    )
    w = Window.partitionBy("l_partkey")
    majority = (
        shipped.withColumn("part_total", F.sum("qty97").over(w))
        .filter(F.lit(2) * F.col("qty97") > F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = (
        t(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    return (
        s.join(majority, s.s_suppkey == majority.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name")
    )
