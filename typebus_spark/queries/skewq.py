"""Skew-mitigation inventory queries.

``events.event_type`` has 5 values over ~1M rows at sf1 — exactly the
hot-key shape where a single-phase groupBy funnels each key through one
reducer. The salted forms spread each hot key over N reducers; because
every aggregate used is algebraic and the join is an equi-join, the
FINAL RESULT is independent of the (deliberately nondeterministic) salt
assignment — which is what makes these oracle-checkable against the
plain SQL forms.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from typebus_spark.functions.money import cents, money
from typebus_spark.operators.skew import salted_aggregate, salted_join
from typebus_spark.suite import query, t


@query(
    "q_skew_salted_agg",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY event_type
""",
    doc=(
        "Two-phase salted aggregation over the 5-hot-key event_type "
        "column: phase 1 aggregates on (key, salt) so each hot key "
        "spreads across reducers, phase 2 merges partials — the result "
        "is salt-invariant for algebraic aggregates, so it hash-checks "
        "against the plain GROUP BY."
    ),
)
def q_skew_salted_agg(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        ["event_type"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "_cents": (F.sum(cents("value")), F.sum("_cents")),
            "min_value": (F.min("value"), F.min("min_value")),
            "max_value": (F.max("value"), F.max("max_value")),
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n",
        money(F.col("_cents"), 100).alias("total_value"),
        "min_value",
        "max_value",
    )


@query(
    "q_skew_salted_join",
    oracle="""
SELECT c_mktsegment,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
       / 100.0 AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    doc=(
        "Salted equi-join: the big side's keys are salted and the small "
        "side is replicated once per salt, so a hot customer's orders "
        "land on n_salts reducers instead of one — the broadcast-"
        "unfriendly skewed-join fix. Equi-join semantics are salt-"
        "invariant, hash-checked against the plain join."
    ),
)
def q_skew_salted_join(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    joined = salted_join(o, c, on="custkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money(F.sum(cents("o_totalprice")), 100).alias("total_price"),
    )
