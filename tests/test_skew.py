"""Salting utilities: result-equivalence with the unsalted forms and
partition-spreading of the hot key."""

from __future__ import annotations

import pyspark.sql.functions as F

from typebus_spark.operators.skew import salted_aggregate, salted_join, with_salt


def _skewed(spark):
    # one hot key (90%) + tail
    hot = spark.range(900).select(
        F.lit("HOT").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    tail = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id") % 10).alias("k"),
        F.lit(1.0).alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"]): (r["total"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r["k"]): (r["total"], r["n"])
        for r in salted_aggregate(
            df,
            ["k"],
            {
                "total": (F.sum("v"), F.sum("total")),
                "n": (F.count(F.lit(1)), F.sum("n")),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salt_spreads_hot_key(spark):
    df = with_salt(_skewed(spark).filter(F.col("k") == "HOT"), 8)
    n_distinct = df.select("_salt").distinct().count()
    assert n_distinct >= 4  # hot key spread over multiple reducers


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("HOT", "hot-dim"), ("k1", "dim1"), ("k2", "dim2")],
        "k string, label string",
    )
    plain = sorted(
        (r["k"], r["v"], r["label"])
        for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["label"])
        for r in salted_join(big, small, "k", n_salts=4).collect()
    )
    assert salted == plain
