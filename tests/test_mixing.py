"""Training-mix operator invariants (beyond the oracle equality)."""

from __future__ import annotations

import pyspark.sql.functions as F

from typebus_spark.functions.text import tokens
from typebus_spark.operators.mixing import (
    pack_sequences,
    stratified_sample,
    token_budget_mix,
)
from typebus_spark.session import load_table


def test_stratified_sample_is_stable_and_proportional(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fr = {"src0": 1.0, "src1": 0.5}
    a = stratified_sample(docs, "doc_id", "source", fr, 0.0, seed=42)
    b = stratified_sample(docs, "doc_id", "source", fr, 0.0, seed=42)
    ids_a = {r[0] for r in a.select("doc_id").collect()}
    ids_b = {r[0] for r in b.select("doc_id").collect()}
    assert ids_a == ids_b  # deterministic membership
    n0 = docs.filter(F.col("source") == "src0").count()
    k0 = a.filter(F.col("source") == "src0").count()
    assert k0 == n0  # fraction 1.0 keeps everything
    # growing the corpus must never evict a previously-kept doc
    shrunk = stratified_sample(
        docs.limit(200), "doc_id", "source", fr, 0.0, seed=42
    )
    ids_small = {r[0] for r in shrunk.select("doc_id").collect()}
    assert ids_small <= ids_a


def test_token_budget_respected_up_to_one_straddler(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(tokens("text")).cast("long")
    )
    budget = 1500
    mixed = token_budget_mix(
        docs, "doc_id", "source", "n_tokens", budget_per_source=budget
    )
    stats = (
        mixed.groupBy("source")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.max("n_tokens").alias("biggest"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert stats
    for r in stats:
        # only the final (straddling) doc may cross the budget line
        assert r["total"] < budget + r["biggest"], r
        assert r["n"] >= 1  # first doc always admitted


def test_pack_sequences_spans_are_contiguous_and_complete(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(tokens("text")).cast("long")
    )
    packed = pack_sequences(
        docs, "doc_id", "n_tok", max_tokens=256, n_shards=4
    )
    assert packed.filter(F.col("start_seq") > F.col("end_seq")).count() == 0
    # token conservation: packing reassigns every document exactly once
    assert packed.count() == docs.count()
    per_shard = (
        packed.groupBy("shard")
        .agg(F.sum("n_tokens").alias("tok"), F.max("end_seq").alias("last"))
        .collect()
    )
    for r in per_shard:
        # the final sequence index is exactly ceil(shard_tokens/256) - 1:
        # concat-and-chunk leaves no empty sequences and no token gaps
        assert r["last"] == (r["tok"] + 255) // 256 - 1, r


def test_token_budget_mix_bucket_width_invariant(spark, sf_dir):
    """The two-phase prefix sum must be EXACT: changing the bucket
    granularity (1 hex char = 16 buckets vs 2 = 256) cannot change
    which documents are admitted — bucket offsets compose with
    intra-bucket cumsums to the same global prefix sum."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(tokens("text")).cast("long")
    )
    kept = [
        {
            r[0]
            for r in token_budget_mix(
                docs, "doc_id", "source", "n_tok", 5_000,
                seed=42, bucket_chars=bc,
            ).select("doc_id").collect()
        }
        for bc in (1, 2, 3)
    ]
    assert kept[0] == kept[1] == kept[2]
    assert kept[0]  # non-trivial: the budget admits something


def test_temperature_mix_upweights_low_resource_groups(spark):
    """alpha=1/2 temperature sampling: p is proportional to sqrt(n), so
    the big group's share shrinks vs raw and the small group's grows;
    the keep rate caps at 1.0 when budget*p exceeds the group size; the
    md5-uniform sample is deterministic across reruns."""
    from typebus_spark.operators.mixing import temperature_mix

    rows = [(i, "big" if i < 400 else "small") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = {
        r["grp"]: r
        for r in temperature_mix(df, "doc_id", "grp", budget=450).collect()
    }
    # raw shares: big 0.8 / small 0.2; sqrt-tempered: 20/(20+10)=2/3, 1/3
    assert abs(out["big"]["p"] - 2 / 3) < 1e-6
    assert abs(out["small"]["p"] - 1 / 3) < 1e-6
    # small: 450 * (1/3) / 100 = 1.5 -> capped at 1.0, all docs kept
    assert out["small"]["rate"] == 1.0
    assert out["small"]["n_sampled"] == 100
    # big: 450 * (2/3) / 400 = 0.75 -> uncapped Bernoulli keep
    assert out["big"]["rate"] == 0.75
    assert 0 < out["big"]["n_sampled"] < 400
    rerun = {
        r["grp"]: r["n_sampled"]
        for r in temperature_mix(df, "doc_id", "grp", budget=450).collect()
    }
    assert rerun == {g: r["n_sampled"] for g, r in out.items()}
