"""Full-PSL broadcast-table path (operators/psl_table.py, r12 verdict
next-round item 3)."""

import pyspark.sql.functions as F


def test_psl_table_matches_literal_on_snapshot_hosts(spark):
    """On hosts whose suffix IS in the frozen snapshot, the broadcast
    table must reproduce the literal-CASE path bit-for-bit — every rule
    class: plain 2/3-label, wildcard 1/2-label, both exceptions,
    unknown TLD default-*, pass-through."""
    from typebus_spark.operators.psl_table import registrable_domain_table
    from typebus_spark.operators.url_curation import registrable_domain

    hosts = [
        "www.example.com",
        "a.b.example.co.uk",
        "user.github.io",
        "deep.sub.user.github.io",
        "example.com",
        "localhost",
        "a.blogspot.co.uk",
        "deep.a.blogspot.co.uk",
        "x.mysite.s3.amazonaws.com",
        "w.x.y.kobe.jp",
        "x.y.kobe.jp",
        "sub.city.kobe.jp",
        "city.kobe.jp",
        "b.a.foo.ck",
        "a.www.ck",
        "www.ck",
        "a.b.x.unknowntld",
        "qq.qld.edu.au",
        "d.qq.qld.edu.au",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    got = registrable_domain_table(df, "h", out_col="d_table").withColumn(
        "d_lit", registrable_domain("h")
    )
    bad = got.filter(F.col("d_table") != F.col("d_lit")).collect()
    assert not bad, [(r["h"], r["d_table"], r["d_lit"]) for r in bad]


def test_psl_table_dispatches_beyond_snapshot(spark):
    """Hosts whose suffix is ONLY in PSL_EXTRA_RULES must resolve via
    the table (the literal path would mis-bucket them under the
    default-* rule) — this is the r12 verdict's proof requirement."""
    from typebus_spark.operators.psl_table import registrable_domain_table
    from typebus_spark.operators.url_curation import registrable_domain

    cases = [
        ("a.b.example.co.ir", "example.co.ir"),
        ("www.site.com.kz", "site.com.kz"),
        ("x.portal.gov.by", "portal.gov.by"),
        ("s.uni.ac.tz", "uni.ac.tz"),
        ("shop.co.uz", "shop.co.uz"),
        # the literal subset would call these 'co.ir' / 'com.kz' etc.
    ]
    df = spark.createDataFrame(cases, "h string, want string")
    got = registrable_domain_table(df, "h", out_col="d").collect()
    bad = [(r["h"], r["d"], r["want"]) for r in got if r["d"] != r["want"]]
    assert not bad, bad
    # and confirm the literal path really lacks them (guards against
    # someone folding the extra rules into the snapshot literals and
    # silently turning this test into the previous one)
    lit = df.select("h", registrable_domain("h").alias("d")).collect()
    assert all(r["d"] != w for r, (_, w) in zip(lit, cases)), (
        "extra rules leaked into the literal snapshot"
    )


def test_psl_table_plan_broadcast_no_shuffle(spark):
    """Plan pin (r12 verdict item 3): every rules join is a broadcast
    hash join; the domain computation adds NO shuffle exchange."""
    from typebus_spark.operators.psl_table import registrable_domain_table

    df = spark.range(100).selectExpr(
        "concat('h', cast(id as string), '.example.co.ir') AS h"
    )
    out = registrable_domain_table(df, "h")
    out.collect()  # AQE dedups exchanges at stage materialization
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("+- == Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final, plan
    assert "ShuffleExchange" not in final and "Exchange hashpartitioning" not in final, plan
    # r13: the per-depth joins probe per-depth RENAMES of the one rules
    # frame, so the broadcast must be BUILT once and REUSED for the
    # deeper joins (3 sequential broadcast builds were ~60% of the
    # query's warm wall before the unification). Reuse happens when AQE
    # materializes the stages, hence the collect() above.
    builds = final.count("BroadcastExchange") - final.count("ReusedExchange")
    assert builds == 1, final
    assert final.count("ReusedExchange") == 3, final


def test_psl_rules_frame_loader_hit(spark):
    """Loader-hit pin (CLAUDE.md frozen-artifact rule): the second
    psl_rules_frame call for the same app must return the memoized
    frame — identical object, no rebuild."""
    from typebus_spark.operators import psl_table

    a = psl_table.psl_rules_frame(spark)
    b = psl_table.psl_rules_frame(spark)
    assert a is b, "rules frame rebuilt on 2nd call"


def test_parse_psl_dat_format():
    """parse_psl_rules reads the standard .dat format and feeds the
    same table machinery (the production full-list path)."""
    import pytest

    from typebus_spark.operators.psl_table import (
        _aggregate_rules,
        parse_psl_rules,
    )

    text = """
// ===BEGIN ICANN DOMAINS===
com
co.uk
*.ck
!www.ck
// comment
jp
*.kobe.jp
!city.kobe.jp
"""
    rules = parse_psl_rules(text)
    assert ("com", "plain") in rules
    assert ("ck", "wildcard") in rules
    assert ("www.ck", "exception") in rules
    assert ("city.kobe.jp", "exception") in rules
    agg = _aggregate_rules(rules)
    # www.ck: exception only → eff_exc = 1, others absent
    row = [r for r in agg[2] if r[0] == "www.ck"][0]
    assert row == ("www.ck", -1, -1, 1)
    # ck: wildcard → eff_wild = 2
    row = [r for r in agg[1] if r[0] == "ck"][0]
    assert row == ("ck", -1, 2, -1)
    with pytest.raises(ValueError):
        parse_psl_rules("*.a.b.c.d.e")


def test_psl_table_with_parsed_full_rules(spark):
    """End-to-end over a parsed .dat text containing a rule the
    built-ins lack entirely (4-label private rule) — the deepest join
    arm works."""
    from typebus_spark.operators.psl_table import (
        parse_psl_rules,
        registrable_domain_table,
    )

    rules = parse_psl_rules("com\nuk\nco.uk\ncdn.prod.example.com\n")
    df = spark.createDataFrame(
        [
            ("x.cdn.prod.example.com", "x.cdn.prod.example.com"),
            ("a.x.cdn.prod.example.com", "x.cdn.prod.example.com"),
            ("b.example.com", "example.com"),
            ("b.example.co.uk", "example.co.uk"),
        ],
        "h string, want string",
    )
    got = registrable_domain_table(df, "h", rules=rules, out_col="d").collect()
    bad = [(r["h"], r["d"], r["want"]) for r in got if r["d"] != r["want"]]
    assert not bad, bad
