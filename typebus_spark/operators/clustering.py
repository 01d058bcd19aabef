"""Duplicate-cluster resolution: connected components over near-dup
pairs.

Pair generators (``jaccard_pairs``, ``minhash_lsh_pairs``, ...) emit
edges; a training pipeline needs the CLUSTERS — every document linked
through any chain of near-dup pairs collapses to one canonical keeper.
That is connected components, the one genuinely ITERATIVE algorithm in
the corpus pipeline.

Implementation: min-label propagation. Every vertex starts labeled with
its own id; each round every vertex takes the minimum label in its
closed neighborhood; converged when no label changes. Rounds needed =
graph diameter — near-dup clusters are shallow (most are cliques from
a single bucket, diameter 1-2), so the loop is short in practice and
``max_iter`` bounds the worst case. Each round is one join + one
aggregate (shuffle on the vertex key), localCheckpointed so lineage
stays flat; the convergence probe is an aggregate over the (small)
label frame, never a collect of it.

At 100 TB-corpus scale the state is one row per DISTINCT PAIRED doc —
orders of magnitude smaller than the corpus (dup rates are a few
percent) — and each round shuffles only that.
"""

from __future__ import annotations

from functools import lru_cache

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


# The propagation loop rebuilds identical Column trees every hop (3
# hops/round x rounds, plus the leakage-split and cluster queries are
# stateful so the bench re-builds them per pass) — measured py4j
# hotspot (tools/py4j_sites.py). Columns are immutable JVM handles;
# caching the static fragments is safe across plans.
@lru_cache(maxsize=4)
def _sym_cols(a_col: str, b_col: str) -> tuple:
    return (
        (F.col(a_col).alias("src"), F.col(b_col).alias("dst")),
        (F.col(b_col).alias("src"), F.col(a_col).alias("dst")),
    )


@lru_cache(maxsize=1)
def _cc_step_cols() -> tuple:
    """(neighbor-label projection, grouped-id, nmin agg, output cols)."""
    return (
        (F.col("id").alias("dst"), F.col("label").alias("dst_label")),
        F.col("src").alias("id"),
        F.min("dst_label").alias("nmin"),
        (
            F.least(
                F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
            ).alias("label"),
            (F.col("nmin") < F.col("label")).alias("_changed"),
        ),
    )


@lru_cache(maxsize=8)
def _pr_cols(damping_pct: int, base_unit: int) -> tuple:
    """Loop-invariant PageRank fragments (rank projection, contribution,
    sum agg, damped update) — ONE parse each instead of per-iteration
    rebuilds."""
    teleport = (100 - damping_pct) * base_unit // 100
    return (
        (F.col("id").alias("src"), F.col("r")),
        (F.col("dst").alias("id"), F.expr("r DIV deg").alias("c")),
        F.sum("c").alias("s"),
        F.expr(
            f"{teleport}L + ({damping_pct} * coalesce(s, 0L)) DIV 100"
        ).alias("r"),
    )


@lru_cache(maxsize=1)
def _cc_misc_cols() -> tuple:
    return (
        F.col("src").alias("id"),
        F.sum(F.coalesce(F.col("_changed").cast("int"), F.lit(0))),
        (F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")),
    )


def _sym_edges(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Symmetrized edge list, checkpointed. The union reads ``pairs``
    twice and there is no cross-branch CSE through a Union — without
    the persist the (expensive) pair-generation pipeline would execute
    once per direction inside the edge materialization."""
    from pyspark import StorageLevel

    p = pairs.select(a_col, b_col).persist(StorageLevel.MEMORY_AND_DISK)
    fwd, rev = _sym_cols(a_col, b_col)
    return (
        p.select(*fwd)
        .unionByName(p.select(*rev))
        .distinct()
        .localCheckpoint(eager=False)  # materialized by the first probe
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """(doc_id, cluster_id) for every doc appearing in ``pairs``;
    cluster_id = the minimum doc id reachable through the pair graph."""
    edges = _sym_edges(pairs, a_col, b_col)
    dst_lbl, grp_id, nmin_agg, out_cols = _cc_step_cols()
    src_id, changed_agg, result_cols = _cc_misc_cols()
    labels = (
        edges.select(src_id)
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=False)
    )

    def step(lbls):
        neighbor_min = (
            edges.join(lbls.select(*dst_lbl), "dst")
            .groupBy(grp_id)
            .agg(nmin_agg)
        )
        return lbls.join(neighbor_min, "id", "left_outer").select(
            "id", *out_cols
        )

    # THREE propagation hops per materialization round, and convergence
    # certified by the LAST hop alone: labels only ever decrease, so if
    # one full hop produces zero changes the fixed point is reached —
    # regardless of what earlier hops in the same round did. That means
    # a diameter-≤2 component graph (near-dup clusters are mostly
    # cliques) converges in ONE driver sync (hops 1-2 do the work, hop 3
    # certifies), where the previous OR-across-hops bookkeeping needed a
    # second round plus two extra joins per round just to merge flags.
    # The label frame is tiny (one row per paired doc), so three joins
    # of plan depth cost far less than an extra checkpoint job +
    # convergence collect.
    hops = 3
    changed = None
    for _ in range(max(1, -(-max_iter // hops))):
        cur = labels
        for _h in range(hops - 1):
            cur = step(cur).drop("_changed")
        final = step(cur).localCheckpoint(eager=False)
        # lazy checkpoint: the convergence aggregate below is the
        # action that materializes it — one job per round
        changed = final.agg(changed_agg).collect()[0][0]
        labels = final.drop("_changed")
        if not changed:
            break
    if changed:
        # No silent caps: labels are still moving — returning them would
        # silently mis-cluster any component whose diameter exceeds
        # max_iter (min-label moves one hop per round).
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            f"rounds ({changed} labels still changing); raise max_iter "
            "for deep-chain graphs"
        )
    return labels.select(*result_cols)


def pagerank_fixed(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank over the (undirected) pair graph in
    EXACT integer nano-units — duplicate-centrality scoring whose every
    step is engine-reproducible, so the whole iterative algorithm is
    value-checkable against a SQL oracle (the Lloyd's-trainer pattern
    applied to graph analytics).

    All arithmetic is integer: ranks live in 1e-9 units (init 1.0 =
    1_000_000_000), per-edge contribution is ``rank DIV degree``, and
    the damped update is ``(100 - d)% * 1e9 / 100 + (d% * sum) DIV 100``
    — no float ever enters, so partial-aggregation order cannot drift
    the result. Returns (id, rank double) with rank = units / 1e9.

    Scale shape: degree is one aggregate over the edge list; each
    iteration is one join (edges x ranks, shuffle on the vertex key) +
    one sum aggregate — state is one row per PAIRED doc, as in
    connected_components. ``iters`` is deliberately fixed (unrollable
    into the oracle), the standard choice for ranking features where
    convergence-to-epsilon isn't required.
    """
    base_unit = 1_000_000_000
    edges = _sym_edges(pairs, a_col, b_col)
    (rank_src, contrib_cols, s_agg, damped) = _pr_cols(
        damping_pct, base_unit
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select(
        F.col("src").alias("id"), F.lit(base_unit).alias("r")
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks.select(*rank_src), "src")
            .join(deg, "src")
            .select(*contrib_cols)
            .groupBy("id")
            .agg(s_agg)
        )
        # No per-iteration checkpoint: ``iters`` is small and fixed, so
        # the full unrolled lineage (3 joins of the persisted edge
        # frame) is one bounded AQE DAG — each checkpoint was a separate
        # materialization job (+ its AQE stage jobs), tripling the
        # driver-side job count for zero lineage benefit at this depth.
        ranks = (
            ranks.drop("r")
            .join(contrib, "id", "left_outer")
            .select("id", damped)
        )
    return ranks.select(
        "id",
        F.round(F.col("r").cast("double") / base_unit, 6).alias("rank"),
    )
