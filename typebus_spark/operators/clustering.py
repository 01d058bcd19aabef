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

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _sym_edges(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Symmetrized edge list, checkpointed. The union reads ``pairs``
    twice and there is no cross-branch CSE through a Union — without
    the persist the (expensive) pair-generation pipeline would execute
    once per direction inside the edge materialization."""
    from pyspark import StorageLevel

    p = pairs.select(a_col, b_col).persist(StorageLevel.MEMORY_AND_DISK)
    return (
        p.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            p.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
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
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=False)
    )
    def step(lbls):
        neighbor_min = (
            edges.join(
                lbls.select(
                    F.col("id").alias("dst"),
                    F.col("label").alias("dst_label"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("dst_label").alias("nmin"))
        )
        return lbls.join(neighbor_min, "id", "left_outer").select(
            "id",
            F.least(
                F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
            ).alias("label"),
            (F.col("nmin") < F.col("label")).alias("_changed"),
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
        changed = final.agg(
            F.sum(F.coalesce(F.col("_changed").cast("int"), F.lit(0)))
        ).collect()[0][0]
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
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


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
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select(
        F.col("src").alias("id"), F.lit(base_unit).alias("r")
    )
    teleport = (100 - damping_pct) * base_unit // 100
    for _ in range(iters):
        contrib = (
            edges.join(
                ranks.select(F.col("id").alias("src"), "r"), "src"
            )
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                F.expr("r DIV deg").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        # No per-iteration checkpoint: ``iters`` is small and fixed, so
        # the full unrolled lineage (3 joins of the persisted edge
        # frame) is one bounded AQE DAG — each checkpoint was a separate
        # materialization job (+ its AQE stage jobs), tripling the
        # driver-side job count for zero lineage benefit at this depth.
        ranks = (
            ranks.drop("r")
            .join(contrib, "id", "left_outer")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * coalesce(s, 0L)) DIV 100"
                    )
                ).alias("r"),
            )
        )
    return ranks.select(
        "id",
        F.round(F.col("r").cast("double") / base_unit, 6).alias("rank"),
    )
