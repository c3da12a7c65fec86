"""Link-graph analytics over the crawl output — integer-exact PageRank.

The reference scores links per-page only (link_preview head peeking +
intrinsic scores, crawl4ai/adaptive_crawler.py link ranking;
functions/link_scoring.py here) — it has no corpus-level authority
signal. At training-pipeline scale, link-graph centrality is the
standard page-quality prior (seed ranking, crawl prioritization,
quality-weighted sampling), so PageRank over the crawled link graph is
a first-class extension, same tier as the dedup components stage.

Scale design (100 TB):
- Edges are (src, dst) longs, deduped once; the per-iteration work is
  one key-partitioned join edges⋈ranks on src and one groupBy on dst —
  no all-pairs, no driver-side graph. Skewed in-degree (hot pages) is
  AQE-skew-join territory; the sum is a partial-aggregatable longsum.
- Iterative lineage is truncated with localCheckpoint every round
  (without it the plan doubles per iteration; see connected_components
  in dedup.py). On a real cluster use reliable checkpoint().
- ALL arithmetic is scaled-integer (floor division, long sums):
  integer sums are order-independent, so results are bit-identical
  across engines, partitionings and retries — the property the
  CORRECTNESS gate's SQL-replay oracle relies on (see
  spark-graft oracle-unlock notes: float summation order is the #1
  cross-engine hash-flake source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
    n_nodes: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank in scaled-integer arithmetic.

    Mass convention: every node starts with `scale` (PR sums to
    N*scale). One update is

        pr'(v) = ((den-num)*scale) div den
                 + num * (insum(v) + dangling div N) div den
        insum(v) = sum over in-edges (u,v) of pr(u) div outdeg(u)

    with div = floor division throughout; `dangling` is the total mass
    of nodes with no out-edges, redistributed uniformly (remainders are
    dropped — deterministic on every engine). Self-loops and duplicate
    edges are removed before the first shuffle.

    Fixed `iters` (no convergence action) keeps the job graph static
    and the result reproducible; for ranking priors a handful of
    rounds is the standard operating point.

    Returns (node, pr) with pr the scaled-integer rank.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
        .persist()
    )
    if nodes is not None:
        uni = nodes.select(
            F.col(node_col or nodes.columns[0]).cast("long").alias("node")
        ).distinct()
    else:
        uni = (
            e.select(F.col("s").alias("node"))
            .unionByName(e.select(F.col("d").alias("node")))
            .distinct()
        )
    if n_nodes is None:
        n_nodes = uni.count()
    base = (damping_den - damping_num) * scale // damping_den

    outdeg = e.groupBy("s").agg(F.count("*").alias("od"))
    pr = uni.withColumn("pr", F.lit(int(scale)).cast("long")).localCheckpoint()

    for _ in range(iters):
        contrib = (
            e.join(pr.select(F.col("node").alias("s"), "pr"), "s")
            .join(outdeg, "s")
            .select("d", F.expr("pr div od").alias("c"))
        )
        insum = contrib.groupBy("d").agg(F.sum("c").alias("insum"))
        # dangling mass: nodes with no out-edges, as a 1-row broadcast
        # (stays plan-side — no per-iteration driver action)
        dang = (
            pr.join(outdeg.select(F.col("s").alias("node")), "node", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0)).cast("long").alias("dang"))
        )
        pr = (
            pr.join(insum.select(F.col("d").alias("node"), "insum"), "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                F.expr(
                    f"CAST({base} AS BIGINT) + {damping_num} * "
                    f"(coalesce(insum, CAST(0 AS BIGINT)) + dang div {n_nodes})"
                    f" div {damping_den}"
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    return pr
