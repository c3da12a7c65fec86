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
    # guaranteed-safe int64 bound: insum(v) can approach the total mass
    # n_nodes*scale (a hub receiving nearly everything, or the dangling
    # sum on a mostly-dangling graph), and the update multiplies it by
    # damping_num before the div. Past this bound ANSI mode aborts
    # mid-iteration and non-ANSI silently corrupts ranks — fail fast
    # with the fix instead. scale=1e7 admits ~1e10 nodes.
    if damping_num * n_nodes * scale >= 2**63:
        raise ValueError(
            f"pagerank: damping_num*n_nodes*scale = "
            f"{damping_num * n_nodes * scale} exceeds int64 — lower "
            f"`scale` (need scale < {2**63 // max(damping_num * n_nodes, 1)} "
            f"for {n_nodes} nodes)"
        )
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
    # release dead per-iteration checkpoints (see connected_components)
    import gc

    gc.collect()
    return pr


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    iters: int = 3,
    scale: int = 10**7,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg hubs/authorities) in
    scaled-integer arithmetic with L1 renormalization.

    One round:  a_raw(v) = Σ over in-edges (u,v) of h(u);
                a = a_raw * scale div Σ a_raw  (L1 renorm, floor div);
                h_raw(u) = Σ over out-edges (u,v) of a(v);
                h = h_raw * scale div Σ h_raw.

    L1 instead of the textbook L2 norm keeps every step in integer
    arithmetic (order-independent sums → bit-identical across engines
    and partitionings, SQL-replayable); the induced ranking is the
    same. Overflow bound: scale² · max_degree must stay under 2^63 —
    scale=1e7 admits degrees up to ~9×10⁴; lower `scale` for denser
    graphs. Zero-edge graphs (or a side whose raw sum is 0) keep their
    previous values rather than dividing by zero.

    Same scale shape as `pagerank`: per-round two key-partitioned
    joins + groupBys, 1-row broadcast for the normalization scalar,
    localCheckpoint lineage truncation. Hub pages (link hubs) are the
    classic seed-discovery signal a crawler wants from its own output.

    Returns (node, hub, authority) scaled-integer scores.
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
    n_nodes = uni.count()
    if n_nodes > scale:
        # init = scale // n_nodes would floor to 0, and the tot==0
        # renorm guard would then preserve the zeros every round — an
        # all-zero result with no error. The same L1 budget must also
        # give distinguishable per-node shares, so fail fast.
        raise ValueError(
            f"hits: scale ({scale}) must be >= the node count "
            f"({n_nodes}) or every score floors to 0; raise `scale` "
            "(keeping scale^2 * max_degree < 2^63)"
        )
    init = int(scale) // max(n_nodes, 1)
    st = uni.select(
        "node",
        F.lit(init).cast("long").alias("h"),
        F.lit(init).cast("long").alias("a"),
    ).localCheckpoint()

    def _renorm_phase(state, edge_from, edge_to, in_col, out_col):
        """out_col(x) = renormalized Σ of in_col over edges grouped on
        edge_to; nodes with no incident edges get 0."""
        raw = (
            e.join(
                state.select(F.col("node").alias(edge_from), in_col), edge_from
            )
            .groupBy(edge_to)
            .agg(F.sum(in_col).alias("_raw"))
        )
        tot = raw.agg(
            F.coalesce(F.sum("_raw"), F.lit(0)).cast("long").alias("_tot")
        )
        return (
            state.join(
                raw.select(F.col(edge_to).alias("node"), "_raw"), "node", "left"
            )
            .crossJoin(F.broadcast(tot))
            .withColumn(
                out_col,
                F.when(
                    F.col("_tot") > 0,
                    F.expr(f"coalesce(_raw, CAST(0 AS BIGINT)) * {int(scale)} div _tot"),
                ).otherwise(F.col(out_col)).cast("long"),
            )
            .drop("_raw", "_tot")
        )

    for _ in range(iters):
        # authorities from hubs (in-edges), then hubs from NEW authorities
        st = _renorm_phase(st, "s", "d", "h", "a")
        st = _renorm_phase(st, "d", "s", "a", "h").localCheckpoint()
    e.unpersist()
    # release dead per-iteration checkpoints (see connected_components)
    import gc

    gc.collect()
    return st.select("node", F.col("h").alias("hub"), F.col("a").alias("authority"))


def anchor_stats(
    links: DataFrame,
    dst: str = "dst",
    anchor: str = "anchor",
    normalize: bool = True,
) -> DataFrame:
    """Inbound anchor-text aggregation per link target — the classic
    webgraph description signal (anchor text describes the TARGET
    better than the target's own page; the scrape stage already
    harvests it per link, functions/scrape.py links.text, mirroring
    the reference's link dicts in
    crawl4ai/content_scraping_strategy.py, but nothing aggregated it
    corpus-wide).

    Input: one row per (source page, link) with the link's target in
    ``dst`` and its anchor text in ``anchor`` (e.g. the exploded
    ``links`` array of crawl results). NULL anchors count as "".

    Output per target: ``(dst, n_inlinks, n_anchors, top_anchor,
    top_anchor_cnt)`` — total inbound links, distinct anchor strings,
    and the most frequent anchor (ties broken by lexicographically
    GREATEST anchor, the deterministic order ``max(struct)`` gives).

    Scale design (100 TB): two groupBy stages, both with map-side
    partial aggregation — (dst, anchor) counts first, then a per-dst
    fold whose input is one row per DISTINCT anchor, so a target with
    a billion identical inbound anchors ("google") costs one row in
    stage 2; no windows, no skew-exposed wide keys.
    """
    a = F.coalesce(F.col(anchor), F.lit(""))
    if normalize:
        a = F.lower(F.trim(a))
    per = (
        links.select(F.col(dst).alias("_dst"), a.alias("_a"))
        .groupBy("_dst", "_a")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    return (
        per.groupBy("_dst")
        .agg(
            F.sum("_cnt").alias("n_inlinks"),
            F.count(F.lit(1)).alias("n_anchors"),
            F.max(F.struct(F.col("_cnt"), F.col("_a"))).alias("_top"),
        )
        .select(
            F.col("_dst").alias(dst),
            F.col("n_inlinks").cast("long").alias("n_inlinks"),
            F.col("n_anchors").cast("long").alias("n_anchors"),
            F.col("_top._a").alias("top_anchor"),
            F.col("_top._cnt").cast("long").alias("top_anchor_cnt"),
        )
    )
