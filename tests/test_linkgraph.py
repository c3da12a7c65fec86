"""Integer-exact PageRank operator tests (operators/linkgraph.py)."""

from pyspark.sql import functions as F

from crawl4ai_spark.operators.linkgraph import pagerank

SCALE = 10**9


def _ref_pagerank(nodes, edges, iters=3, num=85, den=100, scale=SCALE):
    """Driver-side reference with identical floor-division semantics."""
    es = {(a, b) for a, b in edges if a != b}
    outd = {}
    for a, _ in es:
        outd[a] = outd.get(a, 0) + 1
    n = len(nodes)
    base = (den - num) * scale // den
    pr = {v: scale for v in nodes}
    for _ in range(iters):
        insum = {v: 0 for v in nodes}
        for a, b in es:
            insum[b] += pr[a] // outd[a]
        dang = sum(pr[v] for v in nodes if v not in outd)
        pr = {v: base + num * (insum[v] + dang // n) // den for v in nodes}
    return pr


def _lcg_graph(n, m, seed=11):
    state, edges = seed, []
    for _ in range(m):
        state = (state * 1103515245 + 12345) % (2**31)
        a = state % n
        state = (state * 1103515245 + 12345) % (2**31)
        b = state % n
        edges.append((a, b))
    return edges


def test_pagerank_matches_reference_with_dangling(spark):
    n = 120
    edges = _lcg_graph(n, 300)
    # force some dangling nodes: strip all out-edges of nodes 0..9
    edges = [(a, b) for a, b in edges if a >= 10]
    nodes = list(range(n))
    want = _ref_pagerank(nodes, edges)
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(v,) for v in nodes], "id long")
    got = {
        r["node"]: r["pr"]
        for r in pagerank(e, nodes=nd, node_col="id", n_nodes=n).collect()
    }
    assert got == want
    # dangling nodes with no in-links sit at the floor + dangling share
    assert min(got.values()) >= (100 - 85) * SCALE // 100


def test_pagerank_ignores_self_loops_and_duplicate_edges(spark):
    clean = [(0, 1), (1, 2), (2, 0)]
    noisy = clean + [(0, 0), (1, 1), (0, 1), (2, 0)]
    nd = spark.createDataFrame([(v,) for v in range(3)], "id long")
    a = {
        r["node"]: r["pr"]
        for r in pagerank(
            spark.createDataFrame(clean, "src long, dst long"),
            nodes=nd, node_col="id",
        ).collect()
    }
    b = {
        r["node"]: r["pr"]
        for r in pagerank(
            spark.createDataFrame(noisy, "src long, dst long"),
            nodes=nd, node_col="id",
        ).collect()
    }
    assert a == b
    # a 3-cycle is regular: mass stays uniform at the fixed point
    assert len(set(a.values())) == 1


def test_pagerank_partitioning_invariance(spark):
    """Identical bits regardless of input partitioning — the property
    integer arithmetic buys (float PR differs in summation order)."""
    edges = _lcg_graph(80, 200, seed=5)
    nd = spark.createDataFrame([(v,) for v in range(80)], "id long")
    e1 = spark.createDataFrame(edges, "src long, dst long")
    e2 = e1.repartition(13, "dst")
    r1 = {r["node"]: r["pr"] for r in pagerank(e1, nodes=nd, node_col="id").collect()}
    r2 = {r["node"]: r["pr"] for r in pagerank(e2, nodes=nd, node_col="id").collect()}
    assert r1 == r2


def test_pagerank_mass_conservation_bound(spark):
    """Floor division only ever drops mass; total stays within
    n*(iters+1) of n*scale (each node loses < 1 unit per div)."""
    n = 60
    edges = _lcg_graph(n, 150, seed=3)
    nd = spark.createDataFrame([(v,) for v in range(n)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    total = (
        pagerank(e, nodes=nd, node_col="id", iters=3)
        .agg(F.sum("pr").alias("t"))
        .first()["t"]
    )
    assert total <= n * SCALE
    assert total >= n * SCALE - n * 4 * (3 + 1)  # generous slack

# ---------------------------------------------------------------------------
# HITS (integer-L1 hubs/authorities)
# ---------------------------------------------------------------------------

from crawl4ai_spark.operators.linkgraph import hits  # noqa: E402

HSCALE = 10**7


def _ref_hits(nodes, edges, iters=3, scale=HSCALE):
    """Driver-side reference with identical integer-L1 semantics."""
    es = {(a, b) for a, b in edges if a != b}
    n = len(nodes)
    init = scale // max(n, 1)
    h = {v: init for v in nodes}
    a = {v: init for v in nodes}

    def renorm(prev, by_src):
        raw = {v: 0 for v in nodes}
        for s, d in es:
            if by_src:
                raw[d] += prev[s]
            else:
                raw[s] += prev[d]
        tot = sum(raw.values())
        if tot <= 0:
            return None
        return {v: raw[v] * scale // tot for v in nodes}

    for _ in range(iters):
        na = renorm(h, by_src=True)
        a = na if na is not None else a
        nh = renorm(a, by_src=False)
        h = nh if nh is not None else h
    return h, a


def test_hits_matches_reference(spark):
    n = 100
    edges = _lcg_graph(n, 260, seed=7)
    nodes = list(range(n))
    want_h, want_a = _ref_hits(nodes, edges)
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(v,) for v in nodes], "id long")
    rows = hits(e, nodes=nd, node_col="id").collect()
    got_h = {r["node"]: r["hub"] for r in rows}
    got_a = {r["node"]: r["authority"] for r in rows}
    assert got_h == want_h
    assert got_a == want_a


def test_hits_hub_vs_authority_separation(spark):
    """A pure directory page (only out-links) must rank as hub not
    authority; a pure target page the reverse."""
    # node 0 links to 1..4; 5..8 all link to 9
    edges = [(0, t) for t in range(1, 5)] + [(s, 9) for s in range(5, 9)]
    nd = spark.createDataFrame([(v,) for v in range(10)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    rows = {r["node"]: r for r in hits(e, nodes=nd, node_col="id").collect()}
    assert rows[0]["hub"] > rows[0]["authority"]
    assert rows[9]["authority"] > rows[9]["hub"]
    best_hub = max(rows.values(), key=lambda r: (r["hub"], -r["node"]))
    assert best_hub["node"] == 0


def test_hits_partitioning_invariance(spark):
    edges = _lcg_graph(70, 180, seed=13)
    nd = spark.createDataFrame([(v,) for v in range(70)], "id long")
    e1 = spark.createDataFrame(edges, "src long, dst long")
    e2 = e1.repartition(11, "src")
    k = lambda rows: {(r["node"]): (r["hub"], r["authority"]) for r in rows}
    assert k(hits(e1, nodes=nd, node_col="id").collect()) == k(
        hits(e2, nodes=nd, node_col="id").collect()
    )


def test_hits_empty_graph_keeps_init(spark):
    """Zero edges: both raw sums are 0 every round -> values stay at
    the initial scale//n split rather than dividing by zero."""
    nd = spark.createDataFrame([(v,) for v in range(4)], "id long")
    e = spark.createDataFrame([], "src long, dst long")
    rows = hits(e, nodes=nd, node_col="id").collect()
    init = HSCALE // 4
    assert all(r["hub"] == init and r["authority"] == init for r in rows)


# ------------------------------------------------------------- anchor stats


def test_anchor_stats_counts_and_top(spark):
    from crawl4ai_spark.operators.linkgraph import anchor_stats

    rows = [
        (1, 10, "Docs"),
        (2, 10, "docs  "),   # normalizes to the same anchor
        (3, 10, "home"),
        (4, 20, "blog"),
        (5, 20, None),       # null -> ""
    ]
    df = spark.createDataFrame(rows, ["src", "dst", "anchor"])
    out = {r["dst"]: r for r in anchor_stats(df).collect()}
    assert out[10]["n_inlinks"] == 3
    assert out[10]["n_anchors"] == 2
    assert out[10]["top_anchor"] == "docs"
    assert out[10]["top_anchor_cnt"] == 2
    assert out[20]["n_inlinks"] == 2
    assert out[20]["n_anchors"] == 2
    # tie at cnt=1: lexicographically greatest anchor wins ("blog" > "")
    assert out[20]["top_anchor"] == "blog"


def test_anchor_stats_tie_break_deterministic(spark):
    from crawl4ai_spark.operators.linkgraph import anchor_stats

    rows = [(i, 1, a) for i, a in enumerate(["x", "y", "x", "y"])]
    df = spark.createDataFrame(rows, ["src", "dst", "anchor"])
    for _ in range(3):
        (r,) = anchor_stats(df).collect()
        assert (r["top_anchor"], r["top_anchor_cnt"]) == ("y", 2)


def test_anchor_stats_no_normalize(spark):
    from crawl4ai_spark.operators.linkgraph import anchor_stats

    df = spark.createDataFrame([(1, 1, "A"), (2, 1, "a")], ["src", "dst", "anchor"])
    (r,) = anchor_stats(df, normalize=False).collect()
    assert r["n_anchors"] == 2


def test_hits_scale_below_node_count_raises(spark):
    import pytest as _pytest

    e = spark.createDataFrame([(i, i + 1) for i in range(4)], "src long, dst long")
    with _pytest.raises(ValueError, match="scale"):
        hits(e, scale=3)  # 5 nodes > scale: init floors to 0


def test_pagerank_int64_bound_raises(spark):
    import pytest as _pytest

    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with _pytest.raises(ValueError, match="int64"):
        pagerank(e, scale=10**9, n_nodes=10**12)
