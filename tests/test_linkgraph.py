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
