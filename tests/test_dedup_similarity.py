"""Dedup + similarity operator tests."""

import numpy as np
from pyspark.sql import functions as F

from crawl4ai_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from crawl4ai_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
    embedding_neardup_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the sun sets slowly "
    "behind the tall green hills of the quiet northern valley every evening"
)
NEAR = BASE.replace("quick", "swift")  # one token differs
FAR = (
    "completely different content about database systems and distributed "
    "query processing engines running on large compute clusters at scale"
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR), (4, BASE)], ["doc_id", "text"]
    )


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark), "text", "doc_id")
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 2, 3]  # doc 4 == doc 1 dropped, keep smallest id


def test_minhash_signature_properties(spark):
    df = _docs(spark)
    rows = df.select("doc_id", minhash_signature("text", 32).alias("sig")).collect()
    sigs = {r["doc_id"]: r["sig"] for r in rows}
    assert len(sigs[1]) == 32
    assert sigs[1] == sigs[4]  # identical docs → identical signatures
    agree_near = sum(a == b for a, b in zip(sigs[1], sigs[2])) / 32
    agree_far = sum(a == b for a, b in zip(sigs[1], sigs[3])) / 32
    assert agree_near > agree_far
    assert agree_near > 0.5


def test_minhash_lsh_pairs(spark):
    out = minhash_lsh_pairs(
        _docs(spark), "text", "doc_id", num_hashes=64, bands=16, jaccard_threshold=0.5
    )
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in out.collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup caught
    assert (1, 3) not in pairs and (2, 3) not in pairs  # far apart


def test_simhash_near_vs_far(spark):
    df = _docs(spark)
    rows = df.select("doc_id", simhash("text").alias("h")).collect()
    h = {r["doc_id"]: r["h"] for r in rows}
    assert h[1] == h[4]
    near_d = bin((h[1] ^ h[2]) & ((1 << 64) - 1)).count("1")
    far_d = bin((h[1] ^ h[3]) & ((1 << 64) - 1)).count("1")
    assert near_d < far_d


def test_simhash_pairs(spark):
    # n_tables must exceed max_hamming for full pigeonhole recall
    out = simhash_pairs(
        _docs(spark), "text", "doc_id", max_hamming=10, n_tables=16
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 4) in pairs
    assert (1, 3) not in pairs


def test_simhash_pairs_rejects_incomplete_recall_config(spark):
    """max_hamming > n_tables-1 would be SILENTLY incomplete (pairs
    whose differing bits span every block share no key) — raise."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(_docs(spark), "text", "doc_id", max_hamming=10)


def test_ngram_jaccard_pairs(spark):
    out = ngram_jaccard_pairs(
        _docs(spark), "text", "doc_id", threshold=0.5, max_shingle_df=None
    )
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs  # high overlap
    assert (1, 3) not in pairs


def _emb_df(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(16)
    rows = []
    for i in range(20):
        v = rng.randn(16)
        rows.append((i, [float(x) for x in v]))
    rows.append((100, [float(x) for x in base]))
    rows.append((101, [float(x) for x in base + 0.01 * rng.randn(16)]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), base


def test_cosine_topk(spark):
    df, base = _emb_df(spark)
    out = cosine_topk(df, "embedding", list(base), k=2).collect()
    ids = [r["vec_id"] for r in out]
    assert ids[0] == 100 and out[0]["cosine_sim"] > 0.999
    assert ids[1] == 101 and out[1]["cosine_sim"] > 0.99


def test_cosine_topk_lsh_matches_exact_top1(spark):
    df, base = _emb_df(spark)
    out = cosine_topk_lsh(df, "embedding", list(base), k=1, n_planes=6).collect()
    assert out[0]["vec_id"] == 100


def test_embedding_neardup(spark):
    df, _ = _emb_df(spark)
    out = embedding_neardup_pairs(df, "embedding", "vec_id", threshold=0.98, n_planes=8)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (100, 101) in pairs


def test_on_real_embeddings_table(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    out = cosine_topk(emb, "embedding", list(q), k=3).collect()
    assert out[0]["vec_id"] == 0  # self is most similar
    assert abs(out[0]["cosine_sim"] - 1.0) < 1e-6


def test_ngram_jaccard_algorithms_agree(spark, sf_dir):
    """The inverted-index and prefix-filtered strategies must produce
    byte-identical pair sets (prefix filtering is lossless by the
    AllPairs theorem)."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(200)
    near = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    u = docs.unionByName(near)
    for t in (0.5, 0.9):
        got = {}
        for algo in ("inverted", "prefix"):
            rows = ngram_jaccard_pairs(
                u, "text", "doc_id", threshold=t, algorithm=algo
            ).collect()
            got[algo] = sorted(
                (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in rows
            )
        assert got["inverted"] == got["prefix"], f"threshold {t}"
        assert len(got["inverted"]) >= 200  # the exact-copy pairs at least


def test_ivf_topk_recall_and_pruning(spark, sf_dir):
    """IVF ANN: probing nprobe/n_centroids of the corpus must still
    recover most of the exact brute-force top-k, and the candidate set
    must actually be pruned."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.similarity import cosine_topk, cosine_topk_ivf

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in df.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {r["vec_id"] for r in cosine_topk(df, "embedding", qvec, k=10,
                                              id_cols=["vec_id"]).collect()}
    approx_df = cosine_topk_ivf(df, "embedding", qvec, k=10,
                                n_centroids=16, nprobe=4)
    approx = {r["vec_id"] for r in approx_df.collect()}
    assert len(approx) == 10
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    assert 0 in approx  # the query vector itself is its own best match

    # full probe = exact: with nprobe == n_centroids nothing is pruned
    full = {r["vec_id"] for r in cosine_topk_ivf(df, "embedding", qvec, k=10,
                                                 n_centroids=16,
                                                 nprobe=16).collect()}
    assert full == exact


# ---------------------------------------------------------------------------
# Connected components + resolution
# ---------------------------------------------------------------------------


def _uf_components(n_nodes, edges):
    """Driver-side union-find ground truth."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # compress fully, then relabel each root to the component MIN id
    comp = {}
    for v in range(n_nodes):
        comp.setdefault(find(v), []).append(v)
    out = {}
    for members in comp.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def test_connected_components_chain_star_singleton(spark):
    from crawl4ai_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (3, 2), (4, 3), (5, 4), (10, 11), (12, 10), (13, 10)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 4, 5, 10, 11, 12, 13, 20]], "id long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, nodes=nodes, node_col="id").collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0,
                   10: 10, 11: 10, 12: 10, 13: 10, 20: 20}


def test_connected_components_matches_union_find(spark):
    """Pseudo-random graph (seeded LCG, no global RNG) vs union-find."""
    from crawl4ai_spark.operators.dedup import connected_components

    n = 200
    state, edges = 7, []
    for _ in range(160):
        state = (state * 1103515245 + 12345) % (2**31)
        a = state % n
        state = (state * 1103515245 + 12345) % (2**31)
        b = state % n
        if a != b:
            edges.append((a, b))
    want = _uf_components(n, edges)
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(e, nodes=nodes, node_col="id").collect()
    }
    assert got == want


def test_connected_components_long_path_converges_fast(spark):
    """A 64-node path has diameter 63; pointer jumping must close it in
    far fewer than 63 rounds (O(log d)) — max_iter=10 suffices."""
    from crawl4ai_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    got = connected_components(edges, max_iter=10).collect()
    assert {r["component"] for r in got} == {0}
    assert len(got) == 64


def test_resolve_duplicates_keep_first(spark):
    from crawl4ai_spark.operators.dedup import resolve_duplicates

    ids = spark.createDataFrame([(i,) for i in range(6)], "doc long")
    pairs = spark.createDataFrame([(2, 4), (4, 0)], "id_a long, id_b long")
    rows = {r["doc"]: r for r in resolve_duplicates(ids, pairs, "doc").collect()}
    assert rows[0]["is_canonical"] == 1 and rows[0]["csize"] == 3
    assert rows[2]["is_canonical"] == 0 and rows[2]["component"] == 0
    assert rows[4]["is_canonical"] == 0
    # untouched docs are their own canonical singletons
    for d in (1, 3, 5):
        assert rows[d]["is_canonical"] == 1 and rows[d]["csize"] == 1


def test_connected_components_duplicate_and_reversed_edges(spark):
    """Multi-edges, self-loops and both orientations collapse before
    the first shuffle — same labels as the clean edge list."""
    from crawl4ai_spark.operators.dedup import connected_components

    noisy = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 2), (3, 3), (2, 3)],
        "id_a long, id_b long",
    )
    got = {
        r["node"]: r["component"] for r in connected_components(noisy).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


# ---------------------------------------------------------------- line dedup


def _line_docs(spark):
    # explicit lines: "nav" is corpus-wide boilerplate (3 docs), "foot"
    # appears twice, everything else is unique
    rows = [
        (1, ["nav", "alpha one", "foot"]),
        (2, ["nav", "beta two", "foot"]),
        (3, ["nav", "gamma three"]),
        (4, ["delta four"]),
        (5, []),  # empty doc must survive with empty text
    ]
    return spark.createDataFrame(rows, ["doc_id", "lines"])


def test_line_dedup_explicit_lines(spark):
    from crawl4ai_spark.operators.dedup import line_dedup

    out = line_dedup(
        _line_docs(spark), "text", "doc_id", min_dup=2, lines_col="lines"
    )
    got = {r["doc_id"]: (r["text"], r["kept_lines"], r["removed_lines"])
           for r in out.collect()}
    assert got[1] == ("alpha one", 1, 2)
    assert got[2] == ("beta two", 1, 2)
    assert got[3] == ("gamma three", 1, 1)
    assert got[4] == ("delta four", 1, 0)
    assert got[5] == ("", 0, 0)


def test_line_dedup_min_dup_threshold(spark):
    from crawl4ai_spark.operators.dedup import line_dedup

    # min_dup=3: only "nav" (3 occurrences) is boilerplate; "foot" (2) stays
    out = line_dedup(
        _line_docs(spark), "text", "doc_id", min_dup=3, lines_col="lines"
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got[1] == "alpha one foot"
    assert got[2] == "beta two foot"
    assert got[3] == "gamma three"


def test_line_dedup_all_boilerplate_doc(spark):
    from crawl4ai_spark.operators.dedup import line_dedup

    rows = [(1, ["x", "y"]), (2, ["x", "y"])]
    df = spark.createDataFrame(rows, ["doc_id", "lines"])
    out = line_dedup(df, "text", "doc_id", min_dup=2, lines_col="lines")
    for r in out.collect():
        assert r["text"] == "" and r["kept_lines"] == 0 and r["removed_lines"] == 2


def test_line_dedup_hash_kinds_agree(spark):
    from crawl4ai_spark.operators.dedup import line_dedup

    df = _line_docs(spark)
    outs = [
        sorted(
            line_dedup(df, "text", "doc_id", lines_col="lines", hash_kind=k)
            .collect(),
            key=lambda r: r["doc_id"],
        )
        for k in ("xxhash64", "md5", "raw")
    ]
    assert outs[0] == outs[1] == outs[2]


def test_line_dedup_word_windows_matches_python(spark, sf_dir):
    """Default fixed-word-window path vs a pure-python replay on the
    real documents table (order preservation + global counting)."""
    from crawl4ai_spark.operators.dedup import line_dedup

    pdf = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
        .toPandas()
    )
    df = spark.createDataFrame(pdf)
    out = {
        r["doc_id"]: (r["text"], r["kept_lines"], r["removed_lines"])
        for r in line_dedup(df, "text", "doc_id", min_dup=2, line_len=10).collect()
    }

    def wlines(t):
        ws = t.split(" ")
        return [" ".join(ws[i * 10:(i + 1) * 10])
                for i in range((len(ws) + 9) // 10)] if ws != [""] else [""]

    from collections import Counter

    counts = Counter(
        ln for t in pdf["text"] for ln in wlines(t)
    )
    for _, row in pdf.iterrows():
        keep = [ln for ln in wlines(row["text"]) if counts[ln] < 2]
        drop = [ln for ln in wlines(row["text"]) if counts[ln] >= 2]
        assert out[row["doc_id"]] == (" ".join(keep), len(keep), len(drop))


# ------------------------------------------------------------------ PQ ANN


def test_pq_topk_recall_vs_exact(spark, sf_dir):
    from crawl4ai_spark.operators.similarity import cosine_topk, cosine_topk_pq

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in df.filter("vec_id = 0").first()["embedding"]]
    exact = [r["vec_id"] for r in
             cosine_topk(df, "embedding", qvec, k=5, id_cols=["vec_id"]).collect()]
    approx = [r["vec_id"] for r in
              cosine_topk_pq(df, "embedding", qvec, k=20,
                             m_subspaces=4, n_codes=16, rerank=4).collect()]
    # the query row itself (cos=1) must always survive ADC + rerank
    assert 0 in approx
    # sane recall at these params: most of the exact top-5 retrieved
    assert len(set(exact) & set(approx)) >= 3


def test_pq_deterministic_and_reranked(spark, sf_dir):
    from crawl4ai_spark.operators.similarity import cosine_topk_pq

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in df.filter("vec_id = 0").first()["embedding"]]
    a = cosine_topk_pq(df, "embedding", qvec, k=10).collect()
    b = cosine_topk_pq(df, "embedding", qvec, k=10).collect()
    assert a == b
    sims = [r["cosine_sim"] for r in a]
    assert sims == sorted(sims, reverse=True)


def test_pq_codebook_shape_and_dim_guard(spark, sf_dir):
    import pytest as _pytest

    from crawl4ai_spark.operators.similarity import pq_codebooks_from_sample

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq_codebooks_from_sample(df, "embedding", "vec_id", 4, 16)
    assert len(books) == 4 and all(len(b) == 16 for b in books)
    assert all(len(cw) == 16 for b in books for _, cw in b)
    with _pytest.raises(ValueError, match="not divisible"):
        pq_codebooks_from_sample(df, "embedding", "vec_id", 5, 16)


# ---------------------------------------------------------------------------
# substring_dedup (Lee et al. 2022 ExactSubstr)
# ---------------------------------------------------------------------------


def test_substring_dedup_removes_shared_passage(spark):
    from crawl4ai_spark.operators.dedup import substring_dedup

    shared = "alpha beta gamma delta epsilon"  # 5 tokens, k=5 -> one shingle
    rows = [
        (1, f"one two {shared} three"),
        (2, f"nine {shared} eight seven"),
        (3, "totally unique words here only once"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in substring_dedup(df, k=5, min_dup=2).collect()
    }
    assert out[1]["text"] == "one two three"
    assert out[2]["text"] == "nine eight seven"
    assert out[1]["removed_tokens"] == 5 and out[2]["removed_tokens"] == 5
    # the unique doc is untouched and still present
    assert out[3]["text"] == rows[2][1] and out[3]["removed_tokens"] == 0


def test_substring_dedup_within_doc_repeat_and_overlap(spark):
    from crawl4ai_spark.operators.dedup import substring_dedup

    # "a b c a b c a b" repeats "a b c" -> with k=3 the duplicated run
    # covers the WHOLE document (overlapping duplicated starts merge)
    df = spark.createDataFrame(
        [(1, "a b c a b c a b")], "doc_id long, text string"
    )
    r = substring_dedup(df, k=3, min_dup=2).head()
    assert r["text"] == "" and r["kept_tokens"] == 0
    assert r["n_tokens"] == 8 and r["removed_tokens"] == 8


def test_substring_dedup_short_docs_pass_through(spark):
    from crawl4ai_spark.operators.dedup import substring_dedup

    # docs shorter than k yield no shingles and survive verbatim --
    # even when they are exact duplicates of each other
    df = spark.createDataFrame(
        [(1, "tiny dup"), (2, "tiny dup")], "doc_id long, text string"
    )
    rows = substring_dedup(df, k=5, min_dup=2).collect()
    assert sorted(r["text"] for r in rows) == ["tiny dup", "tiny dup"]
    assert all(r["removed_tokens"] == 0 for r in rows)


def test_substring_dedup_hash_kinds_agree(spark, sf_dir):
    from crawl4ai_spark.operators.dedup import substring_dedup

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    a = substring_dedup(docs, k=5, hash_kind="xxhash64").orderBy("doc_id")
    b = substring_dedup(docs, k=5, hash_kind="raw").orderBy("doc_id")
    assert [r.asDict() for r in a.collect()] == [
        r.asDict() for r in b.collect()
    ]


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup, Abbas et al. 2023)
# ---------------------------------------------------------------------------


def _sem_rows(spark, vecs, **kw):
    from crawl4ai_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, v array<double>",
    )
    out = semantic_dedup(df, "v", "vec_id", **kw)
    return {r["vec_id"]: r for r in out.collect()}


def test_semantic_dedup_removes_rephrasings_keeps_atypical(spark):
    # ids 0/1 are the sampled centroids (two orthogonal directions);
    # 2,3,4 all point near centroid 0 (mutual cos ~1 -> duplicates);
    # 5 points near centroid 1 and is unique.
    vecs = [
        [1, 0, 0], [0, 1, 0],
        [1, 0.01, 0], [1, 0.02, 0], [1, 0.03, 0],
        [0.01, 1, 0],
    ]
    out = _sem_rows(spark, vecs, eps=0.95, n_centroids=2)
    assert len(out) == 6 and all(
        r["cluster"] in (0, 1) for r in out.values()
    )
    dup_group = [out[i] for i in (2, 3, 4)]
    # exactly one of the near-identical trio survives: the one ranked
    # first = LOWEST centroid similarity (most atypical) = id 4
    assert [r["vec_id"] for r in dup_group if r["is_kept"]] == [4]
    assert out[5]["is_kept"] and out[5]["cluster"] == 1
    # centroids themselves: 0 is cos~1 with the kept trio member? no --
    # id 0 IS the most typical (cent_sim 1.0) so it gets removed as a
    # duplicate of a lower-cent-sim neighbor
    assert not out[0]["is_kept"]


def test_semantic_dedup_eps_above_one_keeps_everything(spark):
    vecs = [[1, 0], [0, 1], [1, 0.01], [0.9, 0.1]]
    out = _sem_rows(spark, vecs, eps=1.01, n_centroids=2)
    assert all(r["is_kept"] for r in out.values())


def test_semantic_dedup_triangular_max_not_greedy(spark):
    """A chain a-b, b-c similar but a-c NOT: triangular-max removes c
    (similar to the already-removed b); a greedy sweep would keep it."""
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0]

    # one cluster (centroid = id 0 at 0 rad). Rank order by ASC
    # centroid-sim: id3 (cos 0.62 rad ~ .814), id2 (~.952), id0, id1.
    # Pairwise: cos(3,2)=.952 >= eps, cos(2,1)=.952 >= eps, but
    # cos(3,1)=.814 < eps.
    vecs = [unit(0.0), unit(0.0), unit(0.31), unit(0.62)]
    out = _sem_rows(spark, vecs, eps=0.95, n_centroids=1)
    kept = sorted(i for i, r in out.items() if r["is_kept"])
    # id2 removed via id3; id0/id1 removed via id2 even though their
    # only sub-eps neighbor id3 is dissimilar -- the paper's
    # upper-triangle max, not an iterated keep-set sweep
    assert kept == [3]


def test_substring_dedup_null_text_degrades(spark):
    from crawl4ai_spark.operators.dedup import substring_dedup

    df = spark.createDataFrame(
        [(1, None), (2, "x y z w v x y z w v")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in substring_dedup(df, k=5).collect()}
    # null text = empty string: one empty token, nothing removed,
    # counts never negative
    assert out[1]["n_tokens"] == 1 and out[1]["removed_tokens"] == 0
    assert out[2]["removed_tokens"] == 10  # within-doc repeat removed


def test_semantic_dedup_zero_norm_vectors_survive(spark):
    from crawl4ai_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 0.0]),
         (3, [1.0, 0.01]), (4, [0.0, 0.0])],
        "vec_id long, v array<double>",
    )
    out = {
        r["vec_id"]: r.asDict()
        for r in semantic_dedup(df, "v", "vec_id", eps=0.95,
                                n_centroids=2).collect()
    }
    # under ANSI mode the zero-norm rows must degrade (try_divide),
    # not kill the job: deterministic first-cluster assignment,
    # cent_sim -1 (maximally atypical), never removed and never
    # removing others (their pairwise cosines are NULL)
    for zid in (2, 4):
        assert out[zid]["cluster"] == 0
        assert out[zid]["cent_sim"] == -1.0 and out[zid]["is_kept"]
    assert not out[0]["is_kept"] or not out[3]["is_kept"]


def test_resolve_duplicates_score_policy_keeps_best(spark):
    from crawl4ai_spark.operators.dedup import resolve_duplicates

    ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    scores = spark.createDataFrame(
        # component {0,1,2}: best is 1; component {4,5}: tie -> min id 4;
        # singleton 3 has NO score row and must still be canonical
        [(0, 0.2), (1, 0.9), (2, 0.5), (4, 0.7), (5, 0.7)],
        "doc_id long, score double",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in resolve_duplicates(ids, pairs, "doc_id",
                                    scores=scores).collect()
    }
    assert [i for i in range(6) if out[i]["is_canonical"]] == [1, 3, 4]
    assert out[1]["csize"] == 3 and out[3]["csize"] == 1
    # default policy unchanged: min id wins
    out0 = {
        r["doc_id"]: r["is_canonical"]
        for r in resolve_duplicates(ids, pairs, "doc_id").collect()
    }
    assert [i for i in range(6) if out0[i]] == [0, 3, 4]


def test_plan_lsh_bands_properties():
    from crawl4ai_spark.operators.dedup import plan_lsh_bands

    b, r = plan_lsh_bands(64, 0.5)
    assert b * r == 64
    # the S-curve midpoint ~ (1/b)^(1/r) must sit near the threshold
    mid = (1.0 / b) ** (1.0 / r)
    assert abs(mid - 0.5) < 0.2
    # higher threshold -> fewer, longer bands (curve shifts right)
    b_hi, r_hi = plan_lsh_bands(64, 0.9)
    assert r_hi > r and b_hi < b
    # weighting FPs pushes the curve right too (stricter candidates)
    b_fp, r_fp = plan_lsh_bands(64, 0.5, fp_weight=10.0)
    assert r_fp >= r
    import pytest

    with pytest.raises(ValueError):
        plan_lsh_bands(64, 1.0)


def test_rates_for_token_budget():
    from crawl4ai_spark.operators.sampling import rates_for_token_budget

    rates = rates_for_token_budget(
        {"en": 1_000_000, "de": 100, "fr": 0},
        {"en": 250_000, "de": 500, "fr": 10, "xx": 5},
    )
    assert rates["en"] == 250_000          # 25% of en
    assert rates["de"] == 1_000_000        # budget > stratum -> take all
    assert rates["fr"] == 0 and rates["xx"] == 0  # empty stratum
    assert "es" not in rates               # unbudgeted -> caller default


def test_zero_norm_vector_degrades_not_raises(spark):
    """A degenerate all-zero embedding (e.g. of empty text) must fall
    out of top-k / pair results as NULL-sim, not abort the job with
    DIVIDE_BY_ZERO under Spark 4's default ANSI mode."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 0.0]),  # zero norm
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    top = cosine_topk(df, "v", [1.0, 0.0], k=3).collect()
    ids = [r["id"] for r in top]
    # zero-norm row sorts last (NULL sim), real rows ranked normally
    assert ids[:2] == [0, 1]
    pairs = embedding_neardup_pairs(
        df, "v", "id", threshold=0.9, n_planes=2
    ).collect()
    assert all(2 not in (r["id_a"], r["id_b"]) for r in pairs)


def test_infer_dim_empty_frame_clear_error(spark):
    import pytest as _pytest

    empty = spark.createDataFrame([], "id long, v array<double>")
    with _pytest.raises(ValueError, match="dimension"):
        embedding_neardup_pairs(empty, "v", "id")
    # dim= skips inference so an empty frame yields an empty result
    assert embedding_neardup_pairs(empty, "v", "id", dim=2).count() == 0
