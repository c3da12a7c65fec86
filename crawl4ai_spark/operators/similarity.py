"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (TakeOrderedAndProject —
no full sort, scale-safe) and a random-hyperplane LSH bucketed variant
as the 100 TB path (bucket equality prefilter -> exact rerank).

Maps to the reference's CosineStrategy surface
(/root/reference/crawl4ai/extraction_strategy.py:121-473) re-expressed
corpus-wide: the reference scores chunks of ONE page against a query
embedding; here the corpus is a table and the scoring is a plan.
All dot products are native F.zip_with/F.aggregate expressions.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _vec_lit(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_safe(a: Column, b: Column) -> Column:
    """cosine() that yields NULL instead of raising under ANSI mode
    when either vector has zero norm (try_divide). Identical to
    cosine() on every nonzero-norm pair — use where degenerate
    vectors must degrade, not kill the job."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    query_vec,
    k: int = 10,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.

    orderBy(desc).limit(k) compiles to TakeOrderedAndProject: per-
    partition heaps + a k-row driver merge — no global sort shuffle.
    """
    q = _vec_lit(query_vec)
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    v = F.col(vec_col).cast("array<double>")
    # try_divide: a zero-norm (degenerate) vector gets NULL similarity
    # — sorted last by desc, so it degrades out of the top-k instead of
    # raising DIVIDE_BY_ZERO under ANSI mode and killing the job
    sim = F.try_divide(dot(v, q), l2_norm(v) * F.lit(qn))
    cols = id_cols or [c for c in df.columns if c != vec_col]
    return (
        df.select(*cols, sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def lsh_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id (long) from random hyperplanes — narrow."""
    bucket = F.lit(0).cast("long")
    v = vec_col.cast("array<double>")
    for i, plane in enumerate(planes):
        d = dot(v, _vec_lit(plane))
        bucket = bucket + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def cosine_topk_lsh(
    df: DataFrame,
    vec_col: str,
    query_vec,
    k: int = 10,
    *,
    n_planes: int = 8,
    multiprobe_hamming: int = 1,
    seed: int = 42,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """ANN top-k: hyperplane-LSH bucket prefilter + exact rerank.

    The query's bucket (and its Hamming<=m neighbor buckets, multiprobe)
    is computed on the driver; the scan prunes to candidate buckets
    before any dot products — at scale, with the bucket as a partition
    column, this becomes partition pruning.
    """
    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    qbits = 0
    for i, plane in enumerate(planes):
        if float(np.dot(plane, np.asarray(query_vec, dtype=float))) > 0:
            qbits |= 1 << i

    probes = {qbits}
    if multiprobe_hamming >= 1:
        for i in range(n_planes):
            probes.add(qbits ^ (1 << i))
    if multiprobe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qbits ^ (1 << i) ^ (1 << j))

    bucketed = df.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("_bucket").isin([int(p) for p in probes]))
    return cosine_topk(cand.drop("_bucket"), vec_col, query_vec, k, id_cols)


def cosine_topk_ivf(
    df: DataFrame,
    vec_col: str,
    query_vec,
    k: int = 10,
    *,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """ANN top-k via an IVF (inverted-file) coarse quantizer.

    The scale path complementing :func:`cosine_topk_lsh`: every vector
    is assigned to its nearest of ``n_centroids`` coarse centroids; a
    query probes only the ``nprobe`` nearest inverted lists and reranks
    those candidates exactly. At 100 TB the assignment is a one-off
    narrow pass whose result is a partition column — probing becomes
    partition pruning reading ~nprobe/n_centroids of the corpus.

    Determinism (and the SQL oracle) comes from two choices: centroids
    default to a coarse SAMPLE of the corpus — the rows with
    ``id_col < n_centroids`` — rather than Lloyd-iterated means (a
    k-means refinement would converge engine-dependently; the sampled
    quantizer is the classic IVF-flat baseline), and every similarity
    used for a decision is quantized to 6 decimals with ties broken by
    centroid id, so assignment and probe sets are bit-stable across
    engines.
    """
    if centroids is None:
        crows = (
            df.filter(F.col(id_col) < n_centroids)
            .select(id_col, vec_col)
            .collect()
        )
        centroids = sorted(
            (int(r[id_col]), [float(x) for x in r[vec_col]]) for r in crows
        )
    if not centroids:
        raise ValueError("no centroid rows found")

    v = F.col(vec_col).cast("array<double>")
    vn = l2_norm(v)
    # try_divide: zero-norm vectors assign to a NULL centroid and are
    # pruned with the unprobed partitions instead of raising under ANSI
    sims = F.array(
        *[
            F.round(
                F.try_divide(
                    dot(v, _vec_lit(c)),
                    vn * F.lit(math.sqrt(sum(float(x) * float(x) for x in c))),
                ),
                6,
            )
            for _, c in centroids
        ]
    )
    # first max = lowest centroid id on 6-decimal ties (both engines)
    assign_idx = F.array_position(sims, F.array_max(sims)).cast("int")
    cid_arr = F.array(*[F.lit(int(cid)) for cid, _ in centroids])
    assign_cid = F.element_at(cid_arr, assign_idx)

    qv = [float(x) for x in query_vec]
    qn = math.sqrt(sum(x * x for x in qv))
    qsims = []
    for cid, c in centroids:
        cn = math.sqrt(sum(float(x) * float(x) for x in c))
        s = sum(a * float(b) for a, b in zip(qv, c)) / (qn * cn)
        qsims.append((round(s, 6), cid))
    probe = [cid for s, cid in sorted(qsims, key=lambda t: (-t[0], t[1]))[:nprobe]]

    sim = F.round(F.try_divide(dot(v, _vec_lit(qv)), vn * F.lit(qn)), 6)
    return (
        df.withColumn("_ivf_list", assign_cid)
        .filter(F.col("_ivf_list").isin(probe))
        .select(id_col, sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= threshold).

    LSH-bucket self-join (one shuffle on the bucket key) + exact cosine
    verify. High thresholds collide into the same bucket with high
    probability; recall can be raised by unioning several plane seeds.
    ``dim`` skips the dimension-inference job (required when the frame
    may be empty).
    """
    planes = hyperplanes(
        dim if dim is not None else _infer_dim(df, vec_col), n_planes, seed
    )
    b = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    x, y = b.alias("x"), b.alias("y")
    cand = x.join(
        y,
        (F.col("x._bucket") == F.col("y._bucket")) & (F.col("x._id") < F.col("y._id")),
    ).select(
        F.col("x._id").alias("id_a"),
        F.col("y._id").alias("id_b"),
        # cosine_safe: a zero-norm member of a bucket yields NULL sim
        # (filtered below) instead of aborting the pair join under ANSI
        cosine_safe(
            F.col("x._v").cast("array<double>"),
            F.col("y._v").cast("array<double>"),
        ).alias("cosine_sim"),
    )
    return cand.filter(F.col("cosine_sim") >= threshold)


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("n")).first()
    if row is None or row["n"] is None or row["n"] < 0:
        raise ValueError(
            f"cannot infer embedding dimension from {vec_col!r}: the "
            "DataFrame is empty or its first vector is NULL — pass the "
            "dimension explicitly"
        )
    return int(row["n"])


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    eps: float = 0.95,
    n_centroids: int = 16,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by embedding clustering — the tier above MinHash/
    SimHash (surface duplicates) that removes REPHRASINGS: cluster the
    corpus embeddings, and within each cluster drop every item whose
    cosine to a kept item exceeds ``eps``, keeping the items LEAST
    similar to their cluster centroid (the paper's keep-low-centroid-
    similarity rule, which preferentially retains a cluster's atypical
    examples).

    Determinism follows the IVF conventions of this module: centroids
    default to the sampled rows ``id_col < n_centroids`` (engine-stable,
    vs Lloyd iterations that converge engine-dependently), and every
    decision similarity — assignment, centroid similarity, pairwise
    cosine — is quantized to 6 decimals with explicit id tie-breaks, so
    the keep set replays bit-exactly in the SQL oracle.

    Keep rule, precisely: rank a cluster's items by (centroid-cosine
    ASC, id ASC); item X is removed iff some HIGHER-ranked item Y in the
    same cluster has round(cos(X, Y), 6) >= eps — the paper
    implementation's one-pass triangular-max test (max over the upper
    triangle of the cluster's sorted similarity matrix), NOT an
    iterated greedy sweep: an item similar only to already-removed
    items is still removed.

    Scale design (100 TB):
    - assignment is row-local (N_c dots per row, flat expression — the
      IVF pattern) and is in effect a partition column;
    - the pairwise verify is a self-join ON THE CLUSTER KEY — one
      shuffle, candidate volume sum(|cluster|^2) bounded by cluster
      granularity (raise n_centroids so clusters stay small; the paper
      uses ~100k clusters for 5B items, i.e. ~50k-item clusters);
    - the removal decision is an EXISTS semi-join (no row explosion
      back out), and the flag joins back co-partitioned on ``id_col``.

    Output: ``(id_col, cluster, cent_sim, is_kept)`` for EVERY input
    row — downstream keeps ``is_kept`` rows.
    """
    if centroids is None:
        crows = (
            df.filter(F.col(id_col) < n_centroids)
            .select(id_col, vec_col)
            .collect()
        )
        centroids = sorted(
            (int(r[id_col]), [float(x) for x in r[vec_col]]) for r in crows
        )
    if not centroids:
        raise ValueError("no centroid rows found")

    v = F.col(vec_col).cast("array<double>")
    vn = l2_norm(v)
    # zero-norm vectors would make every cosine NULL (divide-by-zero)
    # and the assignment engine-dependent; coalesce to -1 (below any
    # real cosine) so they land deterministically in the first
    # centroid's cluster as maximally-atypical rows, never removed
    # (their pairwise cosines stay NULL, which fails the >= eps test)
    sims = F.array(
        *[
            F.coalesce(
                F.round(
                    F.try_divide(
                        dot(v, _vec_lit(c)),
                        vn
                        * F.lit(
                            math.sqrt(sum(float(x) * float(x) for x in c))
                        ),
                    ),
                    6,
                ),
                F.lit(-1.0),
            )
            for _, c in centroids
        ]
    )
    assign_idx = F.array_position(sims, F.array_max(sims)).cast("int")
    cid_arr = F.array(*[F.lit(int(cid)) for cid, _ in centroids])
    base = df.select(
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        F.element_at(cid_arr, assign_idx).alias("_cluster"),
        F.element_at(sims, assign_idx).alias("_cent_sim"),
    )
    w = Window.partitionBy("_cluster").orderBy(
        F.asc("_cent_sim"), F.asc("_id")
    )
    ranked = base.withColumn("_rank", F.row_number().over(w))
    x, y = ranked.alias("x"), ranked.alias("y")
    removed = (
        x.join(
            y,
            (F.col("x._cluster") == F.col("y._cluster"))
            & (F.col("y._rank") < F.col("x._rank")),
        )
        .filter(
            F.round(cosine_safe(F.col("x._v"), F.col("y._v")), 6)
            >= F.lit(float(eps))
        )
        .select(F.col("x._id").alias("_id"))
        .distinct()
        .withColumn("_rm", F.lit(True))
    )
    return (
        ranked.join(removed, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_cluster").alias("cluster"),
            F.col("_cent_sim").alias("cent_sim"),
            F.col("_rm").isNull().alias("is_kept"),
        )
    )


def pq_codebooks_from_sample(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m_subspaces: int,
    n_codes: int,
) -> list[list[tuple[int, list[float]]]]:
    """Deterministic PQ codebooks: the sub-vectors of the rows with
    ``id_col < n_codes`` are the codewords of every subspace (the same
    sampled-quantizer convention as :func:`cosine_topk_ivf` — a
    k-means refinement would converge engine-dependently and break the
    SQL replay; plug refined codebooks in via the ``codebooks``
    parameter when bit-stability across engines isn't required)."""
    rows = (
        df.filter(F.col(id_col) < n_codes).select(id_col, vec_col).collect()
    )
    if not rows:
        raise ValueError("no codebook rows found")
    dim = len(rows[0][vec_col])
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    d = dim // m_subspaces
    books: list[list[tuple[int, list[float]]]] = []
    for m in range(m_subspaces):
        books.append(
            sorted(
                (int(r[id_col]),
                 [float(x) for x in r[vec_col][m * d:(m + 1) * d]])
                for r in rows
            )
        )
    return books


def cosine_topk_pq(
    df: DataFrame,
    vec_col: str,
    query_vec,
    k: int = 10,
    *,
    m_subspaces: int = 4,
    n_codes: int = 16,
    rerank: int = 4,
    id_col: str = "vec_id",
    codebooks: list[list[tuple[int, list[float]]]] | None = None,
) -> DataFrame:
    """ANN top-k via product quantization (Jégou et al., TPAMI 2011)
    with asymmetric-distance candidate scoring and exact rerank.

    The memory tier of the ANN stack (next to the LSH prefilter and
    the IVF partition pruner): each vector compresses to
    ``m_subspaces`` code ids (here 4 bytes vs 256 for a float64[64] —
    at 100 TB the code table fits where the vectors don't), the query
    scans CODES against a broadcast lookup table (one element_at per
    subspace, whole-stage codegen), and only the top ``k * rerank``
    ADC candidates touch the real vectors again.

    Determinism / SQL replay: codewords are the deterministic sample
    (see :func:`pq_codebooks_from_sample`); encode picks the minimal
    6-decimal-quantized L2² per subspace (lowest code on ties, the
    ``a - 2b + c`` expression written identically in the oracle); the
    ADC score is a SUM OF INTEGER micro-unit terms — each per-subspace
    LUT entry is quantized to e6 BEFORE summing, so the total is
    order-independent across engines and partitionings.
    """
    if codebooks is None:
        codebooks = pq_codebooks_from_sample(
            df, vec_col, id_col, m_subspaces, n_codes
        )
    d = len(codebooks[0][0][1])
    v = F.col(vec_col).cast("array<double>")
    qv = [float(x) for x in query_vec]
    qn = math.sqrt(sum(x * x for x in qv))

    # encode: per subspace the 6-dec-quantized L2^2 argmin (ties -> code).
    # The codeword table is ONE array<array<double>> literal iterated by
    # a runtime transform() — unrolling 16 python-side dot expressions
    # would re-inline the sliced subvector ~33x per subspace and blow up
    # codegen (Catalyst re-inlines non-cheap expressions at every
    # reference; whole-stage compile time then dominates the query)
    codes = []
    for m, book in enumerate(codebooks):
        sv = F.slice(v, m * d + 1, d)
        cw_arr = F.array(
            *[F.array(*[F.lit(float(x)) for x in cw]) for _, cw in book]
        )
        d2 = F.transform(
            cw_arr,
            lambda cw: F.round(
                dot(sv, sv) - F.lit(2.0) * dot(sv, cw) + dot(cw, cw), 6
            ),
        )
        idx = F.array_position(d2, F.array_min(d2)).cast("int")
        cid_arr = F.array(*[F.lit(int(cid)) for cid, _ in book])
        codes.append(F.element_at(cid_arr, idx))

    # ADC lookup tables: query-subvector x codeword inner products,
    # python-computed (same sequential-sum IEEE order as the engines),
    # micro-unit-quantized BEFORE the sum
    lut_cols = []
    for m, book in enumerate(codebooks):
        qs = qv[m * d:(m + 1) * d]
        lut = {
            cid: int(round(sum(a * b for a, b in zip(qs, cw)) * 1e6 + 1e-9))
            for cid, cw in book
        }
        arr = F.array(*[F.lit(lut[cid]).cast("long") for cid, _ in book])
        pos_arr = F.array(*[F.lit(int(cid)) for cid, _ in book])
        lut_cols.append(
            F.element_at(arr, F.array_position(pos_arr, codes[m]).cast("int"))
        )
    approx_e6 = lut_cols[0]
    for c in lut_cols[1:]:
        approx_e6 = approx_e6 + c

    sim = F.round(F.try_divide(dot(v, _vec_lit(qv)), l2_norm(v) * F.lit(qn)), 6)
    cand = (
        df.withColumn("_adc_e6", approx_e6)
        .orderBy(F.desc("_adc_e6"), F.asc(id_col))
        .limit(int(k) * int(rerank))
    )
    return (
        cand.select(id_col, sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )
