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
from pyspark.sql import Column, DataFrame
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
    sim = dot(v, q) / (l2_norm(v) * F.lit(qn))
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


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= threshold).

    LSH-bucket self-join (one shuffle on the bucket key) + exact cosine
    verify. High thresholds collide into the same bucket with high
    probability; recall can be raised by unioning several plane seeds.
    """
    planes = hyperplanes(_infer_dim(df, vec_col), n_planes, seed)
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
        cosine(F.col("x._v").cast("array<double>"), F.col("y._v").cast("array<double>")).alias(
            "cosine_sim"
        ),
    )
    return cand.filter(F.col("cosine_sim") >= threshold)


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("n")).first()
    return int(row["n"])
