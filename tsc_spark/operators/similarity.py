"""Similarity search over the embeddings table (array<float> column).

Brute-force cosine top-k is the exact baseline (native F.zip_with /
F.aggregate arithmetic — stays in codegen, no Python).  The scale path
is LSH bucketing by random-hyperplane sign bits: candidates meet only
inside a bucket, turning the O(N·Q) scan into an equi-join.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cosine_topk", "hyperplane_buckets", "ann_topk_lsh", "near_dup_embeddings"]


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    score = _dot(F.col("embedding"), q) / (_norm(F.col("embedding")) * F.lit(qn))
    return (
        emb.select("vec_id", F.round(score, 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def hyperplane_buckets(
    emb: DataFrame, dim: int, n_planes: int = 8, seed: int = 7
) -> DataFrame:
    """Random-hyperplane (SimHash) bucket id per vector.

    Planes are a deterministic seeded matrix inlined as literals; the
    bucket is the concatenated sign bits of plane dot products."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = None
    for j in range(n_planes):
        pj = F.array(*[F.lit(float(v)) for v in planes[j]])
        bit = F.when(_dot(F.col("embedding"), pj) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    return emb.select("vec_id", "embedding", bucket.alias("bucket"))


def ann_topk_lsh(
    emb: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    probe_radius: int = 2,
) -> DataFrame:
    """Approximate top-k with multi-probe LSH.

    Probes every bucket within Hamming distance ``probe_radius`` of the
    query's bucket (radius 2 over 8 planes = 37 of 256 buckets), trading
    a bounded widening of the scan for recall — single-bucket probing
    misses near neighbors that fall on the far side of one hyperplane.
    At 10^12-vector scale the bucketed table is written partitioned by
    bucket → the probe set is an IN-list partition-pruned scan."""
    from itertools import combinations

    rng = np.random.default_rng(7)
    planes = rng.standard_normal((n_planes, dim))
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = 0
    for j in range(n_planes):
        if float(planes[j] @ qv) > 0:
            qbucket |= 1 << j
    probes = [qbucket]
    for r in range(1, probe_radius + 1):
        for flips in combinations(range(n_planes), r):
            b = qbucket
            for j in flips:
                b ^= 1 << j
            probes.append(b)
    bucketed = hyperplane_buckets(emb, dim, n_planes)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k)


def near_dup_embeddings(
    emb: DataFrame, dim: int, threshold: float = 0.95, n_planes: int = 8
) -> DataFrame:
    """Embedding-cosine near-dup pairs via bucketed self-join + exact verify."""
    b = hyperplane_buckets(emb, dim, n_planes)
    pairs = (
        b.alias("a")
        .join(b.alias("b"), "bucket")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
    )
    cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        _norm(F.col("a.embedding")) * _norm(F.col("b.embedding"))
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
