"""Similarity search over the embeddings table (array<float> column).

Brute-force cosine top-k is the exact baseline (native F.zip_with /
F.aggregate arithmetic — stays in codegen, no Python).  The scale path
is LSH bucketing by random-hyperplane sign bits: candidates meet only
inside a bucket, turning the O(N·Q) scan into an equi-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cosine_scores",
    "cosine_topk",
    "hyperplane_buckets",
    "ann_topk_lsh",
    "ivf_fit_centroids",
    "ivf_fit_centroids_distributed",
    "ivf_assign",
    "ivf_topk",
    "adaptive_n_planes",
    "near_dup_embeddings",
]


def _batch_matrix(s) -> "np.ndarray":
    """Stack an Arrow batch of embeddings into an (n, dim) float matrix,
    failing with a CLEAR error on ragged lengths instead of numpy's
    opaque inhomogeneous-shape crash (NULL rows are filtered upstream)."""
    try:
        m = np.array([np.asarray(v, dtype=np.float64) for v in s])
    except ValueError as exc:  # numpy >= 1.24 raises on inhomogeneous rows
        lens = sorted({len(v) for v in s})
        raise ValueError(f"ragged embedding lengths in batch: {lens}") from exc
    if m.dtype == object:  # older numpy builds an object array instead
        lens = sorted({len(v) for v in s})
        raise ValueError(f"ragged embedding lengths in batch: {lens}")
    return m


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


def cosine_scores(
    emb: DataFrame, query_vec: list[float], out_col: str = "cosine"
) -> DataFrame:
    """Cosine similarity to a literal query vector, Arrow-batched numpy.

    Spark's array higher-order functions are interpreted per element
    (measured in BASELINE.md), so the exact scorer is a vectorized
    pandas_udf: one ``m @ q`` per Arrow batch — the per-row cost is a
    C-loop multiply-add, not 64 interpreted expression nodes."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = max(float(np.sqrt((q * q).sum())), 1e-12)

    @F.pandas_udf("double")
    def _score(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="float64")
        m = _batch_matrix(s)
        if m.shape[1] != q.shape[0]:
            raise ValueError(
                f"ragged embedding lengths: batch dim {m.shape[1]} != "
                f"query dim {q.shape[0]}"
            )
        dots = m @ q
        # zero-norm clamp: an all-zero embedding scores 0.0, not NaN
        # (Spark treats NaN as greatest, so NaN would top the DESC sort
        # and pass >= thresholds)
        norms = np.maximum(np.sqrt((m * m).sum(axis=1)), 1e-12)
        return pd.Series(dots / (norms * qn))

    return emb.filter(F.col("embedding").isNotNull()).withColumn(
        out_col, F.round(_score("embedding"), 6)
    )


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector."""
    return (
        cosine_scores(emb, query_vec)
        .select("vec_id", "cosine")
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def _batch_matmul_int_udf(mat: np.ndarray, post):
    """Arrow-batched X @ matᵀ → ``post(sims)`` int32 per row — the hot
    path for bucket/list assignment over a full corpus (Spark array
    HOFs are interpreted per element; one BLAS matmul per batch is the
    boundary the north rule allows)."""

    @F.pandas_udf("int")
    def _f(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="int32")
        x = _batch_matrix(s)
        return pd.Series(post(x @ mat.T).astype("int32"))

    return _f


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic seeded hyperplane matrix — the single source for
    corpus bucketing, query bucketing and the oracle replica (a seed
    drift between them would silently send probes to the wrong buckets)."""
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def hyperplane_buckets(
    emb: DataFrame, dim: int, n_planes: int = 8, seed: int = 7
) -> DataFrame:
    """Random-hyperplane (SimHash) bucket id per vector.

    Planes are a deterministic seeded matrix; the bucket is the
    concatenated sign bits of the plane dot products, computed as one
    vectorized matmul per Arrow batch.  NULL embeddings are ignored."""
    planes = _planes(dim, n_planes, seed)
    bits = 1 << np.arange(n_planes)
    bucket_udf = _batch_matmul_int_udf(planes, lambda sims: (sims > 0) @ bits)
    return emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id", "embedding", bucket_udf("embedding").alias("bucket")
    )


def lsh_probe_set(
    query_vec: list[float],
    dim: int,
    n_planes: int = 8,
    probe_radius: int = 2,
    seed: int = 7,
) -> list[int]:
    """Multi-probe bucket set for a query: its own bucket plus every
    bucket within Hamming distance ``probe_radius`` (radius 2 over 8
    planes = 37 of 256).  Exposed separately so the bench harness can
    measure the candidate scan fraction the probe set actually touches
    next to the recall it buys."""
    from itertools import combinations

    planes = _planes(dim, n_planes, seed=seed)
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
    return probes


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
    probes = lsh_probe_set(query_vec, dim, n_planes, probe_radius, seed=7)
    bucketed = hyperplane_buckets(emb, dim, n_planes, seed=7)
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k)


def ivf_fit_centroids(
    emb: DataFrame,
    dim: int,
    n_centroids: int = 16,
    n_iters: int = 5,
    max_train: int = 65536,
    seed: int = 11,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic mini k-means for IVF coarse quantization.

    Centroids are fit driver-side on a **bounded, deterministic**
    training sample — the ``max_train`` lowest ids via a TopK
    (TakeOrderedAndProject — never a full sort, never a full-corpus
    collect, so the driver footprint is O(max_train·dim) even at 100 TB).
    The standard IVF recipe: the training set is tiny relative to the
    corpus, the expensive part (assignment) stays distributed.  Lloyd
    iterations over unit-normalized vectors ≈ spherical k-means for
    cosine.  Fully reproducible from SQL (ORDER BY id LIMIT max_train),
    which is how the DuckDB oracle re-derives the same centroids."""
    df = (
        emb.filter(F.col("embedding").isNotNull())
        .select(id_col, "embedding")
        .orderBy(id_col)
        .limit(int(max_train))
    )
    x = np.array([list(r[1]) for r in df.collect()], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.maximum(norms, 1e-12)
    return _kmeans_numpy(x, n_centroids, n_iters, seed)


def det_sims(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """``x @ cents.T`` with a FIXED accumulation order (sequential over
    the feature axis, elementwise FMA per step — no BLAS reduction).

    BLAS gemm picks its reduction order per CPU microarchitecture and
    thread count, so the same fit re-run on a different host drifts
    centroid literals at the last ulp (observed: 118/1024 literals moved
    across two sandbox VMs) — which would desynchronize the committed
    oracle SQL from a driver-side refit.  The coarse-quantizer fit is
    tiny (≤64k×dim), so fixed-order costs nothing measurable; the hot
    distributed assignment path (ivf_assign) keeps BLAS, whose ulp noise
    only matters at exact argmax ties."""
    sims = np.zeros((x.shape[0], cents.shape[0]), dtype=np.float64)
    for d in range(x.shape[1]):
        sims += x[:, d : d + 1] * cents[None, :, d]
    return sims


def det_rowdot(m: np.ndarray, v: np.ndarray) -> np.ndarray:
    """``m @ v`` via numpy pairwise reduce (BLAS-free, order-stable)."""
    return np.add.reduce(m * v, axis=1)


def _kmeans_numpy(
    x: np.ndarray, n_centroids: int, n_iters: int, seed: int
) -> np.ndarray:
    """Shared spherical-k-means core (also used by the oracle replica).

    Every reduction is fixed-order (det_sims / np.add.reduce) so the
    fit is bit-reproducible across hosts — the committed ANN oracle
    literals must equal a driver-side refit exactly."""
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(x.shape[0], size=min(n_centroids, x.shape[0]), replace=False)]
    for _ in range(n_iters):
        assign = det_sims(x, cents).argmax(axis=1)
        for c in range(cents.shape[0]):
            members = x[assign == c]
            if members.shape[0]:
                m = members.mean(axis=0)
                cents[c] = m / max(float(np.sqrt(np.add.reduce(m * m))), 1e-12)
    return cents


def ivf_fit_centroids_distributed(
    emb: DataFrame,
    dim: int,
    n_centroids: int = 16,
    n_iters: int = 5,
    init_train: int = 4096,
    seed: int = 11,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Spherical k-means with DISTRIBUTED Lloyd iterations.

    The scale path when even the training sample shouldn't sit on the
    driver: initialization uses a small deterministic TopK sample
    (``init_train`` rows), then each Lloyd iteration runs over the FULL
    corpus as a DataFrame job — assignment is the native argmax over
    centroid-dot-product literals (linear-size plan, whole-stage
    codegen), per-cluster means are one groupBy with map-side partial
    aggregation over the exploded dimensions.  Driver memory is
    O(n_centroids·dim) regardless of corpus size."""
    # deterministic seeded init from the bounded sample (no Lloyd yet)
    df0 = (
        emb.filter(F.col("embedding").isNotNull())
        .select(id_col, "embedding")
        .orderBy(id_col)
        .limit(int(init_train))
    )
    x0 = np.array([list(r[1]) for r in df0.collect()], dtype=np.float64)
    x0 = x0 / np.maximum(np.linalg.norm(x0, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x0[rng.choice(x0.shape[0], size=min(n_centroids, x0.shape[0]), replace=False)]

    # hoist the norm to a column: dividing by _norm() inside the
    # transform lambda would re-evaluate the full fold per element
    # (O(dim^2) interpreted work per row, per Lloyd iteration)
    norm_emb = F.transform(
        "embedding", lambda v: v.cast("double") / F.col("nrm")
    )
    normed = (
        emb.filter(F.col("embedding").isNotNull())
        .withColumn("nrm", F.greatest(_norm(F.col("embedding")), F.lit(1e-12)))
        .select(norm_emb.alias("e"))
    )
    for _ in range(int(n_iters)):
        assigned = normed.withColumn(
            "c", _nearest_centroid_col(cents, col="e")
        )
        # per-cluster per-dimension mean: posexplode → groupBy(c, dim) —
        # partial (map-side) aggregation keeps the shuffle tiny:
        # n_centroids·dim rows total
        sums = (
            assigned.select("c", F.posexplode("e").alias("d", "v"))
            .groupBy("c", "d")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_cents = cents.copy()
        acc: dict[int, np.ndarray] = {}
        for r in sums:
            if r["d"] >= dim:
                raise ValueError(
                    f"embedding dimension {r['d']} exceeds dim={dim}"
                )
            # per-dimension mean s/n — robust to null-skipped sums
            # (with full vectors every dimension shares the same n, so
            # this equals the old sum/count; with nulls the old code
            # divided by an arbitrary dimension's count)
            if r["n"] > 0:
                acc.setdefault(r["c"], np.zeros(dim))[r["d"]] = r["s"] / r["n"]
        for c, m in acc.items():
            new_cents[c] = m / max(np.linalg.norm(m), 1e-12)
        cents = new_cents
    return cents


def _nearest_centroid_col(cents: np.ndarray, col: str = "embedding") -> F.Column:
    """argmax_c <embedding, centroid_c> as a native expression.

    Each dot product appears exactly once in an array literal; the
    argmax is array_position(sims, array_max(sims)) — a linear-size
    tree.  (A when-chain that threads best_sim/best_id through each
    step duplicates the whole subtree per centroid → exponential plan.)"""
    sims = F.array(
        *[
            _dot(F.col(col), F.array(*[F.lit(float(v)) for v in cents[c]]))
            for c in range(cents.shape[0])
        ]
    )
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def ivf_assign(emb: DataFrame, cents: np.ndarray, impl: str = "pandas") -> DataFrame:
    """Attach the IVF list id (nearest centroid) to every vector.

    Default path is the Arrow-batched matmul-argmax (full-corpus hot
    path); ``impl="native"`` keeps the JVM-only array-expression plan
    (useful where Python workers are unavailable).  ``np.argmax`` and
    ``array_position(max)`` share the first-occurrence tie rule, so the
    two paths assign identically.  At corpus scale the result is
    written partitioned by ``ivf_list`` so a probe scans only
    nprobe/n_centroids of the data (partition pruning), the IVF payoff."""
    emb = emb.filter(F.col("embedding").isNotNull())
    if impl == "native":
        return emb.withColumn("ivf_list", _nearest_centroid_col(cents))
    assign_udf = _batch_matmul_int_udf(
        np.asarray(cents, dtype=np.float64), lambda sims: sims.argmax(axis=1)
    )
    return emb.withColumn("ivf_list", assign_udf("embedding"))


def ivf_probe_lists(
    query_vec: list[float], cents: np.ndarray, nprobe: int = 4
) -> list[int]:
    """The ``nprobe`` inverted lists nearest the query (by cosine against
    the coarse centroids).  det_rowdot: probe choice must be bit-stable
    across hosts so the committed oracle's probe set always matches a
    driver-side refit.  Exposed separately so the bench harness can
    measure the scan fraction those lists hold next to measured recall."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(float(np.sqrt(np.add.reduce(q * q))), 1e-12)
    return [int(p) for p in np.argsort(-det_rowdot(cents, qn))[: max(nprobe, 1)]]


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    cents: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k via IVF: score only the nprobe nearest lists."""
    if cents is None:
        cents = ivf_fit_centroids(emb, dim, n_centroids)
    probe_lists = ivf_probe_lists(query_vec, cents, nprobe)
    assigned = ivf_assign(emb, cents)
    cand = assigned.filter(F.col("ivf_list").isin([int(p) for p in probe_lists]))
    return cosine_topk(cand.drop("ivf_list"), query_vec, k)


def adaptive_n_planes(
    n_rows: int, target_bucket_size: int = 64, lo: int = 4, hi: int = 24
) -> int:
    """Plane count so the *expected* bucket population N/2^p stays at or
    under ``target_bucket_size`` — within-bucket pair expansion is then
    bounded ~N·target/2 (linear in N) instead of ~N²/2^p with a fixed p.
    Clamped to [lo, hi]; hi=24 keeps bucket ids in int32."""
    import math

    if n_rows <= 0:
        return lo
    need = math.ceil(math.log2(max(n_rows / float(target_bucket_size), 2.0)))
    return min(hi, max(lo, need))


def near_dup_embeddings(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int | None = None,
    n_tables: int = 4,
    target_bucket_size: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded multi-table LSH + exact
    verify.

    ``n_planes`` defaults to ``adaptive_n_planes(count)`` — derived from
    the corpus size so expected bucket population stays constant as N
    grows (a fixed plane count makes within-bucket pairs ~N²/2^p, a
    stage-killer at 10⁹ vectors).  Deeper buckets lose single-table
    recall (each plane keeps a θ/π-angle pair with prob 1-θ/π), so
    ``n_tables`` independent plane sets (seeds seed..seed+L-1) are
    unioned — recall = 1-(1-(1-θ/π)^p)^L stays controlled while the
    candidate volume stays ~L·N·target/2.  Only (vec_id, bucket) flows
    through the self-joins; embeddings re-attach for the exact-cosine
    verify (native fold, bit-matching the SQL oracle's sequential SUM)."""
    if n_planes is None:
        # one count job (parquet scans serve this from footer stats)
        n_planes = adaptive_n_planes(emb.count(), target_bucket_size)
    # norms computed ONCE per vector (same fold expression, so the values
    # are bit-identical to computing them inside each pair) — the verify
    # join then pays one dot per candidate pair instead of dot + 2 norms
    ids = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id",
        "embedding",
        F.greatest(_norm(F.col("embedding")), F.lit(1e-12)).alias("nrm"),
    )
    cand = None
    for t in range(int(n_tables)):
        b = hyperplane_buckets(emb, dim, n_planes, seed=seed + t).select(
            "vec_id", "bucket"
        )
        p = (
            b.alias("a")
            .join(b.alias("b"), "bucket")
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
            )
        )
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    pairs = cand.join(
        ids.withColumnRenamed("vec_id", "vec_a")
        .withColumnRenamed("embedding", "emb_a")
        .withColumnRenamed("nrm", "nrm_a"),
        "vec_a",
    ).join(
        ids.withColumnRenamed("vec_id", "vec_b")
        .withColumnRenamed("embedding", "emb_b")
        .withColumnRenamed("nrm", "nrm_b"),
        "vec_b",
    )
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    return pairs.select(
        "vec_a",
        "vec_b",
        F.round(cos, 6).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)
