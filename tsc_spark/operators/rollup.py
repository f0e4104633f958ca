"""Tiered continuous aggregates (1×/8×/64× downsample) with gap-fill.

The genuinely new aggregation mandated by the north rule on top of the
reference's clustering (the reference's analogue is the per-series point
stream grouped by synthetic time, /root/reference/scripts/seed_influx.jl:
575-598).  Everything here is native DataFrame API — Catalyst sees every
operator, so AQE handles partial aggregation, shuffle sizing and skew.

Design for 100 TB:
* every tier is a SHUFFLE-FREE per-row transform over the token arrays
  (``rollup_arrays`` posexplode fast path for tier-0, Arrow/numpy
  ``reduceat`` for tiers 1/2) — a doc's windows never cross rows, so no
  tier pays a shuffle at all;
* ``rollup_from_lower_tier`` is the continuous-aggregate compaction
  path (8 tier-1 windows → 1 tier-2 window, exact because count/min/
  max/sum are decomposable) for incremental refresh over an already-
  materialized lower tier — verified equal to the direct computation;
* gap-fill generates the expected window grid with ``sequence`` +
  explode and left-joins actuals: both sides are partitioned by doc_id,
  so AQE plans a co-partitioned join without a broadcast of big data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import TIER_STRIDES

__all__ = [
    "explode_points",
    "rollup_points",
    "rollup_arrays",
    "rollup_arrays_np",
    "rollup_from_lower_tier",
    "tiered_rollups",
    "gapfill",
    "gapfill_locf",
    "contextual_width",
    "normalize_window_scores",
    "combined_window_scores",
    "series_stats",
]


def explode_points(tokens_df: DataFrame) -> DataFrame:
    """tokens table → dense point stream (doc_id, point_index, token).

    Equivalent of the reference's per-point rows keyed by series tag +
    point_index field (scripts/seed_influx.jl:589-596)."""
    return tokens_df.select(
        "doc_id",
        F.posexplode("tokens").alias("point_index", "token"),
    )


def rollup_points(points: DataFrame, stride: int, tier: int) -> DataFrame:
    """Aggregate a (doc_id, point_index, token) stream into tier windows.

    Deterministic reducers only (count/min/max/sum) so rolled-up points
    are exactly reproducible at any parallelism."""
    return (
        points.groupBy(
            "doc_id",
            F.floor(F.col("point_index") / F.lit(stride)).cast("long").alias("window_idx"),
        )
        .agg(
            F.count("token").alias("agg_count"),
            F.min("token").alias("agg_min"),
            F.max("token").alias("agg_max"),
            F.sum("token").alias("agg_sum"),
        )
        .withColumn("tier", F.lit(tier))
    )


def rollup_arrays(tokens_df: DataFrame, stride: int, tier: int) -> DataFrame:
    """Shuffle-free tier rollup straight from the token arrays.

    A doc's points live in ONE row, so tier windows never cross rows and
    the whole rollup is a narrow per-row transform: slice the array into
    stride-sized chunks and reduce each chunk with JVM higher-order
    functions (``slice``/``aggregate``/``array_min``/``array_max``) —
    no explode, no shuffle, stays inside whole-stage codegen.  Emits
    rows identical to ``rollup_points(explode_points(df), stride, tier)``
    (the point-stream path kept for sparse/deleted streams).
    """
    src = tokens_df.filter(F.col("n_tok") > 0)
    if stride == 1:
        # windows ARE the points: plain posexplode, no slicing at all
        return src.select(
            "doc_id", F.posexplode("tokens").alias("window_idx", "token")
        ).select(
            "doc_id",
            F.col("window_idx").cast("long").alias("window_idx"),
            F.lit(1).cast("long").alias("agg_count"),
            F.col("token").alias("agg_min"),
            F.col("token").alias("agg_max"),
            F.col("token").cast("long").alias("agg_sum"),
            F.lit(tier).alias("tier"),
        )

    n_win = F.ceil(F.col("n_tok") / F.lit(stride)).cast("int")
    # two-level transform so each chunk's slice is evaluated ONCE and the
    # four reducers read the bound lambda variable, not four re-slices
    chunks = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda w: F.struct(
            w.cast("long").alias("wi"),
            F.slice(F.col("tokens"), w * stride + 1, stride).alias("c"),
        ),
    )
    wins = F.transform(
        chunks,
        lambda s: F.struct(
            s["wi"].alias("window_idx"),
            F.size(s["c"]).cast("long").alias("agg_count"),
            F.array_min(s["c"]).alias("agg_min"),
            F.array_max(s["c"]).alias("agg_max"),
            F.aggregate(
                s["c"], F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("agg_sum"),
        ),
    )
    return (
        src.select("doc_id", F.explode(wins).alias("w"))
        .select(
            "doc_id",
            "w.window_idx",
            "w.agg_count",
            "w.agg_min",
            "w.agg_max",
            "w.agg_sum",
        )
        .withColumn("tier", F.lit(tier))
    )


def rollup_arrays_np(tokens_df: DataFrame, stride: int, tier: int) -> DataFrame:
    """Arrow-vectorized tier rollup: one numpy ``reduceat`` pass per batch.

    Spark's higher-order functions (``transform``/``aggregate``) are
    interpreted per element — measured ~3M windows/sec across 32 cores.
    This path flattens each Arrow batch's token arrays into one int64
    vector and reduces every window with ``np.add/minimum/maximum
    .reduceat`` (vectorized C, no per-row Python — the boundary the
    north rule allows).  Output rows are identical to ``rollup_arrays``
    / ``rollup_points``: windows never span docs because each doc's
    window starts are emitted per doc, so the segment after a doc's last
    start ends exactly at the next doc's first start (= doc boundary).
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        "doc_id string, window_idx long, agg_count long, "
        "agg_min int, agg_max int, agg_sum long, tier int"
    )

    def run(batches):
        for pdf in batches:
            # NULL token arrays arrive as None through Arrow — skip them
            # exactly like rollup_arrays' n_tok > 0 filter does
            arrs = [
                np.asarray(t, dtype=np.int64)
                for t in pdf["tokens"]
                if t is not None and len(t) > 0
            ]
            ids = [
                d
                for d, t in zip(pdf["doc_id"], pdf["tokens"])
                if t is not None and len(t) > 0
            ]
            if not arrs:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="object"),
                        "window_idx": pd.Series([], dtype="int64"),
                        "agg_count": pd.Series([], dtype="int64"),
                        "agg_min": pd.Series([], dtype="int32"),
                        "agg_max": pd.Series([], dtype="int32"),
                        "agg_sum": pd.Series([], dtype="int64"),
                        "tier": pd.Series([], dtype="int32"),
                    }
                )
                continue
            lens = np.array([a.size for a in arrs], dtype=np.int64)
            flat = np.concatenate(arrs)
            n_win = -(-lens // stride)
            doc_off = np.concatenate(([0], np.cumsum(lens)[:-1]))
            starts = np.concatenate(
                [off + np.arange(0, l, stride, dtype=np.int64)
                 for off, l in zip(doc_off, lens)]
            )
            win_idx = np.concatenate(
                [np.arange(0, w, dtype=np.int64) for w in n_win]
            )
            # per-window count: stride everywhere except a short last window
            counts = np.full(starts.size, stride, dtype=np.int64)
            last_pos = np.cumsum(n_win) - 1
            counts[last_pos] = lens - (n_win - 1) * stride
            sums = np.add.reduceat(flat, starts)
            mins = np.minimum.reduceat(flat, starts)
            maxs = np.maximum.reduceat(flat, starts)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(np.asarray(ids, dtype=object), n_win),
                    "window_idx": win_idx,
                    "agg_count": counts,
                    "agg_min": mins.astype(np.int32),
                    "agg_max": maxs.astype(np.int32),
                    "agg_sum": sums,
                    "tier": np.full(starts.size, tier, dtype=np.int32),
                }
            )

    return tokens_df.select("doc_id", "tokens").mapInPandas(run, out_schema)


def rollup_from_lower_tier(lower: DataFrame, factor: int, tier: int) -> DataFrame:
    """Compose a higher tier from the tier below (8 windows → 1).

    count/min/max/sum are decomposable, so the rollup is exact and never
    re-reads raw points (continuous-aggregate compaction)."""
    return (
        lower.groupBy(
            "doc_id",
            F.floor(F.col("window_idx") / F.lit(factor)).cast("long").alias("window_idx"),
        )
        .agg(
            F.sum("agg_count").alias("agg_count"),
            F.min("agg_min").alias("agg_min"),
            F.max("agg_max").alias("agg_max"),
            F.sum("agg_sum").alias("agg_sum"),
        )
        .withColumn("tier", F.lit(tier))
    )


def _expected_grid(tokens_df: DataFrame, stride: int) -> DataFrame:
    """One row per expected window: ceil(n_tok / stride) windows per doc
    (docs with n_tok == 0 have no expected windows)."""
    n_win = F.ceil(F.col("n_tok") / F.lit(stride)).cast("long")
    return (
        tokens_df.select("doc_id", n_win.alias("n_win"))
        .filter(F.col("n_win") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_win") - 1)).alias(
                "window_idx"
            ),
        )
    )


def gapfill(
    rollup: DataFrame, tokens_df: DataFrame, stride: int, tier: int
) -> DataFrame:
    """Left-join the expected window grid with actual rollup windows.

    Missing windows are emitted with agg_count=0 and NULL min/max/sum,
    gapfilled=true (the LOCF carry-forward is the separate, composable
    ``gapfill_locf`` operator).  Dense token arrays have no gaps by
    construction; gaps appear for sparse point streams (deletes,
    retention-expired segments)."""
    grid = _expected_grid(tokens_df, stride)
    joined = grid.join(rollup, ["doc_id", "window_idx"], "left")
    return joined.select(
        "doc_id",
        F.lit(tier).alias("tier"),
        "window_idx",
        F.coalesce(F.col("agg_count"), F.lit(0)).alias("agg_count"),
        "agg_min",
        "agg_max",
        "agg_sum",
        F.col("agg_count").isNull().alias("gapfilled"),
    )


def gapfill_locf(filled: DataFrame) -> DataFrame:
    """Carry the previous non-gap window's aggregates forward into gaps
    (last-observation-carried-forward), per doc in window order."""
    w = (
        Window.partitionBy("doc_id", "tier")
        .orderBy("window_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "doc_id",
        "tier",
        "window_idx",
        "agg_count",
        F.last("agg_min", ignorenulls=True).over(w).alias("agg_min"),
        F.last("agg_max", ignorenulls=True).over(w).alias("agg_max"),
        F.last("agg_sum", ignorenulls=True).over(w).alias("agg_sum"),
        "gapfilled",
    )


def _gapfill_dense(rollup: DataFrame) -> DataFrame:
    """Gap-fill for the dense array path: token position IS the window
    index, so the expected grid equals the actual windows and the join
    degenerates to a literal column (zero-cost, same output schema as
    ``gapfill``)."""
    return rollup.select(
        "doc_id",
        "tier",
        "window_idx",
        "agg_count",
        "agg_min",
        "agg_max",
        "agg_sum",
        F.lit(False).alias("gapfilled"),
    )


def tiered_rollups(tokens_df: DataFrame, with_gapfill: bool = True) -> dict[int, DataFrame]:
    """Full tier-0/1/2 rollup set from a tokens table.

    tier-0 = stride 1 (raw points as windows), tier-1 = 8×, tier-2 = 64×.
    All tiers are shuffle-free: tier-0 is the native posexplode fast
    path (windows ARE the points); tiers 1/2 use the Arrow-vectorized
    ``reduceat`` path, which beats the interpreted higher-order-function
    plan ~1.4× and explode+groupBy ~2× (no shuffle, no per-row Python).
    Dense arrays cannot have gaps, so gap-fill is the zero-cost dense
    variant.  Sparse point streams (deletes, retention-expired ranges)
    use ``rollup_points`` + ``gapfill`` instead.  Returns {tier:
    DataFrame}."""
    out = {
        tier: (
            rollup_arrays(tokens_df, TIER_STRIDES[tier], tier)
            if TIER_STRIDES[tier] == 1
            else rollup_arrays_np(tokens_df, TIER_STRIDES[tier], tier)
        )
        for tier in (0, 1, 2)
    }
    if with_gapfill:
        out = {tier: _gapfill_dense(df) for tier, df in out.items()}
    return out


def contextual_width(tokens_df: DataFrame, min_width: float = 1.0) -> DataFrame:
    """Per-doc contextual value width over the full series.

    Reference update_value_width! (/root/reference/src/polyphonic/
    polyphonic_cluster_manager.jl:1063-1094): width = |mean(values >=
    mean) − mean(values <= mean)| clamped below by contextual_min_width;
    degenerate width becomes 1.0.  All-native and per-row; the mean is
    materialized as a column BEFORE the half filters so the filter
    lambdas bind a row attribute — inlining the aggregate expression
    into the lambda re-evaluates it per array element (O(n²))."""
    toks = F.transform(F.col("tokens"), lambda t: t.cast("double"))
    staged = tokens_df.select("doc_id", toks.alias("vals")).withColumn(
        "data_mean",
        F.when(
            F.size("vals") > 0,
            F.aggregate("vals", F.lit(0.0), lambda a, x: a + x) / F.size("vals"),
        ).otherwise(F.lit(0.0)),
    )

    def half_mean(cmp):
        half = F.filter(F.col("vals"), cmp)
        return F.when(
            F.size(half) > 0,
            F.aggregate(half, F.lit(0.0), lambda a, x: a + x) / F.size(half),
        ).otherwise(F.lit(0.0))

    staged = staged.withColumn(
        "lower_half_avg", half_mean(lambda x: x <= F.col("data_mean"))
    ).withColumn("upper_half_avg", half_mean(lambda x: x >= F.col("data_mean")))
    delta = F.greatest(
        F.abs(F.col("upper_half_avg") - F.col("lower_half_avg")),
        F.lit(float(min_width)),
    )
    width = F.when(delta <= 0.0, F.lit(1.0)).otherwise(delta)
    return staged.select(
        "doc_id",
        F.round("data_mean", 6).alias("data_mean"),
        F.round("lower_half_avg", 6).alias("lower_half_avg"),
        F.round("upper_half_avg", 6).alias("upper_half_avg"),
        F.round(width, 6).alias("value_width"),
    )


def normalize_window_scores(rollup_df: DataFrame) -> DataFrame:
    """Min-max normalize each doc's window sums with the reference's
    reliability weight (normalize_scores, /root/reference/src/controllers/
    time_series_controller.jl:2095-2117): weight 0.0 when all values are
    equal, 0.2 when only two distinct values, 1.0 otherwise.

    Expects dense windows (raw rollup or LOCF-filled): a NULL ``agg_sum``
    from un-filled gap rows would propagate to a NULL score."""
    w = Window.partitionBy("doc_id")
    vmin = F.min("agg_sum").over(w)
    vmax = F.max("agg_sum").over(w)
    nuniq = F.size(F.collect_set("agg_sum").over(w))
    # degenerate all-equal case fills 0.5, exactly like the reference
    # (fill(0.5, ...), controller :2105-2109) — the 0-weight reliability
    # is what nullifies it downstream, not the normalized value itself
    norm = F.when(vmax > vmin, (F.col("agg_sum") - vmin) / (vmax - vmin)).otherwise(
        F.lit(0.5)
    )
    reliability = (
        F.when(nuniq <= 1, F.lit(0.0)).when(nuniq == 2, F.lit(0.2)).otherwise(F.lit(1.0))
    )
    return rollup_df.select(
        "doc_id",
        "window_idx",
        F.round(norm, 6).alias("norm_score"),
        reliability.alias("reliability"),
    )


def combined_window_scores(rollup_df: DataFrame) -> DataFrame:
    """normalize_scores + combine_complexity_metric_scores, relationally.

    The generation scorer's full pipeline (reference controller
    :2095-2156) over rollup windows: four per-doc min-max-normalized
    metrics — sum (complex when larger), count (smaller), max (larger),
    min (smaller) — each weighted by the unique-count reliability
    (0 / 0.2 / 1), combined as the reliability-weighted mean with unit
    metric weights.  Mirrors kernel.scoring exactly; all-native window
    functions (one shuffle on doc_id)."""
    w = Window.partitionBy("doc_id")

    def metric(col, larger: bool):
        c = F.col(col).cast("double")
        vmin = F.min(c).over(w)
        vmax = F.max(c).over(w)
        nuniq = F.size(F.collect_set(c).over(w))
        norm = F.when(vmax > vmin, (c - vmin) / (vmax - vmin)).otherwise(F.lit(0.5))
        directed = norm if larger else (F.lit(1.0) - norm)
        rel = (
            F.when(nuniq <= 1, F.lit(0.0))
            .when(nuniq == 2, F.lit(0.2))
            .otherwise(F.lit(1.0))
        )
        return directed * rel, rel

    d_score, d_rel = metric("agg_sum", True)
    q_score, q_rel = metric("agg_count", False)
    c_score, c_rel = metric("agg_max", True)
    u_score, u_rel = metric("agg_min", False)
    denom = d_rel + q_rel + c_rel + u_rel
    combined = F.when(
        denom > 0.0, (d_score + q_score + c_score + u_score) / denom
    ).otherwise(F.lit(0.0))
    return rollup_df.select(
        "doc_id",
        F.col("window_idx").cast("long").alias("window_idx"),
        F.round(combined, 6).alias("combined_score"),
    )


def series_stats(tokens_df: DataFrame) -> DataFrame:
    """Per-series stats scan (reference _fetch_series_stats*,
    /root/reference/src/controllers/time_series_controller.jl:648-691):
    series list + point counts, computed without exploding (F.size)."""
    return tokens_df.select(
        "doc_id",
        "source",
        F.size("tokens").alias("point_count"),
    )
