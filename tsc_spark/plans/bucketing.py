"""Bucketed co-located joins for repeated doc_id joins at corpus scale.

At 10^12 sequences every tokens↔rollup / tokens↔cluster join shuffles
both sides on doc_id unless the partitioning is persisted WITH the data.
Spark's bucketed tables do exactly that: ``bucketBy(N, "doc_id")`` at
write time records the hash-partitioning in the catalog, and any later
equi-join (or aggregation) on doc_id between tables with compatible
bucket counts runs with ZERO Exchange on the bucketed side(s) — the
scan itself reports the required hash distribution.

On a 1000-executor cluster this converts the hot join of the pipeline
(tokens joined back to per-tier rollups / cluster assignments, re-run
per retention sweep and per query) from two full-corpus shuffles into a
co-located sort-merge join whose only cost is the local sort — and with
``sortBy("doc_id")`` even that vanishes.

The reference has no analogue (single-process Julia holds everything in
RAM, /root/reference/src/analysis/subsequence_clusterer.jl keeps the
whole forest in one Dict); this is the Spark-native answer to the same
"never re-pay data movement for a stable key" concern its in-memory
design sidesteps.

Used with the in-memory session catalog (no Hive metastore needed):
bucketing metadata lives for the session, data files persist at
``path``.  A cluster deployment would use the same API against a real
metastore/Iceberg catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join", "plan_exchanges"]


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 32,
    bucket_col: str = "doc_id",
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) table.

    ``n_buckets`` should be sized like shuffle partitions at the target
    scale (cores × small multiple); both sides of a co-located join must
    use the SAME bucket count — record it once per layout, not per job.
    """
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str = "doc_id",
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket column.

    With matching bucket counts Catalyst plans this WITHOUT any
    Exchange: each task reads bucket i of both tables and joins
    locally.  ``plan_exchanges`` asserts that property in tests.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def plan_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the executed plan.

    BroadcastExchange is excluded: replicating a small side is not the
    data movement bucketing exists to remove (and at the scale where
    bucketing matters, neither side broadcasts)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "reuse" not in line.lower()
    )
