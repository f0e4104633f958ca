"""Metadata sidecar scan (SURVEY S8).

The reference seeds corpus metadata from a CSV sidecar
(/root/reference/scripts/seed_influx.jl metadata.csv handling): one row
per doc with source/label attributes, deduplicated on doc_id.  The
Spark shape is a header-name-resolved, type-pinned csv read (never
inferSchema on a big sidecar — one pass, no sampling job) with a
DETERMINISTIC lexicographic-max dedup per doc_id.  Note: the reference
keeps the FIRST file-order occurrence; a distributed scan has no
portable row order, so the engine substitutes the deterministic
lexicographic rule — callers needing file-order precedence should add
an explicit priority column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = ["METADATA_SCHEMA", "read_metadata_csv", "attach_metadata", "read_with_fallback"]

METADATA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("source", StringType(), True),
        StructField("label", StringType(), True),
    ]
)


def read_metadata_csv(spark: SparkSession, path: str) -> DataFrame:
    """Deduplicated metadata table from a CSV sidecar.

    Columns are resolved BY HEADER NAME (an explicit schema alone binds
    positionally, silently mis-parsing a reordered sidecar — the
    reference resolves via a header dict too); missing required columns
    raise.  Duplicate doc_ids keep the lexicographically-last
    (source, label) row — deterministic at any parallelism (plain
    dropDuplicates keeps an arbitrary partition's row)."""
    all_str = spark.read.csv(path, header=True, inferSchema=False)
    wanted = [f.name for f in METADATA_SCHEMA.fields]
    missing = [c for c in wanted if c not in all_str.columns]
    if missing:
        raise ValueError(
            f"metadata sidecar {path} is missing required columns {missing}; "
            f"found {all_str.columns}"
        )
    raw = all_str.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in METADATA_SCHEMA.fields
        ]
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc_nulls_last("source"), F.desc_nulls_last("label")
    )
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def attach_metadata(docs: DataFrame, metadata: DataFrame) -> DataFrame:
    """Broadcast the (small) metadata dim onto the corpus."""
    meta = metadata.select(
        F.col("doc_id").alias("_m_doc_id"),
        F.col("source").alias("meta_source"),
        F.col("label").alias("meta_label"),
    )
    return docs.join(
        F.broadcast(meta), docs["doc_id"] == meta["_m_doc_id"], "left"
    ).drop("_m_doc_id")


def read_with_fallback(spark: SparkSession, paths: list[str], format: str = "parquet") -> DataFrame:
    """Scan with ordered source fallback (SURVEY S2).

    The reference's query path falls back from the cloud InfluxDB to the
    local instance when auth/reachability fails
    (/root/reference/src/controllers/time_series_controller.jl query_db
    connection fallback); the engine analogue is an ordered list of
    table locations (e.g. primary Iceberg catalog, then a replica
    path) — the first readable one wins, and the error of the LAST
    attempt propagates if none are."""
    import sys

    last_err: Exception | None = None
    for p in paths:
        try:
            df = spark.read.format(format).load(p)
            df.schema  # force resolution so a missing path fails HERE
            return df
        except Exception as e:
            # auth failures and unreachable endpoints surface as
            # Py4JJavaError/IOException wrappers, not AnalysisException —
            # the fallback exists precisely for those, so catch broadly
            # and report which source was skipped
            print(
                f"read_with_fallback: {p} unreadable "
                f"({type(e).__name__}); trying next source",
                file=sys.stderr,
            )
            last_err = e
    raise last_err if last_err is not None else ValueError("no paths given")
