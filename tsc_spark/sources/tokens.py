"""Canonical tokens-table reader: Iceberg catalog table or parquet path.

The engine's input contract (BASELINE.json ``input_hint``) is an Iceberg
table of pre-tokenized training sequences::

    tokens(doc_id: string, tokens: array<int>, n_tok: int, source: string)

On a real cluster that table lives in an Iceberg catalog and is read via
``spark.read.table("catalog.db.tokens")`` (or ``format("iceberg")``),
which gives partition pruning, hidden-partitioning pushdown, and
snapshot/time-travel reads for free through DataSourceV2.  The sandbox
has no Iceberg runtime jar, so the same entry point also accepts a plain
parquet path — the physical layout the test corpus uses — and both
branches land on one canonicalization step so every downstream operator
sees the exact contract schema regardless of storage.

Reference analogue: the InfluxDB corpus scan that reconstructs per-series
vectors before compute (/root/reference/src/controllers/
time_series_controller.jl:755-758); series_id tag tuple ->  doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["TOKENS_COLUMNS", "read_tokens", "canonicalize_tokens"]

TOKENS_COLUMNS = ("doc_id", "tokens", "n_tok", "source")

# Iceberg DSv2 read options (https://iceberg.apache.org/docs/latest/spark-queries/)
_ICEBERG_TIME_TRAVEL = {
    "snapshot_id": "snapshot-id",
    "as_of_timestamp": "as-of-timestamp",
    "branch": "branch",
}


def _infer_fmt(location: str) -> str:
    # a filesystem path (has a separator or a parquet suffix) is parquet;
    # anything else is a catalog table name like `cat.db.tokens`
    if "/" in location or location.endswith(".parquet"):
        return "parquet"
    return "table"


def canonicalize_tokens(df: DataFrame) -> DataFrame:
    """Project any storage schema onto the contract schema.

    Requires ``doc_id`` and ``tokens``; derives ``n_tok`` (=size(tokens))
    and ``source`` (='unknown') when the physical table lacks them, and
    pins the exact types (doc_id string, tokens array<int>, n_tok int)
    so operator code never branches on storage dialects.
    """
    cols = set(df.columns)
    missing = {"doc_id", "tokens"} - cols
    if missing:
        raise ValueError(
            f"tokens table is missing required column(s) {sorted(missing)}; "
            f"found {sorted(cols)} — expected at least (doc_id, tokens)"
        )
    tok_field = df.schema["tokens"].dataType
    if not isinstance(tok_field, T.ArrayType):
        raise ValueError(
            f"tokens column must be array<int>, found {tok_field.simpleString()}"
        )
    n_tok = (
        F.col("n_tok").cast("int")
        if "n_tok" in cols
        else F.size("tokens")
    )
    source = F.col("source") if "source" in cols else F.lit("unknown")
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("tokens").cast("array<int>").alias("tokens"),
        n_tok.alias("n_tok"),
        source.cast("string").alias("source"),
    )


def read_tokens(
    spark: SparkSession,
    location: str,
    *,
    fmt: str | None = None,
    snapshot_id: int | None = None,
    as_of_timestamp: int | None = None,
    branch: str | None = None,
) -> DataFrame:
    """Read the tokens table from ``location`` and canonicalize it.

    ``location`` is either a catalog table name (``cat.db.tokens`` — the
    Iceberg production path) or a parquet directory/file path (the
    sandbox/test path).  ``fmt`` forces ``"table"``, ``"iceberg"`` or
    ``"parquet"``; by default it is inferred (path separators => parquet).

    Time-travel (``snapshot_id`` / ``as_of_timestamp`` / ``branch``) maps
    to the Iceberg DSv2 read options and is rejected for parquet, which
    has no snapshot lineage — a silent ignore there would return current
    data for a historical query.
    """
    fmt = fmt or _infer_fmt(location)
    travel_args = {
        "snapshot_id": snapshot_id,
        "as_of_timestamp": as_of_timestamp,
        "branch": branch,
    }
    travel = {
        _ICEBERG_TIME_TRAVEL[arg]: val
        for arg, val in travel_args.items()
        if val is not None
    }
    if fmt == "parquet":
        if travel:
            raise ValueError(
                f"time-travel options {sorted(travel)} require an Iceberg "
                "table; parquet paths have no snapshot lineage"
            )
        return canonicalize_tokens(spark.read.parquet(location))

    reader = spark.read
    for opt, val in travel.items():
        reader = reader.option(opt, str(val))
    try:
        if fmt == "iceberg":
            df = reader.format("iceberg").load(location)
        elif fmt == "table":
            df = reader.table(location)
        else:
            raise ValueError(f"unknown tokens format {fmt!r}")
    except Exception as exc:  # surface an actionable message for missing runtime
        msg = str(exc)
        if "Failed to find" in msg or "iceberg" in msg.lower():
            raise RuntimeError(
                f"could not read tokens table {location!r} as {fmt}: {msg}\n"
                "If this is an Iceberg table, launch with the runtime jar, "
                "e.g. spark-submit --packages "
                "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<version> "
                "and a configured catalog (spark.sql.catalog.<name>)."
            ) from exc
        raise
    return canonicalize_tokens(df)
