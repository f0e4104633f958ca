"""Distributed complexity-guided generation.

The reference serves one generation request at a time over HTTP
(/root/reference/src/controllers/time_series_controller.jl:2251-2331);
each request is inherently serial step-to-step but requests are
independent, so the Spark shape is a requests DataFrame →
``mapInPandas(generate)``: 10k generation requests fan out across
executors with no shuffle and no driver-side loop.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ._util import ensure_min_partitions

__all__ = ["requests_df", "generate_tokens_distributed"]

REQUEST_SCHEMA = (
    "request string, first_elements array<int>, complexity_targets array<double>, "
    "merge_threshold_ratio double, range_min int, range_max int"
)
RESULT_SCHEMA = "request string, series array<int>"


def requests_df(spark: SparkSession, requests) -> DataFrame:
    """Build the requests table from (name, first, targets, mtr, lo, hi)
    tuples."""
    rows = [
        (
            str(name),
            [int(v) for v in first],
            [float(t) for t in targets],
            float(mtr),
            int(lo),
            int(hi),
        )
        for name, first, targets, mtr, lo, hi in requests
    ]
    return spark.createDataFrame(rows, REQUEST_SCHEMA)


def generate_tokens_distributed(spark_or_df, requests=None) -> DataFrame:
    """Run every generation request in parallel on executors.

    Accepts either (spark, request_tuples) or a prebuilt requests
    DataFrame.  One request per output row; per-request work runs in an
    Arrow-batched mapInPandas with zero shuffles.
    """
    if requests is not None:
        df = requests_df(spark_or_df, requests)
    else:
        df = spark_or_df

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel.api import generate_tokens

        for pdf in batches:
            names, series = [], []
            for name, first, targets, mtr, lo, hi in zip(
                pdf["request"],
                pdf["first_elements"],
                pdf["complexity_targets"],
                pdf["merge_threshold_ratio"],
                pdf["range_min"],
                pdf["range_max"],
            ):
                result, _mgr = generate_tokens(
                    [int(v) for v in first],
                    [float(t) for t in targets],
                    float(mtr),
                    int(lo),
                    int(hi),
                )
                names.append(name)
                series.append([int(v) for v in result])
            yield pd.DataFrame({"request": names, "series": series})

    return ensure_min_partitions(df).mapInPandas(run, RESULT_SCHEMA)
