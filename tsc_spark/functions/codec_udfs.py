"""Arrow-batched codec UDFs (array<int> ↔ binary, array<double> ↔ binary).

Per the engine's data-plane rule (BASELINE.json input_hint) these are
pandas UDFs — values cross the JVM↔Python boundary as Arrow batches and
the per-array work is vectorized numpy (tsc_spark.codecs); there is no
per-element Python."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, BinaryType, DoubleType, IntegerType

from ..codecs import decode_dod, decode_gorilla, encode_dod, encode_gorilla
from ..codecs.deltadelta import CODEC_VERSION

__all__ = [
    "encode_tokens_udf",
    "decode_tokens_udf",
    "encode_floats_udf",
    "decode_floats_udf",
    "encode_tokens_table",
    "decode_tokens_table",
]


@pandas_udf(BinaryType())
def encode_tokens_udf(tokens: pd.Series) -> pd.Series:
    return tokens.map(encode_dod)


@pandas_udf(ArrayType(IntegerType()))
def decode_tokens_udf(blob: pd.Series) -> pd.Series:
    return blob.map(lambda b: decode_dod(b).astype("int32"))


@pandas_udf(BinaryType())
def encode_floats_udf(values: pd.Series) -> pd.Series:
    return values.map(encode_gorilla)


@pandas_udf(ArrayType(DoubleType()))
def decode_floats_udf(blob: pd.Series) -> pd.Series:
    return blob.map(decode_gorilla)


def encode_tokens_table(tokens_df: DataFrame) -> DataFrame:
    """tokens → (doc_id, encoded binary, codec_version, n_tok, source).

    The compressed-at-rest form of the corpus (FIXTURES.md §2.4)."""
    return tokens_df.select(
        "doc_id",
        encode_tokens_udf("tokens").alias("encoded"),
        F.lit(CODEC_VERSION).alias("codec_version"),
        "n_tok",
        "source",
    )


def decode_tokens_table(encoded_df: DataFrame) -> DataFrame:
    """Inverse of encode_tokens_table: restore the tokens column.

    Validates ``codec_version`` (the column encode_tokens_table stamps
    exactly so decoding can be gated): an unknown version raises a clear
    error instead of silently mis-decoding with the wrong layout."""
    if "codec_version" in encoded_df.columns:
        version_ok = F.when(
            F.col("codec_version") == CODEC_VERSION, F.col("encoded")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("unsupported codec_version "),
                    F.col("codec_version").cast("string"),
                    F.lit(f" (decoder supports {CODEC_VERSION})"),
                )
            )
        )
    else:
        version_ok = F.col("encoded")
    return encoded_df.select(
        "doc_id",
        decode_tokens_udf(version_ok).alias("tokens"),
        "n_tok",
        "source",
    )
