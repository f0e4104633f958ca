"""Sethares roughness as native Spark SQL expressions (no UDF).

The pair kernel (reference dissonance_models.jl:22-29, constants
config.jl:93-98) is closed-form, so a melodic-roughness scan over token
sequences stays entirely inside whole-stage codegen: map tokens to
frequencies, score adjacent pairs, sum per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel.dissonance import (
    SETHARES_A,
    SETHARES_B,
    SETHARES_D_MAX,
    SETHARES_S1,
    SETHARES_S2,
)

__all__ = ["token_to_freq_col", "pair_roughness_col", "adjacent_roughness"]

# tokens live in [0, 24); anchor token 0 at MIDI 48 (C3) so the corpus
# spans two octaves around middle C
TOKEN_MIDI_OFFSET = 48


def token_to_freq_col(tok) -> F.Column:
    """440·2^((token+offset−69)/12) as a native column expression."""
    return F.lit(440.0) * F.pow(
        F.lit(2.0), (tok + F.lit(TOKEN_MIDI_OFFSET - 69)) / F.lit(12.0)
    )


def pair_roughness_col(f1, f2) -> F.Column:
    """sethares1993_pair with unit amplitudes, f ordering handled here."""
    lo = F.least(f1, f2)
    hi = F.greatest(f1, f2)
    x = (F.lit(SETHARES_D_MAX) / (F.lit(SETHARES_S1) * lo + F.lit(SETHARES_S2))) * (hi - lo)
    return F.exp(-F.lit(SETHARES_A) * x) - F.exp(-F.lit(SETHARES_B) * x)


def adjacent_roughness(tokens_df: DataFrame) -> DataFrame:
    """Per-doc melodic roughness: Σ sethares(f_i, f_{i+1}) over adjacent
    token pairs — a JVM-only narrow aggregation (one scan, no shuffle,
    no Python)."""
    freqs = F.transform(F.col("tokens"), lambda t: token_to_freq_col(t.cast("double")))
    pairs = F.when(
        F.size(F.col("tokens")) >= 2,
        F.zip_with(
            F.slice(freqs, 1, F.greatest(F.size(freqs) - 1, F.lit(0))),
            F.slice(freqs, 2, F.greatest(F.size(freqs) - 1, F.lit(0))),
            pair_roughness_col,
        ),
    ).otherwise(F.array().cast("array<double>"))
    total = F.aggregate(pairs, F.lit(0.0), lambda acc, d: acc + d)
    return tokens_df.select(
        "doc_id",
        F.round(total, 6).alias("roughness"),
        F.size("tokens").cast("long").alias("n_pairs_plus_one"),
    )
