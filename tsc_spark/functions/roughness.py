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
    AMP_EPS,
    SETHARES_A,
    SETHARES_B,
    SETHARES_D_MAX,
    SETHARES_S1,
    SETHARES_S2,
)

__all__ = [
    "token_to_freq_col",
    "pair_roughness_col",
    "adjacent_roughness",
    "chord_roughness",
]

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


def chord_roughness(
    chords_df: DataFrame,
    n_partials: int = 8,
    amp_base: float = 0.88,
) -> DataFrame:
    """Full harmonic-stack chord roughness, relationally (no UDF).

    Input: (doc_id, notes array<int> MIDI, vol double).  Each note
    contributes ``n_partials`` partials at f0·p with amp (vol/|notes|)·
    base^p (reference dissonance_stm_manager.jl:114-139); total
    roughness is Σ over partial pairs of the Sethares kernel
    (dissonance.jl:19-64).  The pair expansion is a within-doc
    equi-join on doc_id — bounded at ``(4·n_partials choose 2)`` rows
    per doc (chord size ≤ 4), i.e. a fixed constant per row at any
    corpus scale.  Equal-frequency pairs contribute exactly 0 (x = 0)
    so the strict ``f_a < f_b`` join keeps one row per unordered pair
    without changing the sum.  Chords with fewer than two audible notes
    score exactly 0 (reference dissonance_current's n < 2 gate)."""
    base = (
        chords_df.filter(F.size("notes") >= 2)
        .select(
            "doc_id",
            F.size("notes").alias("n_notes"),
            (F.col("vol") / F.size("notes")).alias("amp"),
            F.explode("notes").alias("midi"),
        )
        .filter(F.col("amp") > F.lit(AMP_EPS))  # note-level audibility gate
    )
    f0 = F.lit(440.0) * F.pow(
        F.lit(2.0), (F.col("midi").cast("double") - F.lit(69.0)) / F.lit(12.0)
    )
    parts = base.select(
        "doc_id",
        "n_notes",
        F.explode(F.sequence(F.lit(1), F.lit(int(n_partials)))).alias("p"),
        f0.alias("f0"),
        "amp",
    ).select(
        "doc_id",
        "n_notes",
        (F.col("f0") * F.col("p")).alias("f"),
        (F.col("amp") * F.pow(F.lit(float(amp_base)), F.col("p"))).alias("a"),
    ).filter(F.col("a") >= F.lit(AMP_EPS))  # partial-level gate (dissonance())
    a = parts.alias("a")
    b = parts.alias("b")
    x = (
        F.lit(SETHARES_D_MAX)
        / (F.lit(SETHARES_S1) * F.col("a.f") + F.lit(SETHARES_S2))
    ) * (F.col("b.f") - F.col("a.f"))
    contrib = (F.col("a.a") * F.col("b.a")) * (
        F.exp(-F.lit(SETHARES_A) * x) - F.exp(-F.lit(SETHARES_B) * x)
    )
    pair_sums = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.f") < F.col("b.f")))
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.sum(contrib).alias("raw"))
    )
    grid = chords_df.select("doc_id", F.size("notes").cast("long").alias("n_notes"))
    return grid.join(pair_sums, "doc_id", "left").select(
        "doc_id",
        F.round(F.coalesce(F.col("raw"), F.lit(0.0)), 6).alias("roughness"),
        "n_notes",
    )


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
