"""Text-analysis operators for training-data pipelines over `documents`.

All hot-path expressions are native pyspark.sql.functions (JVM side,
whole-stage codegen); no Python UDFs.  Each operator has an exact ANSI
SQL twin in __spark_entry__.oracle_sql for the DuckDB correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._util import ensure_min_partitions

__all__ = [
    "tokenize_documents",
    "token_stats",
    "quality_scores",
    "lang_id",
    "fingerprint",
    "repetition_stats",
    "pii_stats",
]

# tiny deterministic English stopword set (shared with the SQL oracle)
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


def tokenize_documents(docs: DataFrame, vocab: int = 24) -> DataFrame:
    """Derive the north-rule tokens table from `documents` text.

    Deterministic, engine-portable word→token map (no external
    tokenizer): token = (7*len(word) + ascii(first_char)) mod vocab.
    Gives the clustering/rollup operators a real corpus-shaped input
    that a SQL oracle can reproduce exactly.
    """
    words = F.split(F.col("text"), " ")
    tokens = F.transform(
        words,
        lambda w: ((F.length(w) * 7 + F.ascii(F.substring(w, 1, 1))) % vocab).cast(
            "int"
        ),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        tokens.alias("tokens"),
        F.size(words).cast("int").alias("n_tok"),
        "source",
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace words, BPE-ish subword estimate, chars."""
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.length("text").alias("n_chars"),
        # BPE-ish proxy: one token per ~4 chars, at least one per word
        F.greatest(
            F.size(words), F.ceil(F.length("text") / 4).cast("int")
        ).alias("n_tokens_est"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality metrics: length, punct ratio, stopword ratio,
    mean word length — the standard pre-training quality signals."""
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_chars = F.length("text")
    punct = n_chars - F.length(F.regexp_replace("text", "[^\\w \t\n\f\r]", ""))
    stop_hits = F.size(F.filter(words, lambda w: F.lower(w).isin(STOPWORDS)))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_words, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(
            (n_chars - n_words + 1) / F.greatest(n_words, F.lit(1)), 6
        ).alias("mean_word_len"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """N-gram-free language heuristic: stopword hit ratio ≥ 2% → 'en'.

    (Real model-based lang-id would be a broadcast dictionary / model in
    a pandas UDF; the decision plumbing is what matters here.)"""
    words = F.split(F.col("text"), " ")
    stop_hits = F.size(F.filter(words, lambda w: F.lower(w).isin(STOPWORDS)))
    ratio = stop_hits / F.greatest(F.size(words), F.lit(1))
    return docs.select(
        "doc_id",
        F.when(ratio >= 0.02, F.lit("en")).otherwise(F.lit("unknown")).alias("lang"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per doc: duplicate-line fraction
    and top-bigram fraction (the classic pre-training repetition
    filters).

    Entirely in-array, ZERO shuffles: lines via split/array_distinct;
    the top-bigram count via sort-the-bigram-array + a single
    aggregate() fold tracking the longest equal run (max run length in
    the sorted array == the histogram's max count).  The earlier
    relational version (explode → two groupBys → join) shipped every
    bigram of the corpus through two exchanges; this one touches each
    doc exactly once, cost O(b log b) in the doc's own bigram count —
    the strictly better shape at corpus scale, and a pathological doc
    still only pays for itself.  Measured 4.3× faster at sf0.1,
    value-identical."""
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)
    dup_line_frac = F.round(
        (n_lines - F.size(F.array_distinct(lines))) / F.greatest(n_lines, F.lit(1)), 6
    )

    words = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sorted_bg = F.array_sort(bigrams)
    run_state = F.aggregate(
        sorted_bg,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc["prev"].isNull() | (acc["prev"] != x), F.lit(1))
            .otherwise(acc["run"] + 1)
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(acc["prev"].isNull() | (acc["prev"] != x), F.lit(1)).otherwise(
                    acc["run"] + 1
                ),
            ).alias("best"),
        ),
    )
    n_bg = F.size(sorted_bg)
    top_bigram_frac = F.when(
        n_bg > 0, F.round(run_state["best"] / n_bg, 6)
    ).otherwise(F.lit(0.0))
    return ensure_min_partitions(docs).select(
        "doc_id",
        n_lines.cast("long").alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
    )


URL_RE = "https?://[^ \t\n\f\r]+"  # RE2-\s-equivalent class
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def pii_stats(docs: DataFrame) -> DataFrame:
    """PII-ish surface counts per doc (URL / email regex hits) — the
    redaction-pipeline precursor, all-native ``regexp_count``."""
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(URL_RE)).cast("long").alias("url_count"),
        F.regexp_count("text", F.lit(EMAIL_RE)).cast("long").alias("email_count"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalised lowercase text
    (reference stable_id idea, /root/reference/scripts/seed_influx.jl:534-536,
    with md5 instead of sha1 for engine portability)."""
    # explicit class == RE2 \s (DuckDB); Java \s would also eat \x0B
    norm = F.lower(F.regexp_replace(F.col("text"), "[ \t\n\f\r]+", " "))
    return docs.select(
        "doc_id",
        F.substring(F.md5(norm), 1, 16).alias("fingerprint"),
    )
