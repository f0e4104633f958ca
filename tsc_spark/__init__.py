"""tsc_spark — PySpark-native time-series subsequence clustering,
rollup, downsample & retention engine.

A from-scratch re-expression of the computational semantics of
ttekesuke/time_series_subsequence_clustering_web (reference at
/root/reference, read-only) over Iceberg/Parquet tables of
pre-tokenized training sequences (doc_id, tokens array<int>, n_tok,
source), designed for 10^12-sequence scale.
"""

__version__ = "0.1.0"
