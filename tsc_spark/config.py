"""Engine-wide constants.

Mirrors the reference system defaults (/root/reference/src/config.jl:19-25,
/root/reference/src/polyphonic/polyphonic_cluster_manager.jl:29) so that the
clustering kernel and query surface use identical parameters.
"""

from __future__ import annotations

# --- clustering defaults (reference src/config.jl:19-25) ---
SUBSEQUENCE_MIN_WINDOW_SIZE: int = 2
DEFAULT_MERGE_THRESHOLD_RATIO: float = 0.3
DEFAULT_CONTEXTUAL_MIN_WIDTH: float = 1.0
DEFAULT_RANGE_MIN: int = 0
DEFAULT_RANGE_MAX: int = 24
DEFAULT_QUERY_MIN_MATCH_WINDOW: int = 3

# --- unit scale (reference src/config.jl:13-15) ---
UNIT_MIN: float = 0.0
UNIT_MID: float = 0.5
UNIT_MAX: float = 1.0

# --- recency memory (reference polyphonic_cluster_manager.jl:29) ---
RECENCY_MEMORY_SPAN: float = 64.0

# --- polyphonic defaults (reference src/config.jl:50,84) ---
MAX_SET_SIZE: int = 4  # last(CHORD_SIZE_RANGE)
DEFAULT_POLYPHONIC_MERGE_THRESHOLD_RATIO: float = 0.02

# --- tier layout for the rollup engine (north_rule: 1x / 8x / 64x) ---
TIER_STRIDES: dict[int, int] = {0: 1, 1: 8, 2: 64}

# --- Spark tuning defaults (engine-side, not from the reference) ---
DEFAULT_SHUFFLE_PARTITIONS: int = 32
ARROW_MAX_RECORDS_PER_BATCH: int = 256
# docs with n_tok above this are routed to the heavy-doc partition lane
HEAVY_DOC_TOKEN_THRESHOLD: int = 4096
