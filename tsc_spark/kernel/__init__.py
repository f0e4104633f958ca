from .api import analyse_tokens, generate_tokens
from .manager import ClusterManager, ClusterNode, seq_sum
from .matching import build_query_seed, filter_contained_matches, match_score, match_series
from .scoring import (
    combine_complexity_metric_scores,
    normalize_scores,
    select_candidate_by_complexity_score,
)

__all__ = [
    "ClusterManager",
    "ClusterNode",
    "seq_sum",
    "analyse_tokens",
    "generate_tokens",
    "build_query_seed",
    "match_series",
    "filter_contained_matches",
    "match_score",
    "normalize_scores",
    "combine_complexity_metric_scores",
    "select_candidate_by_complexity_score",
]
