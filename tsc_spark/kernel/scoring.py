"""Candidate scoring for complexity-guided generation.

Re-implements the reference controller's pure scoring functions:
normalize_scores (/root/reference/src/controllers/time_series_controller.jl:2095-2117),
combine_complexity_metric_scores (...:2119-2156),
select_candidate_by_complexity_score (...:2158-2169).
"""

from __future__ import annotations

__all__ = [
    "normalize_scores",
    "combine_complexity_metric_scores",
    "select_candidate_by_complexity_score",
]


def normalize_scores(raw_values: list[float], is_complex_when_larger: bool):
    """Min-max normalize; flip direction; reliability weight by unique count."""
    if not raw_values:
        return [], 0.0
    min_val = min(raw_values)
    max_val = max(raw_values)
    unique_count = len(set(raw_values))
    weight = 0.0 if unique_count <= 1 else (0.2 if unique_count == 2 else 1.0)
    if max_val == min_val:
        normalized = [0.5] * len(raw_values)
    else:
        normalized = [(v - min_val) / (max_val - min_val) for v in raw_values]
    scores = [(v if is_complex_when_larger else (1.0 - v)) * weight for v in normalized]
    return scores, weight


def combine_complexity_metric_scores(
    raw_dist: list[float],
    raw_quantity: list[float],
    raw_complexity: list[float],
    raw_usage: list[float],
    metric_weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> list[float]:
    n = max(len(raw_dist), len(raw_quantity), len(raw_complexity), len(raw_usage), 0)
    if n <= 0:
        return []

    dist_scores, dist_rel = normalize_scores(raw_dist, True)
    qty_scores, qty_rel = normalize_scores(raw_quantity, False)
    comp_scores, comp_rel = normalize_scores(raw_complexity, True)
    usage_scores, usage_rel = normalize_scores(raw_usage, False)

    dw = max(metric_weights[0], 0.0)
    qw = max(metric_weights[1], 0.0)
    cw = max(metric_weights[2], 0.0)
    uw = max(metric_weights[3], 0.0)

    denom = dw * dist_rel + qw * qty_rel + cw * comp_rel + uw * usage_rel
    if denom <= 0.0:
        return [0.0] * n

    out = []
    for i in range(n):
        d = dist_scores[i] if i < len(dist_scores) else 0.0
        q = qty_scores[i] if i < len(qty_scores) else 0.0
        c = comp_scores[i] if i < len(comp_scores) else 0.0
        u = usage_scores[i] if i < len(usage_scores) else 0.0
        out.append((dw * d + qw * q + cw * c + uw * u) / denom)
    return out


def select_candidate_by_complexity_score(scores: list[float], target_val: float) -> int:
    """argmin |score - target| (first wins on ties), 0-based."""
    best_index = 0
    min_diff = float("inf")
    for idx, score in enumerate(scores):
        diff = abs(score - target_val)
        if diff < min_diff:
            min_diff = diff
            best_index = idx
    return best_index
