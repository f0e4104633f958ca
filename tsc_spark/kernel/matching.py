"""Query↔series similarity matching over shared clusters.

Re-implements the reference query_db per-series compute (everything after
the InfluxDB fetch): cross-cluster extraction
(/root/reference/src/controllers/time_series_controller.jl:123-199),
containment filter (...:1990-2040) and match score (...:1978-1988).
The distributed (Spark) version feeds one call per (query, doc) pair.
"""

from __future__ import annotations

from ..config import (
    DEFAULT_MERGE_THRESHOLD_RATIO,
    DEFAULT_QUERY_MIN_MATCH_WINDOW,
    DEFAULT_RANGE_MAX,
    DEFAULT_RANGE_MIN,
    SUBSEQUENCE_MIN_WINDOW_SIZE,
)
from .manager import ClusterManager

__all__ = [
    "build_query_seed",
    "match_series",
    "match_series_rollback",
    "filter_contained_matches",
    "match_score",
]


def build_query_seed(
    query_tokens,
    merge_threshold: float = DEFAULT_MERGE_THRESHOLD_RATIO,
    range_min: int = DEFAULT_RANGE_MIN,
    range_max: int = DEFAULT_RANGE_MAX,
) -> ClusterManager:
    """Seed manager clustered over the query only (reference ...:123-136)."""
    mgr = ClusterManager(
        [float(int(v)) for v in query_tokens],
        merge_threshold,
        SUBSEQUENCE_MIN_WINDOW_SIZE,
        True,
        scale_mode="range_fixed",
        range_min=range_min,
        range_max=range_max,
    )
    mgr.process_data()
    return mgr


def _match_contains(outer, inner) -> bool:
    oq, od, ow = outer
    iq, id_, iw = inner
    return (
        oq <= iq
        and od <= id_
        and iq + iw <= oq + ow
        and id_ + iw <= od + ow
        and (ow > iw or oq != iq or od != id_)
    )


def filter_contained_matches(matches):
    """Dedup (q_start, db_start, ws) then drop strictly-contained matches;
    sort by (q_start, db_start, -ws).  Reference ...:2005-2040.

    Containment is a pairwise predicate over the deduped *set* (the
    output is fully re-sorted, so dedup order is irrelevant); above a
    small size the m×m scan runs as one numpy broadcast instead of an
    interpreted double loop — identical kept set, integer-exact."""
    if not matches:
        return []
    if len(matches) < 24:
        deduped = []
        seen = set()
        for m in matches:
            if m not in seen:
                seen.add(m)
                deduped.append(m)
        kept = []
        for i, m in enumerate(deduped):
            contained = False
            for j, other in enumerate(deduped):
                if i != j and _match_contains(other, m):
                    contained = True
                    break
            if not contained:
                kept.append(m)
        kept.sort(key=lambda m: (m[0], m[1], -m[2]))
        return kept

    import numpy as np

    arr = np.unique(np.asarray(matches, dtype=np.int64), axis=0)
    q, d, w = arr[:, 0], arr[:, 1], arr[:, 2]
    oq, iq = q[:, None], q[None, :]
    od, idx = d[:, None], d[None, :]
    ow, iw = w[:, None], w[None, :]
    contains = (
        (oq <= iq)
        & (od <= idx)
        & (iq + iw <= oq + ow)
        & (idx + iw <= od + ow)
        & ((ow > iw) | (oq != iq) | (od != idx))
    )
    # diagonal is False by the last clause (a match never strictly
    # contains itself)
    kept = arr[~contains.any(axis=0)]
    order = np.lexsort((-kept[:, 2], kept[:, 1], kept[:, 0]))
    return [tuple(int(v) for v in row) for row in kept[order]]


def match_score(matches) -> list[int]:
    """Desc-sorted per-window-size match counts (lexicographic rank key).
    Reference ...:1978-1988."""
    if not matches:
        return []
    counts: dict[int, int] = {}
    for _, _, ws in matches:
        counts[ws] = counts.get(ws, 0) + 1
    return [counts[k] for k in sorted(counts, reverse=True)]


def _extract_cross_matches(mgr: ClusterManager, qlen: int, slen: int, min_match_window: int):
    """Cross-cluster (q_start, db_start, ws) extraction (reference
    ...:157-201): clusters whose members span both the query prefix and
    the appended DB suffix yield the index cross product.

    Walks the cluster forest directly instead of materializing the
    (sorted) full timeline per doc — the match SET is what downstream
    consumes (filter_contained_matches dedups and fully re-sorts;
    match_score counts), so traversal order is immaterial and the
    timeline build+sort was pure overhead on the per-doc hot path."""
    matches: list[tuple[int, int, int]] = []
    stack = [(mgr.min_window_size, n) for n in mgr.clusters.values()]
    while stack:
        ws, node = stack.pop()
        for child in node.cc.values():
            stack.append((ws + 1, child))
        inds = node.si
        if ws < min_match_window or not inds:
            continue
        has_q = any(i < qlen for i in inds)
        has_db = any(i >= qlen for i in inds)
        if not (has_q and has_db):
            continue
        q_indices = sorted(i for i in inds if i < qlen and i + ws <= qlen)
        db_indices = sorted(i - qlen for i in inds if i >= qlen and (i - qlen) + ws <= slen)
        if q_indices and db_indices:
            for qi in q_indices:
                for dbi in db_indices:
                    matches.append((qi, dbi, ws))
    return matches


def match_series(
    seed: ClusterManager,
    db_tokens,
    min_match_window: int = DEFAULT_QUERY_MIN_MATCH_WINDOW,
    copy_seed: bool = True,
):
    """Append a DB series to a copy of the query seed and extract
    cross-cluster matches (reference ...:157-201).

    Returns (matches, score) where matches = [(q_start, db_start, ws)].
    With ``copy_seed=True`` a deep copy is taken; pass False when the
    caller already owns a throwaway copy (e.g. fresh unpickle per doc).
    """
    import copy

    mgr = copy.deepcopy(seed) if copy_seed else seed
    qlen = len(seed.data_view())
    db_values = [float(int(v)) for v in db_tokens]
    for v in db_values:
        mgr.add_data_point(v)

    kept = filter_contained_matches(
        _extract_cross_matches(mgr, qlen, len(db_values), min_match_window)
    )
    return kept, match_score(kept)


def match_series_rollback(
    seed: ClusterManager,
    db_tokens,
    min_match_window: int = DEFAULT_QUERY_MIN_MATCH_WINDOW,
):
    """``match_series`` against a REUSABLE seed: the whole DB append runs
    inside one journal transaction (the W3 simulate/rollback machinery,
    reference ...:797-891) and is rolled back afterwards, leaving the
    seed bit-identical — so a batch worker unpickles the broadcast seed
    once and amortises it across every document in the batch instead of
    deserialising per doc.

    Exactness: the rollback journal undoes every mutation add_data_point
    makes (data push, si/rep edits, cluster creates, cache writes), and
    query seeds use ``range_fixed`` scaling so value_width is untouched
    by appends — verified equivalent to the fresh-copy path in
    tests/test_equivalences.py."""
    qlen = len(seed.data_view())
    db_values = [float(int(v)) for v in db_tokens]
    seed._start_transaction()
    try:
        for v in db_values:
            seed.add_data_point(v)
        matches = _extract_cross_matches(seed, qlen, len(db_values), min_match_window)
    finally:
        seed._rollback()
    kept = filter_contained_matches(matches)
    return kept, match_score(kept)
