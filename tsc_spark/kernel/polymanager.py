"""Set-mode (polyphonic) incremental subsequence clustering manager.

Each timestep is a PolySet (an unordered chord of floats) instead of a
scalar token — the reference's full data model
(/root/reference/src/polyphonic/polyphonic_cluster_manager.jl:24-27).
This subclass reuses the scalar ``ClusterManager``'s entire
orchestration bit-for-bit (task worklist, forest growth, valid/invalid
grouping, root assignment, journal/rollback, caches, recency — all
inherited unchanged) and swaps only the point layer:

* storage: list-of-sets ring instead of the float64 numpy buffer
* point distance: ``min_avg_distance`` (set mode, ...:244-287) or
  ``ordered_vector_distance01`` (...:294-312) from kernel.polyset
* representative averaging: ``average_sequences`` (...:387-445 —
  sorted index-wise mean for same-size sets, latest-wins otherwise)
* contextual value width: flat mean over all set members (...:1051-1094)

Equivalence guarantee (tested): with every set a singleton, this
subclass reproduces the scalar manager's timelines and representative
floats EXACTLY — min_avg_distance of singletons collapses to
clamp01(|a−b|/width), sorting a singleton is the identity, and the flat
mean over singletons is the scalar mean.
"""

from __future__ import annotations

import math

import numpy as np

from ..config import (
    DEFAULT_CONTEXTUAL_MIN_WIDTH,
    DEFAULT_RANGE_MAX,
    DEFAULT_RANGE_MIN,
    SUBSEQUENCE_MIN_WINDOW_SIZE,
    UNIT_MAX,
    UNIT_MIN,
)
from .manager import ClusterManager, ClusterNode, seq_sum
from .polyset import (
    average_sequences,
    min_avg_distance,
    ordered_vector_distance01,
    streamwise_surface_average,
)

__all__ = ["PolyClusterManager"]


def _copy_seq(seq):
    return [list(s) for s in seq]


class PolyClusterManager(ClusterManager):
    """Set-valued points; scalar orchestration inherited unchanged."""

    def __init__(
        self,
        data,
        merge_threshold_ratio: float = 0.3,
        min_window_size: int = SUBSEQUENCE_MIN_WINDOW_SIZE,
        calculate_distance_when_added: bool = False,
        *,
        scale_mode: str = "range_fixed",
        contextual_min_width: float = DEFAULT_CONTEXTUAL_MIN_WIDTH,
        range_min: float = DEFAULT_RANGE_MIN,
        range_max: float = DEFAULT_RANGE_MAX,
        value_min: float = UNIT_MIN,
        value_max: float = UNIT_MAX,
        recency: float = 0.0,
        max_set_size: int = 4,
        point_distance_mode: str = "set",
        point_axis_ranges=(),
        use_streamwise_surface_average: bool = False,
        stream_axis_offset: float = 0.0,
    ):
        sets = [[float(v) for v in s] for s in data]
        n = len(sets)
        self._sets: list[list[float]] = sets

        self.mtr = float(merge_threshold_ratio)
        self.min_window_size = int(min_window_size)
        self.calc_dist_on_add = bool(calculate_distance_when_added)
        self.scale_mode = scale_mode
        self.contextual_min_width = float(contextual_min_width)
        self.max_set_size = max(int(max_set_size), 1)
        self.point_distance_mode = point_distance_mode
        self.point_axis_ranges = [float(r) for r in point_axis_ranges]
        # forced-global polyphonic streams: representatives average by
        # decoded stream slot (reference ...pcm.jl:343-389)
        self.use_streamwise_surface_average = bool(use_streamwise_surface_average)
        self.stream_axis_offset = float(stream_axis_offset)

        if scale_mode == "range_fixed":
            vmin, vmax = float(range_min), float(range_max)
        else:
            vmin, vmax = float(value_min), float(value_max)
        vwidth = abs(vmax - vmin)
        self.value_min = vmin
        self.value_max = vmax
        self.value_width = vwidth if vwidth > 0.0 else 1.0

        self.recency = min(max(float(recency), 0.0), 1.0)

        mw = self.min_window_size
        self._n = n
        seed_rep = _copy_seq(sets[0:mw]) if n >= mw else None
        self.clusters = {0: ClusterNode([0], seed_rep)}
        self.cluster_id_counter = 1
        self.tasks = []

        self._root_ids = [0]
        self._root_row = {0: 0}
        self._root_reps: list = [seed_rep]  # list mirror (no numpy matrix)
        self._root_empty = set() if seed_rep is not None else {0}
        self._start_to_root = {0: 0}

        self.updated_dist = {mw: {0}}
        self.updated_qty = {mw: {0}}
        self.dist_cache = {mw: {}}
        self.qty_cache = {mw: {}}
        self.comp_cache = {mw: {}}

        self._recording = False
        self._journal = []
        self._snapshot = None
        self._batch_threshold = 1 << 60  # sets are ragged: no batch path

    # ------------------------------------------------------------------
    # data access (set storage)
    # ------------------------------------------------------------------
    def data_view(self):
        return self._sets[: self._n]

    def _window(self, start: int, length: int):
        return self._sets[start : start + length]

    def _push(self, value) -> None:
        if np.isscalar(value):
            value = [float(value)]
        self._sets = self._sets[: self._n]
        self._sets.append([float(v) for v in value])
        self._n += 1

    def _pop(self) -> None:
        self._sets.pop()
        self._n -= 1

    # ------------------------------------------------------------------
    # point layer
    # ------------------------------------------------------------------
    def _point_dist(self, a, b) -> float:
        if self.point_distance_mode == "ordered_vector":
            return ordered_vector_distance01(
                a, b, self.point_axis_ranges, self.value_width
            )
        return min_avg_distance(a, b, self.value_width, self.max_set_size)

    def euclidean_distance(self, a, b) -> float:
        """sqrt of in-order sum of squared per-step set distances
        (reference ...:317-333); empty representative = all-ones."""
        if a is None:
            L = min(self.min_window_size, len(b))
            return math.sqrt(float(L))
        L = min(len(a), len(b))
        s = 0.0
        for i in range(L):
            d = self._point_dist(a[i], b[i])
            s += d * d
        return math.sqrt(s)

    def euclidean_distance_pair(self, n1: ClusterNode, n2: ClusterNode) -> float:
        if n1.rep is None and n2.rep is None:
            return 0.0
        if n1.rep is None:
            return self.euclidean_distance(None, n2.rep)
        if n2.rep is None:
            return self.euclidean_distance(None, n1.rep)
        return self.euclidean_distance(n1.rep, n2.rep)

    def cluster_complexity(self, rep) -> float:
        """Mean adjacent-step set distance (reference ...:691-716)."""
        if rep is None or len(rep) < 2:
            return 0.0
        s = 0.0
        for i in range(len(rep) - 1):
            s += self._point_dist(rep[i], rep[i + 1])
        return s / float(len(rep) - 1)

    def _average_windows(self, starts: list[int], length: int):
        if len(starts) == 1:
            return _copy_seq(self._window(starts[0], length))
        seqs = [self._window(s, length) for s in starts]
        if self.use_streamwise_surface_average:
            return streamwise_surface_average(
                seqs, self.value_min, self.stream_axis_offset, self.max_set_size
            )
        return average_sequences(
            seqs, ordered_vector=self.point_distance_mode == "ordered_vector"
        )

    def _rep_merge(self, node: ClusterNode, length: int):
        # ragged set members have no flat running sum — full re-average
        # (the scalar base class's incremental-sum path doesn't apply)
        return self._average_windows(node.si, length)

    # ------------------------------------------------------------------
    # contextual halves width over flattened set members (...:1063-1094)
    # ------------------------------------------------------------------
    def _update_value_width(self, upto_index: int) -> None:
        if self.scale_mode == "range_fixed":
            return
        last = min(max(upto_index + 1, 1), self._n)
        flat: list[float] = []
        for s in self._sets[:last]:
            flat.extend(s)
        vals = np.asarray(flat, dtype=np.float64)
        cnt = vals.shape[0]
        mean = seq_sum(vals) / cnt if cnt else 0.0

        lo = vals[vals <= mean]
        hi = vals[vals >= mean]
        lower = seq_sum(lo) / lo.shape[0] if lo.shape[0] else 0.0
        upper = seq_sum(hi) / hi.shape[0] if hi.shape[0] else 0.0

        delta = abs(upper - lower)
        if self.scale_mode == "contextual_global_halves":
            delta = max(delta, self.contextual_min_width)
        self.value_width = delta if delta > 0.0 else 1.0

    # ------------------------------------------------------------------
    # roots: list mirror instead of the numpy rep matrix
    # ------------------------------------------------------------------
    def _root_dists(self, latest_seq) -> np.ndarray:
        mw = self.min_window_size
        dists = np.empty(len(self._root_ids), dtype=np.float64)
        for row, rid in enumerate(self._root_ids):
            rep = self.clusters[rid].rep
            dists[row] = (
                math.sqrt(float(mw)) if rep is None
                else self.euclidean_distance(rep, latest_seq)
            )
        return dists

    def _root_add(self, cid: int, node: ClusterNode) -> None:
        row = len(self._root_ids)
        self._root_ids.append(cid)
        self._root_row[cid] = row
        self._root_reps.append(node.rep)
        if node.rep is None:
            self._root_empty.add(cid)
        if node.si:
            self._start_to_root[node.si[0]] = cid

    # ------------------------------------------------------------------
    # outputs
    # ------------------------------------------------------------------
    def tree(self):
        """(path, sorted si, rep as list-of-sets) rows."""
        rows = []

        def walk(path, node):
            rep = [] if node.rep is None else _copy_seq(node.rep)
            rows.append((path, sorted(node.si), rep))
            for cid in sorted(node.cc):
                walk(path + [cid], node.cc[cid])

        for cid in sorted(self.clusters):
            walk([cid], self.clusters[cid])
        return rows
