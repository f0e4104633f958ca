"""Multi-stream pool manager for polyphonic generation.

Exact semantics of the reference multi-stream manager
(/root/reference/src/polyphonic/multi_stream_manager.jl): a pool of
per-stream PolyClusterManagers with lifecycle (fork / deactivate /
revive), presence/strength tracking, per-candidate complexity cost
precalculation, and Hungarian stream↔candidate mapping.

Numeric primitives are shared with kernel.multistream
(set_distance01, generate_centered_targets, INACTIVE_STRENGTH_DECAY)
and kernel.dissonance (hungarian_min_assignment); this module owns the
mutable pool state the reference keeps in ``Manager`` (...:88-113).
"""

from __future__ import annotations

import copy
import math

from ..config import (
    MAX_SET_SIZE,
    NOTE_RANGE_MAX,
    NOTE_RANGE_MIN,
)
from .multistream import (
    INACTIVE_STRENGTH_DECAY,
    generate_centered_targets,
    set_distance01,
)
from .dissonance import hungarian_min_assignment
from .polymanager import PolyClusterManager

__all__ = ["StreamContainer", "LifecyclePlan", "StreamPool"]


def _to_polyset(v) -> list[float]:
    if isinstance(v, (list, tuple)):
        return [float(x) for x in v]
    return [float(v)]


class StreamContainer:
    """Reference StreamContainer (...:68-77)."""

    __slots__ = (
        "id", "manager", "last_value", "last_abs_pitch",
        "strength", "presence_sum", "presence_count", "presence_avg",
    )

    def __init__(self, sid, manager, last_value, last_abs_pitch,
                 presence_sum=0.0, presence_count=0, presence_avg=0.0):
        self.id = sid
        self.manager = manager
        self.last_value = list(last_value)
        self.last_abs_pitch = None if last_abs_pitch is None else list(last_abs_pitch)
        self.strength = 0.0
        self.presence_sum = presence_sum
        self.presence_count = presence_count
        self.presence_avg = presence_avg


class LifecyclePlan:
    """Reference LifecyclePlan (...:79-85)."""

    def __init__(self, deactivate_ids, revive_ids, fork_pairs, active_ids):
        self.deactivate_ids = list(deactivate_ids)
        self.revive_ids = list(revive_ids)
        self.fork_pairs = list(fork_pairs)
        self.active_ids = list(active_ids)


def _clamp01(x: float) -> float:
    return min(max(float(x), 0.0), 1.0)


class StreamPool:
    """Reference MultiStreamManager.Manager (...:88-382)."""

    def __init__(
        self,
        history_matrix,
        merge_threshold_ratio: float,
        min_window_size: int,
        *,
        use_complexity_mapping: bool = True,
        value_range=None,
        max_set_size: int = MAX_SET_SIZE,
        track_presence: bool = False,
        recency: float = 0.0,
    ):
        self.merge_threshold_ratio = float(merge_threshold_ratio)
        self.min_window_size = int(min_window_size)
        self.use_complexity_mapping = bool(use_complexity_mapping)
        self.track_presence = bool(track_presence)
        self.history_matrix = self._normalize_history_matrix(history_matrix)
        self.next_stream_id = 1
        self.stream_pool: list[StreamContainer] = []
        self.containers_by_id: dict[int, StreamContainer] = {}
        self.active_ids: list[int] = []
        self.inactive_ids: list[int] = []
        self.max_simultaneous_notes = max(int(max_set_size), 1)
        self.recency = _clamp01(recency)
        self.pending_absolute_bases = None

        self._infer_value_range_from_history()
        if value_range is not None:
            vmin = float(min(value_range))
            vmax = float(max(value_range))
            width = abs(vmax - vmin)
            self.value_min = vmin
            self.value_max = vmax
            self.value_width = width if width > 0.0 else 1.0
            self.fixed_value_range = True
        else:
            self.fixed_value_range = False

        self._build_initial_streams_from_history()

    # -- construction (reference ...:130-322) --------------------------
    @staticmethod
    def _normalize_history_matrix(raw):
        rows = list(raw) if raw is not None else []
        max_cols = 1
        for row in rows:
            try:
                max_cols = max(max_cols, len(row))
            except TypeError:
                pass
        out = []
        for row in rows:
            rr = []
            for j in range(max_cols):
                v = row[j] if j < len(row) else None
                if v is None:
                    rr.append([0.0])
                elif isinstance(v, (list, tuple)):
                    rr.append([float(x) for x in v])
                else:
                    rr.append([float(v)])
            out.append(rr)
        return out

    def _infer_value_range_from_history(self):
        vals = [x for row in self.history_matrix for v in row for x in v]
        if not vals:
            self.value_min, self.value_max = 0.0, 1.0
        else:
            self.value_min, self.value_max = min(vals), max(vals)
        w = abs(self.value_max - self.value_min)
        self.value_width = w if w > 0.0 else 1.0

    def _update_value_range_from_candidates(self, candidate_values):
        vals = [x for v in candidate_values for x in v]
        if not vals:
            return
        self.value_min = min(self.value_min, min(vals))
        self.value_max = max(self.value_max, max(vals))
        w = abs(self.value_max - self.value_min)
        self.value_width = w if w > 0.0 else 1.0

    def _build_stream_manager(self, series) -> PolyClusterManager:
        mgr = PolyClusterManager(
            series,
            self.merge_threshold_ratio,
            self.min_window_size,
            False,
            scale_mode="range_fixed",
            range_min=self.value_min,
            range_max=self.value_max,
            value_min=self.value_min,
            value_max=self.value_max,
            max_set_size=self.max_simultaneous_notes,
            recency=self.recency,
        )
        # reference builds stream managers with try/catch noop around
        # both calls (multi_stream_manager.jl:243-252)
        try:
            mgr.process_data()
        except Exception:
            pass
        try:
            mgr.update_caches_permanently()
        except Exception:
            pass
        return mgr

    def _scalar_to_strength01(self, x: float) -> float:
        if self.value_width > 0.0 and math.isfinite(self.value_width):
            return _clamp01((float(x) - self.value_min) / self.value_width)
        return _clamp01(x)

    def _build_initial_streams_from_history(self):
        steps = len(self.history_matrix)
        stream_count = max(len(self.history_matrix[0]) if steps else 1, 1)
        for s_idx in range(stream_count):
            series = [list(self.history_matrix[t][s_idx]) for t in range(steps)]
            sid = self.next_stream_id
            self.next_stream_id += 1
            mgr = self._build_stream_manager(series)
            pres_sum, pres_cnt, pres_avg = 0.0, 0, 0.0
            if self.track_presence:
                for v in series:
                    if len(v) == 1:
                        pres_sum += self._scalar_to_strength01(v[0])
                        pres_cnt += 1
                pres_avg = (
                    _clamp01(pres_sum / pres_cnt)
                    if pres_cnt > 0
                    else self._scalar_to_strength01(series[-1][0])
                )
            c = StreamContainer(sid, mgr, list(series[-1]), None,
                                pres_sum, pres_cnt, pres_avg)
            self.stream_pool.append(c)
            self.containers_by_id[sid] = c
            self.active_ids.append(sid)

    # -- active stream control (reference ...:388-571) -----------------
    def ensure_stream_id_max(self, max_id: int):
        if max_id <= 0:
            return
        while self.next_stream_id <= max_id:
            self.add_new_stream_with_id(self.next_stream_id)
            self.next_stream_id += 1

    def ensure_stream_count_min(self, n: int):
        n = max(n, 1)
        if len(self.stream_pool) < n:
            self.ensure_stream_id_max(n)

    def add_new_stream_with_id(self, sid: int):
        if sid in self.containers_by_id:
            return
        length = max(len(self.history_matrix), 1)
        seed = [self.value_min]
        series = [list(seed) for _ in range(length)]
        mgr = self._build_stream_manager(series)
        c = StreamContainer(sid, mgr, list(seed), None)
        self.stream_pool.append(c)
        self.containers_by_id[sid] = c
        if sid not in self.active_ids:
            self.active_ids.append(sid)

    def revive_stream_ids(self, ids):
        for sid in ids:
            if sid in self.inactive_ids:
                self.inactive_ids = [x for x in self.inactive_ids if x != sid]
                if sid not in self.active_ids:
                    self.active_ids.append(sid)

    def deactivate_stream_ids(self, ids):
        for sid in ids:
            if sid in self.active_ids:
                self.active_ids = [x for x in self.active_ids if x != sid]
                if sid not in self.inactive_ids:
                    self.inactive_ids.append(sid)

    def fork_stream_from_id(self, source_id: int, new_id: int):
        if new_id in self.containers_by_id:
            return
        self.ensure_stream_id_max(source_id)
        src = self.containers_by_id.get(source_id)
        if src is None:
            self.add_new_stream_with_id(new_id)
            return
        c = StreamContainer(
            new_id,
            copy.deepcopy(src.manager),
            list(src.last_value),
            None if src.last_abs_pitch is None else list(src.last_abs_pitch),
            src.presence_sum,
            src.presence_count,
            src.presence_avg,
        )
        self.stream_pool.append(c)
        self.containers_by_id[new_id] = c
        if new_id not in self.active_ids:
            self.active_ids.append(new_id)

    def set_active_stream_ids(self, ids_raw):
        ids = list(dict.fromkeys(int(x) for x in ids_raw))
        if not ids:
            ids = [self.active_ids[0]] if self.active_ids else [1]
        self.ensure_stream_id_max(max(ids))
        self.revive_stream_ids([i for i in ids if i in self.inactive_ids])
        self.active_ids = ids

    def active_stream_containers(self, n: int) -> list[StreamContainer]:
        n = max(int(n), 1)
        if not self.active_ids:
            self.ensure_stream_count_min(n)
            self.active_ids = [
                c.id for c in self.stream_pool[: min(n, len(self.stream_pool))]
            ]
        if len(self.active_ids) < n:
            self.ensure_stream_count_min(n)
            extra = []
            for c in self.stream_pool:
                if c.id not in self.active_ids and c.id not in self.inactive_ids:
                    extra.append(c.id)
                if len(extra) >= n - len(self.active_ids):
                    break
            self.active_ids.extend(extra)
        elif len(self.active_ids) > n:
            self.active_ids = self.active_ids[:n]
        return [
            self.containers_by_id[i]
            for i in self.active_ids
            if i in self.containers_by_id
        ]

    # -- strength / presence (reference ...:578-694) -------------------
    def update_stream_strength(self, stream_id: int, volume_value: float):
        if not self.track_presence:
            return
        c = self.containers_by_id.get(stream_id)
        if c is None:
            return
        vv = _clamp01(volume_value)
        c.presence_sum += vv
        c.presence_count += 1
        c.presence_avg = (
            _clamp01(c.presence_sum / c.presence_count) if c.presence_count > 0 else vv
        )

    def presence_of_id(self, sid: int) -> float:
        c = self.containers_by_id.get(sid)
        if c is None:
            return 0.0
        if self.track_presence:
            return _clamp01(c.presence_avg)
        return (
            self._scalar_to_strength01(c.last_value[0])
            if len(c.last_value) == 1
            else 0.0
        )

    def decay_inactive_strengths(self, factor: float = INACTIVE_STRENGTH_DECAY):
        f = _clamp01(factor)
        for sid in self.inactive_ids:
            c = self.containers_by_id.get(sid)
            if c is None:
                continue
            c.presence_sum *= f
            c.presence_avg = _clamp01(c.presence_avg * f)

    # -- lifecycle planning (reference ...:700-821) --------------------
    def build_stream_lifecycle_plan(self, desired_count: int, *, target, spread) -> LifecyclePlan:
        dc = max(int(desired_count), 1)
        self.decay_inactive_strengths()
        if not self.active_ids:
            self.ensure_stream_count_min(1)
            if self.stream_pool:
                self.active_ids = [self.stream_pool[0].id]
        current_active = list(self.active_ids)
        cur_n = len(current_active)
        t = _clamp01(target)
        s = _clamp01(spread)

        if dc < cur_n:
            k = cur_n - dc
            delete_targets = generate_centered_targets(t, s, n=k)
            aws = [(i, self.presence_of_id(i)) for i in current_active]
            deactivate = []
            for tv in delete_targets:
                best_id, best_dist = 0, math.inf
                for sid, strength in aws:
                    if sid in deactivate:
                        continue
                    d = abs(strength - tv)
                    if d < best_dist:
                        best_dist, best_id = d, sid
                if best_id != 0:
                    deactivate.append(best_id)
            active = [i for i in current_active if i not in deactivate]
            return LifecyclePlan(deactivate, [], [], active)

        if dc > cur_n:
            k = dc - cur_n
            active = list(current_active)
            revive, forks = [], []
            aws = [(i, self.presence_of_id(i)) for i in current_active]
            iws = [(i, self.presence_of_id(i)) for i in self.inactive_ids]
            for tv in generate_centered_targets(t, s, n=k):
                best_type, best_id, best_dist = None, 0, math.inf
                for sid, strength in aws:
                    d = abs(strength - tv)
                    if d < best_dist:
                        best_dist, best_id, best_type = d, sid, "active"
                for sid, strength in iws:
                    if sid in revive:
                        continue
                    d = abs(strength - tv)
                    if d < best_dist:
                        best_dist, best_id, best_type = d, sid, "inactive"
                if best_type == "inactive" and best_id != 0:
                    revive.append(best_id)
                    active.append(best_id)
                elif best_type == "active" and best_id != 0:
                    new_id = self.next_stream_id
                    self.next_stream_id += 1
                    forks.append((best_id, new_id))
                    active.append(new_id)
            return LifecyclePlan([], revive, forks, active)

        return LifecyclePlan([], [], [], current_active)

    def apply_stream_lifecycle_plan(self, plan: LifecyclePlan):
        self.deactivate_stream_ids(plan.deactivate_ids)
        self.revive_stream_ids(plan.revive_ids)
        for src, nid in plan.fork_pairs:
            self.fork_stream_from_id(src, nid)
        if plan.fork_pairs:
            max_new = max(p[1] for p in plan.fork_pairs)
            self.next_stream_id = max(self.next_stream_id, max_new + 1)
        if plan.active_ids:
            self.set_active_stream_ids(plan.active_ids)

    # -- cost precalculation (reference ...:828-893) -------------------
    def precalculate_costs(self, candidate_values_raw, n_raw=None) -> dict[int, dict[float, tuple[float, float]]]:
        """{stream_id: {candidate_value: (raw, complexity01)}}."""
        candidate_values = [_to_polyset(v) for v in candidate_values_raw]
        if not self.fixed_value_range:
            self._update_value_range_from_candidates(candidate_values)
        n = len(self.active_ids) if n_raw is None else int(n_raw)
        n = max(n, 1)
        per_stream: dict[int, dict[float, tuple[float, float]]] = {}
        for c in self.active_stream_containers(n):
            per_value: dict[float, tuple[float, float]] = {}
            raw_list = []
            for v in candidate_values:
                key = v[0] if v else 0.0
                try:
                    dist, _qty, comp, _u = c.manager.simulate_add_and_calculate_all(v)
                except Exception:
                    dist, comp = 0.0, 0.0
                if self.track_presence and len(v) == 1:
                    raw = dist if math.isfinite(dist) else (comp if math.isfinite(comp) else 0.0)
                else:
                    raw = comp if math.isfinite(comp) else (dist if math.isfinite(dist) else 0.0)
                raw_list.append(raw)
                per_value[key] = (raw, 0.0)
            min_r = min(raw_list) if raw_list else 0.0
            max_r = max(raw_list) if raw_list else 0.0
            span = abs(max_r - min_r)
            if span <= 0.0:
                span = 1.0
            for v in candidate_values:
                key = v[0] if v else 0.0
                pc = per_value.get(key)
                if pc is None:
                    per_value[key] = (0.0, 0.5)
                else:
                    per_value[key] = (pc[0], _clamp01((pc[0] - min_r) / span))
            per_stream[c.id] = per_value
        return per_stream

    # -- mapping + scoring (reference ...:1032-1189) -------------------
    def resolve_mapping_and_score(
        self,
        cand_set_raw,
        stream_costs,
        *,
        absolute_bases=None,
        active_note_counts=None,
        active_total_notes=None,
        distance_weight=None,
        complexity_weight=None,
    ):
        cand_set = [_to_polyset(v) for v in cand_set_raw]
        n = max(len(cand_set), 1)
        if absolute_bases is not None:
            self.pending_absolute_bases = list(absolute_bases)

        if distance_weight is None or complexity_weight is None:
            dw, cw = (0.0, 1.0) if self.use_complexity_mapping else (1.0, 0.0)
        else:
            dw, cw = _clamp01(distance_weight), _clamp01(complexity_weight)

        actives = self.active_stream_containers(n)
        dist_m = [[0.0] * n for _ in range(n)]
        comp_m = [[0.0] * n for _ in range(n)]
        cost_m = [[0.0] * n for _ in range(n)]

        abs_width = 1.0
        if absolute_bases is not None:
            bases = [float(x) for x in absolute_bases]
            pc_width = float(NOTE_RANGE_MAX - NOTE_RANGE_MIN)
            if pc_width <= 0.0:
                pc_width = 1.0
            abs_width = abs(max(bases) - min(bases)) + pc_width
            if abs_width <= 0.0:
                abs_width = 1.0

        for i, stream in enumerate(actives):
            for j in range(n):
                v = cand_set[j]
                if absolute_bases is not None:
                    base = absolute_bases[i]
                    abs_candidate = [base + (int(pc) % 12) for pc in v]
                    last_abs = stream.last_abs_pitch
                    if last_abs is None:
                        last_abs = [base + (int(pc) % 12) for pc in stream.last_value]
                    pitch_dist01 = set_distance01(
                        abs_candidate, last_abs, abs_width, self.max_simultaneous_notes
                    )
                    count01 = (
                        0.0
                        if active_note_counts is None
                        else _clamp01(active_note_counts[i] / self.max_simultaneous_notes)
                    )
                    dist01 = _clamp01((pitch_dist01 + count01) / 2.0)
                else:
                    last = stream.last_value
                    if (
                        self.track_presence
                        and stream_costs is not None
                        and len(v) == 1
                        and len(last) == 1
                    ):
                        dist01 = 0.0
                    elif len(v) == 1 and len(last) == 1:
                        dist01 = _clamp01(abs(v[0] - last[0]) / self.value_width)
                    else:
                        dist01 = set_distance01(
                            v, last, self.value_width, self.max_simultaneous_notes
                        )

                if stream_costs is None:
                    comp01 = 0.5
                else:
                    d = stream_costs.get(stream.id)
                    if d is None:
                        comp01 = 0.5
                    else:
                        key = v[0] if v else 0.0
                        pc = d.get(key)
                        comp01 = 0.5 if pc is None else pc[1]

                dist_m[i][j] = dist01
                comp_m[i][j] = comp01
                cost_m[i][j] = (
                    dw * dist01
                    + cw * comp01
                    + 1e-9 * (float(j + 1) + float(i + 1) * 1e-3)
                )

        assignment = hungarian_min_assignment(cost_m)
        ordered = [None] * n
        individual = []
        total_dist = total_comp = 0.0
        for i, stream in enumerate(actives):
            j = assignment[i]
            ordered[i] = cand_set[j]
            total_dist += dist_m[i][j]
            total_comp += comp_m[i][j]
            individual.append((stream.id, dist_m[i][j], comp_m[i][j]))
        metric = {
            "individual_scores": individual,
            "avg_distance01": _clamp01(total_dist / n),
            "avg_complexity01": _clamp01(total_comp / n),
        }
        return ordered, metric

    # -- commit (reference ...:1219-1291) ------------------------------
    def commit_state(self, best_chord_raw, strength_params=None, absolute_bases=None):
        best_chord = [_to_polyset(v) for v in best_chord_raw]
        n = max(len(best_chord), 1)
        if absolute_bases is not None:
            self.pending_absolute_bases = list(absolute_bases)
        for i, stream in enumerate(self.active_stream_containers(n)):
            v = best_chord[i]
            try:
                stream.manager.add_data_point(v)
            except Exception:
                # reference safe_add_data_point! (multi_stream_manager.jl
                # :1196-1204): a degenerate series must not abort the
                # request — fall back to pushing the raw point
                stream.manager._push(v)
            stream.last_value = list(v)
            if self.pending_absolute_bases is not None:
                base = self.pending_absolute_bases[i]
                stream.last_abs_pitch = [base + (int(pc) % 12) for pc in v]
            if self.track_presence and len(v) == 1:
                vv = self._scalar_to_strength01(v[0])
                stream.presence_sum += vv
                stream.presence_count += 1
                stream.presence_avg = (
                    _clamp01(stream.presence_sum / stream.presence_count)
                    if stream.presence_count > 0
                    else vv
                )
        return True

    def update_caches_permanently(self):
        for c in self.stream_pool:
            try:
                c.manager.update_caches_permanently()
            except Exception:
                # reference per-stream try/catch noop (...:1264-1276)
                pass
        self.pending_absolute_bases = None

    def stream_strengths_report(self) -> dict[int, dict]:
        return {
            c.id: {
                "active": c.id in self.active_ids,
                "presence_avg": c.presence_avg,
                "presence_count": c.presence_count,
                "last_value": list(c.last_value),
            }
            for c in self.stream_pool
        }
