"""Oracle-kernel validation against the reference's published numeric
examples (docs/analyse.md, docs/generate.md, config/warmup_actions.json).

These pin the kernel to the reference semantics without running Julia.
"""

import math

import numpy as np
import pytest

from tsc_spark.kernel import (
    ClusterManager,
    analyse_tokens,
    generate_tokens,
    normalize_scores,
)
from tsc_spark.kernel.manager import seq_sum


def _mk(data, mtr=0.3, scale_mode="range_fixed", **kw):
    return ClusterManager(data, mtr, 2, True, scale_mode=scale_mode, **kw)


class TestDistances:
    """docs/analyse.md:149-180 worked example (width=10, mtr=0.30)."""

    def test_merge_accept_ratio_010(self):
        mgr = _mk([60.0, 62.0], range_min=0, range_max=10)
        mgr.value_width = 10.0
        rep = np.array([60.0, 62.0])
        win = np.array([61.0, 63.0])
        d = mgr.euclidean_distance(rep, win)
        assert d == pytest.approx(0.1414, abs=1e-4)
        ratio = d / math.sqrt(2.0)
        assert ratio == pytest.approx(0.10, abs=1e-4)
        assert ratio <= 0.30

    def test_merge_reject_ratio_080(self):
        mgr = _mk([60.0, 62.0])
        mgr.value_width = 10.0
        rep = np.array([60.0, 62.0])
        win = np.array([68.0, 70.0])
        d = mgr.euclidean_distance(rep, win)
        assert d == pytest.approx(1.1314, abs=1e-4)
        ratio = d / math.sqrt(2.0)
        assert ratio == pytest.approx(0.80, abs=1e-4)
        assert ratio > 0.30

    def test_step_distance_clamped(self):
        mgr = _mk([0.0, 1.0])
        mgr.value_width = 1.0
        d = mgr.euclidean_distance(np.array([0.0]), np.array([5.0]))
        assert d == 1.0  # clamped per-step

    def test_empty_rep_distance(self):
        mgr = _mk([5.0])  # len < min_window → empty seed rep
        assert mgr.clusters[0].rep is None
        assert mgr.euclidean_distance(None, np.array([1.0, 2.0])) == math.sqrt(2.0)


class TestValidInvalidSplit:
    """docs/analyse.md:235-264: parent si=[0,2,4], ratios {0:0.22, 2:0.47},
    mtr=0.30 → children si=[0,4] and si=[2]."""

    def test_split(self):
        # Construct data where, at new_length=3 with value_width=10:
        #   window@0=[10,10,10]   vs latest@4=[12.2]*3: ratio ≈ 0.22 → valid
        #   window@2=[10,20,12.2] vs latest@4:          ratio ≈ 0.47 → invalid
        data = [10.0, 10.0, 10.0, 20.0, 12.2, 12.2, 12.2]
        mgr = _mk(data, mtr=0.30)
        mgr.value_width = 10.0
        parent = mgr.clusters[0]
        parent.si = [0, 2, 4]
        latest = mgr._window(4, 3)
        d0 = mgr.euclidean_distance(mgr._window(0, 3), latest)
        assert d0 / math.sqrt(3) == pytest.approx(0.22, abs=1e-9)
        d2 = mgr.euclidean_distance(mgr._window(2, 3), latest)
        assert d2 / math.sqrt(3) == pytest.approx(0.468, abs=1e-3)
        mgr._process_new(parent, [0, 2], latest, math.sqrt(3.0), 4, 3, [0])
        # valid cluster si=[0,4] then invalid singleton si=[2]
        children = parent.cc
        ids = sorted(children)
        assert children[ids[0]].si == [0, 4]
        assert children[ids[1]].si == [2]
        # valid cluster queued for extension
        assert [(k, l) for k, l, _n in mgr.tasks] == [([0, ids[0]], 3)]
        assert mgr.tasks[0][2] is children[ids[0]]


class TestRecencyWeights:
    """docs/generate.md:210-231 recency weight table."""

    def test_r_half_span8(self):
        mgr = _mk([0.0, 1.0], recency=0.5)
        # smoothstep(0.5)=0.5 → span = 64^(1-0.5) = 8
        assert mgr._recency_weight(10, 10) == pytest.approx(1.0)
        assert mgr._recency_weight(8, 0) == pytest.approx(0.6839, abs=1e-4)
        assert mgr._recency_weight(16, 0) == pytest.approx(0.5677, abs=1e-4)

    def test_r_one_span1(self):
        mgr = _mk([0.0, 1.0], recency=1.0)
        assert mgr._recency_weight(1, 0) == pytest.approx(0.3679, abs=1e-4)

    def test_r_zero_weight_one(self):
        mgr = _mk([0.0, 1.0], recency=0.0)
        assert mgr._recency_weight(100, 0) == 1.0


class TestNormalizeScores:
    """docs/generate.md:134-166."""

    def test_example_vector(self):
        scores, w = normalize_scores([10.0, 10.0, 20.0, 30.0, 30.0], True)
        assert w == 1.0
        assert scores == pytest.approx([0.0, 0.0, 0.5, 1.0, 1.0])

    def test_reliability_weights(self):
        assert normalize_scores([5.0, 5.0], True)[1] == 0.0
        assert normalize_scores([5.0, 7.0], True)[1] == 0.2
        assert normalize_scores([5.0, 7.0, 9.0], True)[1] == 1.0

    def test_direction_flip(self):
        scores, _ = normalize_scores([0.0, 1.0], False)
        assert scores == pytest.approx([0.2, 0.0])


class TestAnalyseWarmup:
    """Reference warmup payload [0,1,3,2,4,5,3,1] (config/warmup_actions.json:7-12)."""

    def test_timeline_structure(self):
        mgr = analyse_tokens([0, 1, 3, 2, 4, 5, 3, 1], merge_threshold_ratio=0.02)
        tl = mgr.timeline()
        # every start index 0..6 appears exactly once at window 2
        ws2 = [r for r in tl if r[0] == 2]
        starts = sorted(i for _, _, inds in ws2 for i in inds)
        assert starts == list(range(7))
        # all rows have non-empty sorted indices
        for ws, cid, inds in tl:
            assert inds == sorted(inds)
            assert len(inds) >= 1
            assert ws >= 2

    def test_docs_example_series(self):
        # docs/analyse.md example input [60,62,64,65,67]
        mgr = analyse_tokens([60, 62, 64, 65, 67], merge_threshold_ratio=0.3)
        tl = mgr.timeline()
        ws2 = [r for r in tl if r[0] == 2]
        starts = sorted(i for _, _, inds in ws2 for i in inds)
        assert starts == [0, 1, 2, 3]

    def test_deterministic(self):
        a = analyse_tokens([0, 1, 3, 2, 4, 5, 3, 1], 0.02).timeline()
        b = analyse_tokens([0, 1, 3, 2, 4, 5, 3, 1], 0.02).timeline()
        assert a == b


class TestContextualWidth:
    def test_halves_width(self):
        # data [0,0,10,10]: mean=5, lower=0, upper=10 → width 10
        mgr = ClusterManager(
            [0.0, 0.0, 10.0, 10.0], 0.3, 2, True, scale_mode="contextual_global_halves"
        )
        mgr._update_value_width(3)
        assert mgr.value_width == 10.0

    def test_min_width_clamp(self):
        mgr = ClusterManager(
            [3.0] * 16, 0.3, 2, True, scale_mode="contextual_global_halves",
            contextual_min_width=1.0,
        )
        mgr._update_value_width(15)
        assert mgr.value_width == 1.0  # degenerate delta clamped

    def test_equal_values_count_both_halves(self):
        # values equal to mean join both halves (<= and >=)
        mgr = ClusterManager(
            [2.0, 4.0, 6.0], 0.3, 2, True, scale_mode="contextual_global_halves"
        )
        mgr._update_value_width(2)
        # mean=4; lower=(2+4)/2=3, upper=(4+6)/2=5 → width 2
        assert mgr.value_width == 2.0


class TestSimulationRollback:
    def test_rollback_restores_exact_state(self):
        import pickle

        mgr = analyse_tokens([0, 1, 3, 2, 4, 5, 3, 1], 0.3)
        before = pickle.dumps(
            (
                mgr.data_view().tobytes(),
                mgr.timeline(),
                mgr.tree(),
                sorted((ws, sorted(s)) for ws, s in mgr.updated_dist.items()),
                sorted((ws, sorted(s)) for ws, s in mgr.updated_qty.items()),
                mgr.cluster_id_counter,
                mgr.tasks,
            )
        )
        mgr.simulate_add_and_calculate_all(7.0)
        after = pickle.dumps(
            (
                mgr.data_view().tobytes(),
                mgr.timeline(),
                mgr.tree(),
                sorted((ws, sorted(s)) for ws, s in mgr.updated_dist.items()),
                sorted((ws, sorted(s)) for ws, s in mgr.updated_qty.items()),
                mgr.cluster_id_counter,
                mgr.tasks,
            )
        )
        assert before == after

    def test_simulate_matches_commit(self):
        # simulating a candidate then committing it must produce the same
        # forest as committing directly
        base = generate_tokens([0, 1, 3], [0.2], merge_threshold_ratio=0.02, range_max=11)
        results, mgr = base
        assert len(results) == 4
        assert all(0 <= v <= 11 for v in results[3:])
        # regression pin: deterministic output
        again = generate_tokens([0, 1, 3], [0.2], merge_threshold_ratio=0.02, range_max=11)
        assert again[0] == results


class TestSeqSum:
    def test_sequential_order(self):
        x = np.array([1e16, 1.0, -1e16], dtype=np.float64)
        # left-to-right: (1e16 + 1) - 1e16 == 0.0 in float64
        assert seq_sum(x) == 0.0
        assert seq_sum(np.array([])) == 0.0
        assert seq_sum(np.array([2.5])) == 2.5
