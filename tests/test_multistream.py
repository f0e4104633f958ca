"""Multi-stream primitives: set distance, targets, strengths, mapping."""

import pytest

from tsc_spark.kernel.multistream import (
    INACTIVE_STRENGTH_DECAY,
    StreamStrengths,
    generate_centered_targets,
    map_streams_to_candidates,
    set_distance01,
)


class TestSetDistance01:
    def test_empty_rules(self):
        assert set_distance01([], [], width=10, max_count=4) == 0.0
        assert set_distance01([], [5.0], width=10, max_count=4) == 1.0
        assert set_distance01([5.0], [], width=10, max_count=4) == 1.0

    def test_identical_sets(self):
        assert set_distance01([60, 64, 67], [60, 64, 67], width=12, max_count=4) == 0.0

    def test_symmetric_min_average(self):
        # a={0}, b={4}: both directions min-dist 4 -> pitch 4/width
        assert set_distance01([0.0], [4.0], width=8, max_count=4) == pytest.approx(0.5)
        # symmetric
        assert set_distance01([4.0], [0.0], width=8, max_count=4) == pytest.approx(0.5)

    def test_count_penalty_blend_only_when_sizes_differ(self):
        # same sizes: pure pitch term
        same = set_distance01([0.0, 2.0], [0.0, 2.0], width=4, max_count=4)
        assert same == 0.0
        # sizes differ: (pitch + count)/2
        d = set_distance01([0.0], [0.0, 2.0], width=4, max_count=4)
        # pitch: a_avg=0 (0->0), b_avg=(0+2)/2=1 -> pitch=(0+1)/2=0.5 -> /4=0.125
        # count: |1-2|/4 = 0.25 -> blended (0.125+0.25)/2 = 0.1875
        assert d == pytest.approx(0.1875)

    def test_width_guard(self):
        # non-positive width treated as 1.0
        assert set_distance01([0.0], [0.5], width=0, max_count=4) == pytest.approx(0.5)

    def test_clamped_to_unit(self):
        assert set_distance01([0.0], [100.0], width=1, max_count=1) == 1.0


class TestCenteredTargets:
    def test_degenerate(self):
        assert generate_centered_targets(0.5, 0.2, n=0) == []
        assert generate_centered_targets(1.7, 0.2, n=1) == [1.0]

    def test_linspace_inclusive(self):
        got = generate_centered_targets(0.5, 0.4, n=5)
        assert got == pytest.approx([0.3, 0.4, 0.5, 0.6, 0.7])

    def test_endpoint_clamping_before_interpolation(self):
        # reference clamps start/end BEFORE interpolating: center 0.1,
        # spread 0.4 -> start=clamp(-0.1)=0.0, end=0.3; linspace(0, 0.3)
        got = generate_centered_targets(0.1, 0.4, n=4)
        assert got == pytest.approx([0.0, 0.1, 0.2, 0.3])


class TestStreamStrengths:
    def test_running_mean_and_clamp(self):
        st = StreamStrengths()
        st.update(1, 0.5)
        st.update(1, 1.5)  # clamped to 1.0 on entry
        assert st.strength(1) == pytest.approx(0.75)
        assert st.strength(99) == 0.0

    def test_inactive_decay(self):
        st = StreamStrengths()
        st.update(1, 1.0)
        st.update(2, 1.0)
        st.decay_inactive([2])
        assert st.strength(1) == 1.0
        assert st.strength(2) == pytest.approx(INACTIVE_STRENGTH_DECAY)
        st.decay_inactive([2])
        assert st.strength(2) == pytest.approx(INACTIVE_STRENGTH_DECAY ** 2)

    def test_sorted_by_strength(self):
        st = StreamStrengths()
        st.update(1, 0.2)
        st.update(2, 0.9)
        st.update(3, 0.5)
        assert st.sorted_by_strength() == [2, 3, 1]
        assert st.sorted_by_strength(ascending=True) == [1, 3, 2]


class TestMapping:
    def test_prefers_low_cost_diagonal(self):
        dist = [[0.0, 1.0], [1.0, 0.0]]
        comp = [[0.0, 1.0], [1.0, 0.0]]
        assert map_streams_to_candidates(dist, comp) == [0, 1]

    def test_cross_assignment_when_cheaper(self):
        dist = [[1.0, 0.0], [0.0, 1.0]]
        comp = [[1.0, 0.0], [0.0, 1.0]]
        assert map_streams_to_candidates(dist, comp) == [1, 0]

    def test_deterministic_on_ties(self):
        dist = [[0.5] * 3 for _ in range(3)]
        comp = [[0.5] * 3 for _ in range(3)]
        first = map_streams_to_candidates(dist, comp)
        for _ in range(5):
            assert map_streams_to_candidates(dist, comp) == first
