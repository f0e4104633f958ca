"""Set-mode cluster manager: singleton equivalence with the scalar
kernel (exact) + genuine set/chord behaviors."""

import pytest

from tsc_spark.kernel.manager import ClusterManager
from tsc_spark.kernel.polymanager import PolyClusterManager
from tsc_spark.kernel.polyset import min_avg_distance
from tsc_spark.sources.synth import synth_tokens


def _scalar_mgr(tokens, **kw):
    m = ClusterManager(
        [float(v) for v in tokens],
        kw.get("mtr", 0.3),
        2,
        True,
        scale_mode="contextual_global_halves",
        contextual_min_width=1.0,
    )
    m.process_data()
    return m


def _poly_mgr(sets, **kw):
    m = PolyClusterManager(
        sets,
        kw.get("mtr", 0.3),
        2,
        True,
        scale_mode="contextual_global_halves",
        contextual_min_width=1.0,
        max_set_size=kw.get("max_set_size", 4),
        point_distance_mode=kw.get("mode", "set"),
        point_axis_ranges=kw.get("axes", ()),
    )
    m.process_data()
    return m


class TestSingletonEquivalence:
    """Singleton sets through the set-mode manager must reproduce the
    scalar kernel exactly — timelines AND representative floats."""

    @pytest.mark.parametrize("mtr", [0.02, 0.1, 0.3, 0.8])
    def test_warmup_series(self, mtr):
        toks = [0, 1, 3, 2, 4, 5, 3, 1]
        sm = _scalar_mgr(toks, mtr=mtr)
        pm = _poly_mgr([[float(v)] for v in toks], mtr=mtr)
        assert pm.timeline() == sm.timeline()

    def test_synth_corpus_docs(self):
        rows = synth_tokens(24, include_edges=True)
        for doc_id, toks, _src in rows:
            if not toks:
                continue
            sm = _scalar_mgr(toks)
            pm = _poly_mgr([[float(v)] for v in toks])
            assert pm.timeline() == sm.timeline(), doc_id

    def test_rep_floats_bit_equal(self):
        toks = [0, 1, 3, 2, 4, 5, 3, 1, 0, 1, 3, 2]
        sm = _scalar_mgr(toks)
        pm = _poly_mgr([[float(v)] for v in toks])
        s_tree = {tuple(p): rep for p, _si, rep in sm.tree()}
        p_tree = {tuple(p): [s[0] for s in rep] for p, _si, rep in pm.tree()}
        assert set(s_tree) == set(p_tree)
        for path, rep in s_tree.items():
            assert p_tree[path] == rep  # exact float equality

    def test_incremental_append_equivalence(self):
        toks = [0, 1, 3, 2, 4]
        sm = _scalar_mgr(toks + [5, 3])
        pm = _poly_mgr([[float(v)] for v in toks])
        pm.add_data_point([5.0])
        pm.add_data_point([3.0])
        assert pm.timeline() == sm.timeline()


class TestChordBehavior:
    def test_identical_chord_motifs_cluster(self):
        # repeated 2-chord motif: windows at starts 0/2/4 are identical
        motif = [[60.0, 64.0], [62.0, 65.0]]
        data = motif * 4
        pm = _poly_mgr(data, mtr=0.3)
        tl = pm.timeline()
        ws2 = [row for row in tl if row[0] == 2]
        big = max(ws2, key=lambda r: len(r[2]))
        assert len(big[2]) >= 3  # the repeated motif grouped together

    def test_chord_order_within_set_is_irrelevant(self):
        a = [[60.0, 64.0], [62.0, 65.0]] * 3
        b = [[64.0, 60.0], [65.0, 62.0]] * 3
        assert _poly_mgr(a).timeline() == _poly_mgr(b).timeline()

    def test_set_size_changes_split_clusters(self):
        # alternating chord sizes: count penalty pushes distance up
        data = [[60.0], [60.0, 64.0]] * 4
        pm = _poly_mgr(data, mtr=0.05)
        # no ws-2 cluster should mix the (1,2)-size windows with
        # (2,1)-size windows when the threshold is tight
        d = min_avg_distance([60.0], [60.0, 64.0], pm.value_width, 4)
        assert d > 0.05

    def test_ordered_vector_mode_note_vol(self):
        # (note, vol) points; identical after vol-axis normalization
        data = [[60.0, 0.5], [62.0, 0.5], [60.0, 0.5], [62.0, 0.5]]
        pm = _poly_mgr(data, mode="ordered_vector", axes=(127.0, 1.0), mtr=0.1)
        tl = pm.timeline()
        ws2 = [row for row in tl if row[0] == 2]
        big = max(ws2, key=lambda r: len(r[2]))
        assert len(big[2]) >= 2

    def test_simulate_rollback_restores_state(self):
        data = [[60.0, 64.0], [62.0], [60.0, 64.0], [62.0]]
        pm = _poly_mgr(data)
        before_tl = pm.timeline()
        before_n = pm.n
        pm.simulate_add_and_calculate_all([63.0, 67.0])
        assert pm.n == before_n
        assert pm.timeline() == before_tl
