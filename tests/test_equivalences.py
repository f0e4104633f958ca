"""Cross-implementation equivalence properties.

Two independent implementations of the same operator must agree exactly;
hypothesis drives the series shapes.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

token_series = st.lists(st.integers(min_value=-50, max_value=50), max_size=40)


@settings(max_examples=30, deadline=None)
@given(token_series)
def test_poly_singleton_equivalence_property(toks):
    """Random series: set-mode manager on singletons == scalar kernel."""
    from tsc_spark.kernel.manager import ClusterManager
    from tsc_spark.kernel.polymanager import PolyClusterManager

    sm = ClusterManager(
        [float(v) for v in toks], 0.3, 2, True,
        scale_mode="contextual_global_halves", contextual_min_width=1.0,
    )
    sm.process_data()
    pm = PolyClusterManager(
        [[float(v)] for v in toks], 0.3, 2, True,
        scale_mode="contextual_global_halves", contextual_min_width=1.0,
    )
    pm.process_data()
    assert pm.timeline() == sm.timeline()


class TestRollupPathEquivalence:
    """The three tier-rollup implementations (HOF array path, numpy
    reduceat path, explode+groupBy) emit identical rows."""

    @pytest.fixture(scope="class")
    def toks(self, spark):
        from tsc_spark.sources.synth import synth_tokens_table

        df = synth_tokens_table(spark, n_docs=40, include_edges=True)
        df.cache().count()
        return df

    @pytest.mark.parametrize("stride,tier", [(8, 1), (64, 2), (5, 9)])
    def test_three_paths_agree(self, spark, toks, stride, tier):
        from tsc_spark.operators.rollup import (
            explode_points,
            rollup_arrays,
            rollup_arrays_np,
            rollup_points,
        )

        cols = ["doc_id", "window_idx", "agg_count", "agg_min", "agg_max", "agg_sum", "tier"]

        def rows(df):
            return sorted(
                tuple(r) for r in df.select(*cols).collect()
            )

        hof = rows(rollup_arrays(toks, stride, tier))
        npp = rows(rollup_arrays_np(toks, stride, tier))
        grp = rows(rollup_points(explode_points(toks), stride, tier))
        assert hof == npp == grp
        assert len(hof) > 0
