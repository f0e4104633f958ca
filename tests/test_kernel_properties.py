"""Hypothesis property tests for the pure kernel math.

The hand-computed parity vectors (test_polyset/test_kernel_docs_examples)
pin exact reference values at a handful of points; these pin the
*algebraic invariants* — symmetry, range, identity, order preservation,
octave invariance — across thousands of generated inputs, the class of
bug a finite golden set can miss.  All properties below are EXACT in
IEEE arithmetic for the generated inputs (integers / exact negations),
so every assert is `==`-strength, not approx.

Pure Python — no SparkSession needed.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from tsc_spark.kernel.polyset import (
    min_avg_distance,
    ordered_vector_distance01,
    simple_squared_euclidean,
)
from tsc_spark.kernel.scoring import (
    combine_complexity_metric_scores,
    normalize_scores,
)

# integer-valued floats: products/sums/differences below stay exact
ivals = st.integers(min_value=-1000, max_value=1000).map(float)
sets_ = st.lists(ivals, min_size=0, max_size=8)
vecs = st.lists(ivals, min_size=0, max_size=8)
widths = st.integers(min_value=1, max_value=100).map(float)


# --- min_avg_distance -------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(sets_, sets_, widths, st.integers(min_value=1, max_value=10))
def test_min_avg_distance_symmetric_and_bounded(a, b, w, m):
    d = min_avg_distance(a, b, w, m)
    assert d == min_avg_distance(b, a, w, m)
    assert 0.0 <= d <= 1.0


@settings(max_examples=100, deadline=None)
@given(st.lists(ivals, min_size=1, max_size=8), widths,
       st.integers(min_value=1, max_value=10))
def test_min_avg_distance_identity_and_empty(a, w, m):
    assert min_avg_distance(a, a, w, m) == 0.0
    assert min_avg_distance(a, [], w, m) == 1.0
    assert min_avg_distance([], a, w, m) == 1.0
    assert min_avg_distance([], [], w, m) == 0.0


@settings(max_examples=200, deadline=None)
@given(sets_, sets_, widths, st.integers(min_value=1, max_value=10),
       st.integers(min_value=-500, max_value=500))
def test_min_avg_distance_translation_invariant(a, b, w, m, c):
    """|x−y| is unchanged by a common shift; integer inputs keep the
    float arithmetic exact, so the distances are bit-equal."""
    shifted = min_avg_distance([x + c for x in a], [y + c for y in b], w, m)
    assert shifted == min_avg_distance(a, b, w, m)


# --- ordered_vector_distance01 ---------------------------------------


@settings(max_examples=200, deadline=None)
@given(vecs, vecs, st.lists(widths, min_size=0, max_size=8), widths)
def test_ordered_vector_distance_symmetric_bounded_identity(a, b, rng, w):
    d = ordered_vector_distance01(a, b, rng, w)
    # (av−bv)² == (bv−av)² exactly (IEEE negation is exact)
    assert d == ordered_vector_distance01(b, a, rng, w)
    assert 0.0 <= d <= 1.0
    assert ordered_vector_distance01(a, a, rng, w) == 0.0


# --- simple_squared_euclidean ----------------------------------------


@settings(max_examples=200, deadline=None)
@given(vecs, vecs, widths)
def test_simple_squared_euclidean_symmetric_nonneg_identity(a, b, w):
    s = simple_squared_euclidean(a, b, w)
    assert s == simple_squared_euclidean(b, a, w)
    assert s >= 0.0
    assert simple_squared_euclidean(a, a, w) == 0.0


@settings(max_examples=100, deadline=None)
@given(st.lists(ivals, min_size=0, max_size=8),
       st.lists(ivals, min_size=1, max_size=4), widths)
def test_simple_squared_euclidean_length_penalty_exact(a, tail, w):
    """Appending a tail to one side adds exactly |Δlen|·w² on top of the
    shared-prefix distance (reference ...:455-467 penalty shape)."""
    assert simple_squared_euclidean(a, a + tail, w) == len(tail) * (w ** 2)


# --- normalize_scores -------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(ivals, min_size=1, max_size=12), st.booleans())
def test_normalize_scores_range_and_weight(raw, flag):
    scores, weight = normalize_scores(raw, flag)
    assert len(scores) == len(raw)
    uniq = len(set(raw))
    assert weight == (0.0 if uniq <= 1 else (0.2 if uniq == 2 else 1.0))
    for s in scores:
        assert 0.0 <= s <= weight or (weight == 0.0 and s == 0.0)


@settings(max_examples=200, deadline=None)
@given(st.lists(ivals, min_size=2, max_size=12), st.booleans())
def test_normalize_scores_preserves_order(raw, flag):
    """Min-max normalization is monotone; the flip reverses it.  Equal
    raws always map to equal scores."""
    scores, _ = normalize_scores(raw, flag)
    for i in range(len(raw)):
        for j in range(len(raw)):
            if raw[i] == raw[j]:
                assert scores[i] == scores[j]
            elif raw[i] < raw[j]:
                assert (scores[i] <= scores[j]) == flag or scores[i] == scores[j]


@settings(max_examples=150, deadline=None)
@given(st.lists(ivals, min_size=1, max_size=10),
       st.integers(min_value=-300, max_value=300),
       st.integers(min_value=1, max_value=50), st.booleans())
def test_normalize_scores_affine_invariant(raw, c, k, flag):
    """normalize(k·x + c) == normalize(x) bit-for-bit on integer input:
    the integer products/sums are exact and IEEE division is correctly
    rounded, so (k·a)/(k·b) rounds to the same double as a/b."""
    transformed = [k * v + c for v in raw]
    assert normalize_scores(transformed, flag) == normalize_scores(raw, flag)


# --- combine_complexity_metric_scores --------------------------------


@settings(max_examples=150, deadline=None)
@given(st.lists(ivals, min_size=1, max_size=8),
       st.lists(ivals, min_size=1, max_size=8),
       st.lists(ivals, min_size=1, max_size=8),
       st.lists(ivals, min_size=1, max_size=8))
def test_combine_scores_bounded(d, q, c, u):
    out = combine_complexity_metric_scores(d, q, c, u)
    assert len(out) == max(len(d), len(q), len(c), len(u))
    for v in out:
        assert 0.0 <= v <= 1.0
        assert math.isfinite(v)


# --- note/vol octave math --------------------------------------------

notes = st.integers(min_value=0, max_value=127).map(float)
points = st.lists(
    st.tuples(notes, st.integers(min_value=0, max_value=127).map(float))
    .map(list),
    min_size=1,
    max_size=6,
)


@settings(max_examples=150, deadline=None)
@given(points, points, st.integers(min_value=-3, max_value=3))
def test_octave_window_distance_invariant_under_db_octave_shift(q, db, k):
    """Shifting the DB window by whole octaves must not change the
    octave-invariant distance: the center octave estimate compensates
    exactly (all note arithmetic is integer-valued, hence float-exact).

    EXCEPT at exact half-octave first-note gaps (gap ≡ 6 mod 12): there
    the center is a .5 value and round-half-even — the reference's own
    Julia round() semantics — picks the even neighbor, so an octave
    shift moves the candidate window {center−1, center, center+1}
    asymmetrically (round(−5.5) = −6 but round(−6.5) = −6 too).  That
    asymmetry is faithful reference behavior (hypothesis found it), so
    the half-boundary residue is excluded rather than 'fixed'."""
    from hypothesis import assume

    from tsc_spark.kernel.notevol import octave_invariant_window_distance01

    assume(int(q[0][0] - db[0][0]) % 12 != 6)
    ws = min(len(q), len(db))
    base = octave_invariant_window_distance01(q, db, 0, 0, ws)
    shifted_db = [[n + 12.0 * k, v] for n, v in db]
    assert octave_invariant_window_distance01(q, shifted_db, 0, 0, ws) == base


@settings(max_examples=150, deadline=None)
@given(points)
def test_normalize_note_vol_lands_first_note_near_c4(pts):
    from tsc_spark.kernel.notevol import normalize_note_vol_points

    out = normalize_note_vol_points(pts)
    assert len(out) == len(pts)
    # whole-octave shift only, volumes untouched
    shift = out[0][0] - pts[0][0]
    assert shift % 12.0 == 0.0
    for (n0, v0), (n1, v1) in zip(pts, out):
        assert n1 - n0 == shift
        assert v1 == v0
    # nearest-octave: first note within a half octave of C4 (round-half-
    # even puts the exact 6.0 boundary on either side, so <= 6 both ways)
    assert abs(out[0][0] - 60.0) <= 6.0
