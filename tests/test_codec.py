"""Codec round-trip properties (FIXTURES.md §2.4): decode(encode(x)) == x
exactly, across adversarial patterns."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsc_spark.codecs import decode_dod, decode_gorilla, encode_dod, encode_gorilla
from tsc_spark.sources import synth_tokens

ADVERSARIAL_INT = [
    [],
    [0],
    [5],
    [-7],
    [3] * 16,
    list(range(100)),
    [0, 24] * 50,
    [2**31 - 1, -(2**31), 0, 1, -1],
    [1000000, -1000000] * 7,
]


@pytest.mark.parametrize("case", ADVERSARIAL_INT, ids=range(len(ADVERSARIAL_INT)))
def test_dod_roundtrip_adversarial(case):
    out = decode_dod(encode_dod(case))
    assert out.tolist() == case


def test_dod_roundtrip_synth_corpus():
    for doc_id, toks, _src in synth_tokens(64, include_edges=True):
        assert decode_dod(encode_dod(toks)).tolist() == toks, doc_id


def test_dod_compresses_constant_runs():
    toks = [7] * 1000
    assert len(encode_dod(toks)) < 1010  # ~1 byte/value worst, constant ≈ n bytes
    ramp = list(range(1000))
    assert len(encode_dod(ramp)) < 1010


@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=300))
@settings(max_examples=200, deadline=None)
def test_dod_roundtrip_property(xs):
    assert decode_dod(encode_dod(xs)).tolist() == xs


ADVERSARIAL_FLOAT = [
    [],
    [0.0],
    [1.5],
    [3.0] * 16,
    [0.1, 0.2, 0.3, 0.4],
    [1e-300, 1e300, -1e-300, -0.0, 0.0],
    list(np.linspace(0, 1, 77)),
    [float("inf"), float("-inf"), 1.0],
]


@pytest.mark.parametrize("case", ADVERSARIAL_FLOAT, ids=range(len(ADVERSARIAL_FLOAT)))
def test_gorilla_roundtrip_adversarial(case):
    out = decode_gorilla(encode_gorilla(case))
    np.testing.assert_array_equal(out, np.asarray(case, dtype=np.float64))


def test_gorilla_nan_bits_preserved():
    x = np.array([np.nan, 1.0, np.nan])
    out = decode_gorilla(encode_gorilla(x))
    assert np.array_equal(x.view(np.uint64), out.view(np.uint64))


@given(
    st.lists(
        st.floats(allow_nan=False, width=64),
        max_size=200,
    )
)
@settings(max_examples=200, deadline=None)
def test_gorilla_roundtrip_property(xs):
    out = decode_gorilla(encode_gorilla(xs))
    np.testing.assert_array_equal(out, np.asarray(xs, dtype=np.float64))


def test_gorilla_compresses_constant():
    enc = encode_gorilla([42.0] * 1000)
    assert len(enc) < 4 + 8 + 1000 + 10  # control bytes only, no payload


def test_decode_rejects_unknown_codec_version(spark):
    import pytest
    from pyspark.sql import functions as F

    from tsc_spark.functions.codec_udfs import decode_tokens_table, encode_tokens_table

    df = spark.createDataFrame(
        [("d1", [1, 2, 3], 3, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    enc = encode_tokens_table(df)
    # the stamped version decodes fine — run BEFORE the failure-injection
    # query: cancelling that stage kills the reused Python workers, and the
    # next Arrow job can transiently hit ClosedChannelException while the
    # worker pool respawns (observed as a rare flake when this assert ran
    # after the pytest.raises block)
    assert decode_tokens_table(enc).collect()[0].tokens == [1, 2, 3]
    bad = enc.withColumn("codec_version", F.lit(99))
    with pytest.raises(Exception, match="unsupported codec_version"):
        decode_tokens_table(bad).collect()
    # revive the shared session's Python worker pool for subsequent tests;
    # retries absorb the post-cancellation respawn race
    for attempt in range(3):
        try:
            decode_tokens_table(enc).count()
            break
        except Exception:
            if attempt == 2:
                raise


def test_gorilla_format_is_endian_pinned():
    """Header little-endian, payload MSB-first — byte-identical to the
    previous native encoding on little-endian hosts, and decodable
    regardless of host byte order."""
    import numpy as np

    from tsc_spark.codecs.gorilla import decode_gorilla, encode_gorilla

    vals = [1.5, -2.25, 1.5, 0.0, 3.141592653589793]
    blob = encode_gorilla(vals)
    assert np.frombuffer(blob[:4], dtype="<u4")[0] == 5
    assert np.frombuffer(blob[4:12], dtype="<u8")[0] == np.array(
        [1.5], dtype=np.float64
    ).view("<u8")[0]
    assert decode_gorilla(blob).tolist() == vals
