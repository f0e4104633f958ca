"""Stream-source caching must never weaken the streaming-evidence gates.

`__spark_entry__._stream_src` reuses the at-rest file-stream SOURCE
parquet across invocations but checkpoints/sinks stay fresh per call.
The failure this guards against: accidentally caching the CHECKPOINT
would make a second invocation drain zero micro-batches and return an
empty (or stale) table that a rows-only check might still wave through.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_events_streamed_repeat_invocation_identical(spark):
    import __spark_entry__ as m

    q = m.queries()["events_hourly_streamed"]
    first = _sorted_rows(q(spark, SF_DIR))
    assert first, "streamed aggregation returned no rows"
    again = _sorted_rows(q(spark, SF_DIR))
    assert first == again

    # the source dir was reused, not rebuilt, and its build-time
    # (name, size) snapshot is intact
    key = (os.path.abspath(SF_DIR), "events4")
    assert key in m._STREAM_SRC_CACHE
    src, files = m._STREAM_SRC_CACHE[key]
    assert "_SUCCESS" in {name for name, _ in files}
    assert all(
        os.path.getsize(os.path.join(src, name)) == size
        for name, size in files
    )


def test_rollup_streamed_repeat_invocation_identical(spark):
    import __spark_entry__ as m

    q = m.queries()["rollup_tier1_streamed"]
    first = _sorted_rows(q(spark, SF_DIR))
    assert first, "streamed rollup returned no rows"
    assert first == _sorted_rows(q(spark, SF_DIR))


def test_stream_src_rebuilds_after_dir_removal(spark):
    """A deleted cache dir (tmp reaper, test isolation) regenerates."""
    import shutil

    import __spark_entry__ as m

    q = m.queries()["events_hourly_streamed"]
    baseline = _sorted_rows(q(spark, SF_DIR))
    key = (os.path.abspath(SF_DIR), "events4")
    src, files = m._STREAM_SRC_CACHE[key]
    shutil.rmtree(src, ignore_errors=True)
    assert baseline == _sorted_rows(q(spark, SF_DIR))


def test_stream_src_rebuilds_after_partial_file_loss(spark):
    """One deleted part file (tmp reaper) must trigger a rebuild, not a
    silently truncated stream with fewer micro-batches."""
    import __spark_entry__ as m

    q = m.queries()["events_hourly_streamed"]
    baseline = _sorted_rows(q(spark, SF_DIR))
    key = (os.path.abspath(SF_DIR), "events4")
    src, files = m._STREAM_SRC_CACHE[key]
    part = next(name for name, _ in files if name.endswith(".parquet"))
    os.remove(os.path.join(src, part))
    assert baseline == _sorted_rows(q(spark, SF_DIR))
    new_src, _ = m._STREAM_SRC_CACHE[key]
    assert new_src != src


def test_stream_src_rebuilds_after_truncation(spark):
    """A TRUNCATED part file (same name, fewer bytes — the reaper threat
    bare-existence validation waves through) must trigger a rebuild."""
    import __spark_entry__ as m

    q = m.queries()["events_hourly_streamed"]
    baseline = _sorted_rows(q(spark, SF_DIR))
    key = (os.path.abspath(SF_DIR), "events4")
    src, files = m._STREAM_SRC_CACHE[key]
    part = next(name for name, _ in files if name.endswith(".parquet"))
    with open(os.path.join(src, part), "w") as fh:
        fh.write("")
    assert baseline == _sorted_rows(q(spark, SF_DIR))
    new_src, _ = m._STREAM_SRC_CACHE[key]
    assert new_src != src
