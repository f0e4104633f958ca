"""As-of join: inclusive at-or-before semantics, left-outer nulls,
latest-wins across multiple prior rows."""

from datetime import datetime

from tsc_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),   # after r2 -> 20.0
            (2, "u1", _ts("2024-01-01 09:00:00")),   # ties r1 exactly -> 10.0 (inclusive)
            (3, "u1", _ts("2024-01-01 08:00:00")),   # before everything -> NULL
            (4, "u2", _ts("2024-01-01 12:00:00")),   # other key -> 99.0
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:00:00"), 10.0),
            ("u1", _ts("2024-01-01 09:30:00"), 20.0),
            ("u2", _ts("2024-01-01 11:00:00"), 99.0),
        ],
        "user_id string, ts timestamp, v double",
    )
    out = {r.event_id: (r.v_asof, r.ts_asof) for r in
           asof_join(left, right, on="user_id", time_col="ts").collect()}
    assert out[1] == (20.0, _ts("2024-01-01 09:30:00"))
    assert out[2] == (10.0, _ts("2024-01-01 09:00:00"))
    assert out[3] == (None, None)
    assert out[4] == (99.0, _ts("2024-01-01 11:00:00"))


def test_asof_preserves_left_row_count(spark, tokens_df):
    ev = spark.createDataFrame(
        [(i, "k", _ts(f"2024-01-01 10:{i:02d}:00")) for i in range(30)],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", _ts("2024-01-01 10:10:00"), 1.0)],
        "user_id string, ts timestamp, v double",
    )
    out = asof_join(ev, right, on="user_id", time_col="ts")
    assert out.count() == 30
    matched = out.filter("v_asof IS NOT NULL").count()
    assert matched == 20  # rows at 10:10 and later


def test_range_join_matches_brute_force(spark):
    """Binned range join == the naive cross-filter on a crafted set,
    including pairs that straddle bucket boundaries."""
    import itertools

    from tsc_spark.operators.asof import range_join

    lrows = [(i, "k", _ts(f"2024-01-01 10:{i:02d}:{(i * 7) % 60:02d}")) for i in range(12)]
    rrows = [(100 + j, "k", _ts(f"2024-01-01 10:{j:02d}:{(j * 13) % 60:02d}")) for j in range(12)]
    left = spark.createDataFrame(lrows, "lid long, user_id string, ts timestamp")
    right = spark.createDataFrame(rrows, "rid long, user_id string, ts timestamp")

    got = sorted(
        (r.lid, r.rid_r)
        for r in range_join(left, right, on="user_id", time_col="ts",
                            tolerance_seconds=90).collect()
    )
    expected = sorted(
        (l[0], r[0])
        for l, r in itertools.product(lrows, rrows)
        if abs((l[2] - r[2]).total_seconds()) <= 90
    )
    assert got == expected
    assert len(got) > 0


def test_asof_join_matches_brute_force_random(spark):
    """Randomized series: the union+LOCF as-of join equals the naive
    per-row scan (inclusive at-or-before, latest wins)."""
    import random

    rng = random.Random(11)
    lrows, rrows = [], []
    for i in range(40):
        key = f"k{rng.randint(0, 2)}"
        lrows.append((i, key, _ts(f"2024-01-01 0{rng.randint(0, 9)}:{rng.randint(0, 59):02d}:00")))
    for j in range(25):
        key = f"k{rng.randint(0, 2)}"
        rrows.append((key, _ts(f"2024-01-01 0{rng.randint(0, 9)}:{rng.randint(0, 59):02d}:00"), float(j)))
    # unique (key, ts) on the right: keep max payload (deterministic)
    best = {}
    for k, t, v in rrows:
        best[(k, t)] = max(best.get((k, t), -1.0), v)
    rrows = [(k, t, v) for (k, t), v in best.items()]

    left = spark.createDataFrame(lrows, "lid long, user_id string, ts timestamp")
    right = spark.createDataFrame(rrows, "user_id string, ts timestamp, v double")
    got = {r.lid: r.v_asof for r in
           asof_join(left, right, on="user_id", time_col="ts").collect()}

    for lid, key, lt in lrows:
        prior = [(t, v) for k, t, v in rrows if k == key and t <= lt]
        expected = max(prior)[1] if prior else None
        assert got[lid] == expected, (lid, key, lt)


def test_asof_carries_whole_row_not_per_column_latest(spark):
    from pyspark.sql import functions as F

    """A matched right row with a NULL payload value must win as a row:
    the output never mixes columns from different right rows (DuckDB/kdb
    ASOF semantics)."""
    from tsc_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", "2024-01-01 00:00:30")], "k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:00:10", 5.0), ("k", "2024-01-01 00:00:20", None)],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = asof_join(left, right, on="k", time_col="ts").collect()[0]
    assert row.v_asof is None  # the t=20 row won; its v IS NULL
    assert str(row.ts_asof).endswith("00:00:20")


def test_asof_null_timestamps_never_match(spark):
    from pyspark.sql import functions as F

    from tsc_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", None), ("k", "2024-01-01 00:00:30")], "k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", None, 9.0), ("k", "2024-01-01 00:00:10", 1.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {r.ts: r for r in asof_join(left, right, on="k", time_col="ts").collect()}
    null_left = rows[None]
    assert null_left.v_asof is None and null_left.ts_asof is None
    matched = [r for ts, r in rows.items() if ts is not None][0]
    assert matched.v_asof == 1.0  # the NULL-ts right row never matches


def test_range_join_zero_tolerance_is_exact_match(spark):
    from pyspark.sql import functions as F

    from tsc_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [("k", "2024-01-01 00:00:10", 1), ("k", "2024-01-01 00:00:20", 2)],
        "k string, ts string, lid int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:00:10", 7.0)], "k string, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = range_join(left, right, on="k", time_col="ts", tolerance_seconds=0).collect()
    assert [(r.lid, r.v_r) for r in rows] == [(1, 7.0)]
    import pytest

    with pytest.raises(ValueError):
        range_join(left, right, on="k", time_col="ts", tolerance_seconds=-1)
