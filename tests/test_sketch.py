"""Deterministic sketches: KMV estimate accuracy + stable sampling."""

from pyspark.sql import functions as F

from tsc_spark.operators.sketch import kmv_distinct, stable_sample


def test_kmv_estimate_within_error_bound(spark):
    # 5000 distinct values in one group; KMV k=64 has ~1/sqrt(k-1) ≈ 12.6%
    # relative standard error — assert within 4 sigma
    df = spark.range(5000).select(
        F.lit("g").alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    row = kmv_distinct(df, "grp", "v", k=64).collect()[0]
    assert row.n_in_sketch == 64
    assert abs(row.distinct_estimate - 5000) / 5000 < 0.5

def test_kmv_exact_below_k(spark):
    df = spark.range(40).select(
        F.lit("g").alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    row = kmv_distinct(df, "grp", "v", k=64).collect()[0]
    assert row.n_in_sketch == 40
    assert row.distinct_estimate == 40.0

def test_stable_sample_is_stable_and_near_fraction(spark):
    df = spark.range(2000).select(F.col("id").cast("string").alias("doc_id"))
    a = sorted(r.doc_id for r in stable_sample(df, "doc_id", 0.2).collect())
    b = sorted(r.doc_id for r in stable_sample(df.repartition(7), "doc_id", 0.2).collect())
    assert a == b  # identical under repartitioning
    assert 0.15 < len(a) / 2000 < 0.25
