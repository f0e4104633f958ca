"""Multimodal column plumbing: schema, mapInPandas batching, stub gate."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media_df(spark):
    from tsc_spark.operators.multimodal import synth_media_table

    df = synth_media_table(spark, n_docs=30, per_doc=2)
    df.cache().count()
    return df


def test_media_schema_and_counts(media_df):
    assert dict(media_df.dtypes)["payload"] == "binary"
    assert media_df.count() == 60
    kinds = {r["kind"] for r in media_df.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_media_stats_never_reads_payload_content(media_df):
    from tsc_spark.operators.multimodal import media_stats

    rows = {r["kind"]: r for r in media_stats(media_df).collect()}
    assert rows["image"]["n_media"] == 20
    assert rows["image"]["total_bytes"] > 0
    assert rows["audio"]["max_width"] == 0
    assert rows["video"]["total_duration_ms"] > 0


def test_extract_features_requires_explicit_decoder(media_df):
    from pyspark.errors.exceptions.captured import PythonException
    from tsc_spark.operators.multimodal import extract_image_features

    with pytest.raises(PythonException, match="NotImplementedError"):
        extract_image_features(media_df).collect()


def test_extract_features_deterministic_fake(media_df):
    from tsc_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_image_features,
        fake_image_decode,
    )

    out = extract_image_features(media_df, decode_fn=fake_image_decode)
    rows = out.orderBy("media_id").collect()
    assert len(rows) == 20  # image rows only
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    # deterministic across runs and equal to a driver-side recomputation
    r0 = rows[0]
    src = media_df.filter(F.col("media_id") == r0["media_id"]).collect()[0]
    img = fake_image_decode(bytes(src["payload"]), src["width"], src["height"])
    assert r0["features"][0] == pytest.approx(float(img.mean()))
    assert r0["features"][3] == float(img.max())


def test_video_frame_sampling_is_metadata_only(media_df):
    from tsc_spark.operators.multimodal import sample_video_frames

    frames = sample_video_frames(media_df, every_ms=5000)
    pdf = frames.toPandas()
    assert (pdf["frame_ms"] % 5000 == 0).all()
    # every video row emits >= 1 frame (ts 0 always sampled)
    n_videos = media_df.filter(F.col("kind") == "video").count()
    assert pdf["media_id"].nunique() == n_videos
    # plan stays native: no python UDF / mapInPandas in frame selection
    plan = frames._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


class TestQualityFilters:
    def test_repetition_stats_on_crafted_docs(self, spark):
        from tsc_spark.operators.text import repetition_stats

        docs = spark.createDataFrame(
            [
                ("r", "a b a b a b"),          # top bigram 'a b' = 3 of 5
                ("u", "one two three four"),   # all bigrams unique
                ("l", "x\nx\ny"),              # 1 duplicate line of 3
                ("s", "solo"),                 # no bigrams at all
            ],
            "doc_id string, text string",
        )
        out = {r.doc_id: r for r in repetition_stats(docs).collect()}
        assert out["r"].top_bigram_frac == 0.6
        assert out["u"].top_bigram_frac == round(1 / 3, 6)
        assert out["l"].dup_line_frac == round(1 / 3, 6)
        assert out["l"].n_lines == 3
        assert out["s"].top_bigram_frac == 0.0

    def test_repetition_stats_matches_bruteforce_on_random_docs(self, spark):
        """The zero-shuffle sorted-run fold must equal a plain Python
        Counter histogram (the relational formulation it replaced) on
        randomized docs, including repetition-heavy ones."""
        import random

        from tsc_spark.operators.text import repetition_stats

        rng = random.Random(41)
        vocab = ["a", "b", "c", "dd", "e"]
        rows = []
        for i in range(60):
            n = rng.randint(0, 30)
            words = [rng.choice(vocab) for _ in range(n)]
            if rng.random() < 0.3 and n >= 4:  # inject heavy repetition
                words = words[:2] * (n // 2)
            rows.append((str(i), " ".join(words)))
        docs = spark.createDataFrame(rows, "doc_id string, text string")
        got = {r.doc_id: r.top_bigram_frac for r in repetition_stats(docs).collect()}

        from collections import Counter

        for doc_id, text in rows:
            words = text.split(" ")
            bigrams = [
                " ".join(words[i : i + 2]) for i in range(len(words) - 1)
            ] if len(words) >= 2 else []
            want = (
                round(max(Counter(bigrams).values()) / len(bigrams), 6)
                if bigrams
                else 0.0
            )
            assert got[doc_id] == want, doc_id

    def test_pii_stats_counts_urls_and_emails(self, spark):
        from tsc_spark.operators.text import pii_stats

        docs = spark.createDataFrame(
            [
                ("a", "see https://x.example/a and http://y.example plus bob@example.com"),
                ("b", "no contact info here"),
            ],
            "doc_id string, text string",
        )
        out = {r.doc_id: (r.url_count, r.email_count) for r in pii_stats(docs).collect()}
        assert out == {"a": (2, 1), "b": (0, 0)}
