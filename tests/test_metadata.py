"""Metadata sidecar scan (SURVEY S8): schema-pinned csv read,
deterministic dedup, broadcast attach."""

from pyspark.sql import functions as F

from tsc_spark.sources.metadata import attach_metadata, read_metadata_csv


def _write_csv(tmp_path, rows):
    p = tmp_path / "metadata.csv"
    p.write_text("doc_id,source,label\n" + "\n".join(",".join(r) for r in rows) + "\n")
    return str(p)


class TestMetadataScan:
    def test_dedup_is_deterministic_last_wins(self, spark, tmp_path):
        path = _write_csv(
            tmp_path,
            [
                ("1", "web", "a"),
                ("1", "code", "b"),  # duplicate doc — lexicographically later source wins
                ("2", "books", "c"),
            ],
        )
        out = {r.doc_id: (r.source, r.label) for r in read_metadata_csv(spark, path).collect()}
        assert out == {"1": ("web", "a"), "2": ("books", "c")}

    def test_attach_broadcasts_and_left_joins(self, spark, tmp_path):
        path = _write_csv(tmp_path, [("1", "web", "a")])
        meta = read_metadata_csv(spark, path)
        docs = spark.createDataFrame([("1",), ("2",)], "doc_id string")
        joined = attach_metadata(docs, meta)
        rows = {r.doc_id: (r.meta_source, r.meta_label) for r in joined.collect()}
        assert rows == {"1": ("web", "a"), "2": (None, None)}
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_schema_is_pinned_no_inference(self, spark, tmp_path):
        path = _write_csv(tmp_path, [("7", "web", "42")])
        df = read_metadata_csv(spark, path)
        # label stays a string even when the file content is numeric
        assert dict(df.dtypes)["label"] == "string"


class TestFallbackScan:
    def test_first_readable_path_wins(self, spark, tmp_path, tokens_df):
        from tsc_spark.sources.metadata import read_with_fallback

        good = str(tmp_path / "good")
        tokens_df.limit(5).write.parquet(good)
        df = read_with_fallback(spark, [str(tmp_path / "missing"), good])
        assert df.count() == 5

    def test_all_paths_failing_raises(self, spark, tmp_path):
        import pytest
        from pyspark.errors import AnalysisException

        from tsc_spark.sources.metadata import read_with_fallback

        with pytest.raises(AnalysisException):
            read_with_fallback(spark, [str(tmp_path / "a"), str(tmp_path / "b")])
