"""Stateful streaming clustering: chunked stream + restarts converge to
the exact batch timeline."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _run_chunks(spark, src, out, ckpt):
    from tsc_spark.streaming.stateful import CHUNK_SCHEMA, incremental_cluster_stream

    stream = spark.readStream.schema(CHUNK_SCHEMA).parquet(src)
    q = (
        incremental_cluster_stream(stream, merge_threshold_ratio=0.3)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_chunked_stream_converges_to_batch_timeline(spark, tokens_rows, tmp_path):
    from tsc_spark.streaming.stateful import CHUNK_SCHEMA

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # pick a few docs with interesting series; split each into 3 chunks
    docs = [(d, t) for d, t, _s in tokens_rows if len(t) >= 9][:6]
    assert len(docs) == 6

    def chunk_rows(which):
        rows = []
        for doc_id, toks in docs:
            k = len(toks) // 3
            bounds = [(0, k), (k, 2 * k), (2 * k, len(toks))][which]
            rows.append((doc_id, which, [int(x) for x in toks[bounds[0] : bounds[1]]]))
        return rows

    # run 1: chunks 0 and 1 (two separate micro-batch files)
    spark.createDataFrame(chunk_rows(0), CHUNK_SCHEMA).write.mode("append").parquet(src)
    _run_chunks(spark, src, out, ckpt)
    spark.createDataFrame(chunk_rows(1), CHUNK_SCHEMA).write.mode("append").parquet(src)
    _run_chunks(spark, src, out, ckpt)
    # run 3 restarts from checkpointed state and appends the final chunk
    spark.createDataFrame(chunk_rows(2), CHUNK_SCHEMA).write.mode("append").parquet(src)
    _run_chunks(spark, src, out, ckpt)

    emitted = spark.read.parquet(out)
    # keep each doc's final emission (max n_points)
    final = (
        emitted.withColumn(
            "rk",
            F.col("n_points") == F.max("n_points").over(Window.partitionBy("doc_id")),
        )
        .filter("rk")
        .select("doc_id", "window_size", "cluster_id", "indices")
    )

    # batch oracle over the full series
    from tsc_spark.kernel.api import analyse_tokens

    got = {
        (r["doc_id"], r["window_size"], r["cluster_id"]): list(r["indices"])
        for r in final.collect()
    }
    want = {}
    for doc_id, toks in docs:
        mgr = analyse_tokens(toks, 0.3)
        for ws, cid, inds in mgr.timeline():
            want[(doc_id, ws, cid)] = list(inds)
    assert got == want


def test_out_of_order_and_duplicate_chunks_converge(spark, tokens_rows, tmp_path):
    """Chunks delivered out of order ACROSS micro-batches (seq 2 before
    seq 1) and re-delivered duplicates must still converge to the exact
    batch timeline — the state machine buffers future chunks and only
    applies the consecutive prefix."""
    from tsc_spark.kernel.api import analyse_tokens
    from tsc_spark.streaming.stateful import CHUNK_SCHEMA

    src = str(tmp_path / "src_ooo")
    out = str(tmp_path / "out_ooo")
    ckpt = str(tmp_path / "ckpt_ooo")

    doc_id, toks = next((d, t) for d, t, _s in tokens_rows if len(t) >= 9)
    k = len(toks) // 3
    chunks = {
        0: [int(x) for x in toks[:k]],
        1: [int(x) for x in toks[k : 2 * k]],
        2: [int(x) for x in toks[2 * k :]],
    }
    # batch 1: seq 0 and seq 2 (gap) — only seq 0 may be applied
    spark.createDataFrame(
        [(doc_id, 0, chunks[0]), (doc_id, 2, chunks[2])], CHUNK_SCHEMA
    ).write.mode("append").parquet(src)
    _run_chunks(spark, src, out, ckpt)
    # batch 2: seq 1 (fills the gap) + a duplicate redelivery of seq 0
    spark.createDataFrame(
        [(doc_id, 1, chunks[1]), (doc_id, 0, chunks[0])], CHUNK_SCHEMA
    ).write.mode("append").parquet(src)
    _run_chunks(spark, src, out, ckpt)

    emitted = spark.read.parquet(out)
    final_n = emitted.agg(F.max("n_points")).collect()[0][0]
    assert final_n == len(toks)  # every token applied exactly once
    got = sorted(
        (r.window_size, r.cluster_id, list(r.indices))
        for r in emitted.filter(F.col("n_points") == final_n).collect()
    )
    expected = sorted(
        (ws, cid, list(inds))
        for ws, cid, inds in analyse_tokens(
            [int(x) for x in toks], 0.3
        ).timeline()
    )
    assert got == expected
