"""Stateful streaming clustering: per-doc incremental kernel state.

The reference's streaming analogue is `add_data_point_permanently!` — one
point appended, clusters updated incrementally, full state kept in
memory (/root/reference/src/polyphonic/polyphonic_cluster_manager.jl:
514-517).  Here the same kernel state lives in Spark's checkpointed
state store, keyed by doc_id, updated via ``applyInPandasWithState``:
token chunks stream in, each micro-batch appends them in sequence order
and emits the doc's refreshed timeline.  Because state is checkpointed,
a killed job resumes mid-series without re-reading earlier chunks —
streaming-tier lineage to match the batch pipeline's bucket manifests.

Scale: state per doc is the full kernel manager — the token buffer plus
the cluster forest, i.e. O(points seen so far) — re-serialized each
micro-batch the doc receives data; docs partition across executors by
doc_id hash and the state store (RocksDB in production) spills to disk,
so total state is not executor-memory-bound, but very long-lived series
pay growing per-batch state I/O (bound series length, or window the
clustering, for unbounded streams).
"""

from __future__ import annotations

import pickle
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import DEFAULT_MERGE_THRESHOLD_RATIO

__all__ = ["CHUNK_SCHEMA", "TIMELINE_STATE_SCHEMA", "incremental_cluster_stream"]

# input stream rows: ordered chunks of a doc's token series
CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("seq_no", LongType(), False),
        StructField("tokens_chunk", ArrayType(IntegerType(), False), False),
    ]
)

_STATE_SCHEMA = StructType([StructField("mgr", BinaryType(), True)])

TIMELINE_STATE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("n_points", LongType(), False),
        StructField("window_size", IntegerType(), False),
        StructField("cluster_id", StringType(), False),
        StructField("indices", ArrayType(IntegerType(), False), False),
    ]
)


def _make_update_fn(merge_threshold_ratio: float):
    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from ..kernel.api import analyse_tokens

        (doc_id,) = key
        batch = list(pdfs)
        chunks = pd.concat(batch) if batch else pd.DataFrame()
        if chunks.empty:
            return

        # state = (manager | None, next expected seq_no, pending
        # out-of-order chunks {seq_no: tokens}).  Chunks may arrive in
        # any order ACROSS micro-batches (file listing order, late
        # files, maxFilesPerTrigger splits) and may be re-delivered;
        # only the consecutive prefix from next_seq is ever applied, so
        # the appended token order — and therefore the timeline — is
        # chunk-order-invariant, and duplicates (seq < next_seq or
        # already pending) are dropped.
        if state.exists:
            mgr, next_seq, pending = pickle.loads(bytes(state.get[0]))
        else:
            mgr, next_seq, pending = None, 0, {}

        for _, row in chunks.iterrows():
            seq = int(row["seq_no"])
            if seq >= next_seq and seq not in pending:
                pending[seq] = [int(t) for t in row["tokens_chunk"]]

        applied = False
        while next_seq in pending:
            toks = pending.pop(next_seq)
            next_seq += 1
            if not toks:
                continue
            if mgr is None:
                mgr = analyse_tokens(toks, merge_threshold_ratio)
            else:
                for v in toks:
                    mgr.add_data_point(float(v))
            applied = True
        state.update((pickle.dumps((mgr, next_seq, pending)),))
        if mgr is None or not applied:
            return

        rows = {"doc_id": [], "n_points": [], "window_size": [], "cluster_id": [], "indices": []}
        n = mgr.n
        for ws, cid, inds in mgr.timeline():
            rows["doc_id"].append(doc_id)
            rows["n_points"].append(n)
            rows["window_size"].append(ws)
            rows["cluster_id"].append(cid)
            rows["indices"].append(inds)
        yield pd.DataFrame(rows)

    return update


def incremental_cluster_stream(
    chunk_stream: DataFrame,
    merge_threshold_ratio: float = DEFAULT_MERGE_THRESHOLD_RATIO,
) -> DataFrame:
    """chunked token stream → per-batch refreshed timelines.

    After all of a doc's chunks have streamed through (any chunking, any
    number of restarts), the emitted timeline is identical to the batch
    ``cluster_timeline`` of the whole series — asserted by
    tests/test_streaming_stateful.py."""
    return chunk_stream.groupBy("doc_id").applyInPandasWithState(
        _make_update_fn(float(merge_threshold_ratio)),
        outputStructType=TIMELINE_STATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
