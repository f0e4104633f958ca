"""Distributed polyphonic clustering equals the driver-side set kernel."""

from pyspark.sql import functions as F


def test_cluster_timeline_poly_matches_kernel(spark, tokens_rows):
    from tsc_spark.kernel.polymanager import PolyClusterManager
    from tsc_spark.operators.clustering import cluster_timeline_poly

    docs = [(d, t) for d, t, _s in tokens_rows if len(t) >= 6][:8]

    def to_chords(toks):
        return [
            [float(x), float((x + 4) % 24)] if i % 2 == 0 else [float(x)]
            for i, x in enumerate(toks)
        ]

    rows = [(d, to_chords(t)) for d, t in docs]
    df = spark.createDataFrame(rows, "doc_id string, chords array<array<double>>")
    got = {
        (r["doc_id"], r["window_size"], r["cluster_id"]): list(r["indices"])
        for r in cluster_timeline_poly(df, merge_threshold_ratio=0.3).collect()
    }

    want = {}
    for d, chords in rows:
        mgr = PolyClusterManager(
            chords, 0.3, 2, True,
            scale_mode="contextual_global_halves", contextual_min_width=1.0,
        )
        mgr.process_data()
        for ws, cid, inds in mgr.timeline():
            want[(d, ws, cid)] = list(inds)
    assert got == want
