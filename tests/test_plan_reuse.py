"""Subtree-reuse guarantees for self-joining operators.

The 100 TB claim being tested (round-4 verdict, 'What's wrong #1'): a
self-join whose input is NOT materialized re-executes the full upstream
corpus-scan subtree once per plan reference — measured 6 parquet scans
for window_matches at sf0.1.  After materializing (lazy localCheckpoint)
the match/shingle/band tables before their self-joins, the final
executed plan reads the checkpointed RDD on every side: ZERO file scans
in the consuming plan, the corpus is scanned only by the one
materialization job.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsc_spark.plans.bucketing import plan_file_scans, plan_nodes  # noqa: E402


@pytest.fixture(scope="module")
def parquet_tokens(spark, tokens_df, tmp_path_factory):
    """Tokens at rest in parquet — file scans only exist for file-backed
    sources, so the plan assertions need the production storage shape,
    not an in-memory createDataFrame relation."""
    path = str(tmp_path_factory.mktemp("reuse") / "tokens")
    tokens_df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def parquet_docs(spark, tmp_path_factory):
    rows = [
        (f"d{i:03d}", " ".join(f"w{(i * 7 + j) % 13}" for j in range(20)))
        for i in range(40)
    ]
    # clone a few docs so near-dup pairs actually exist
    rows += [(f"c{i}", rows[i][1]) for i in range(4)]
    path = str(tmp_path_factory.mktemp("reuse") / "docs")
    spark.createDataFrame(rows, "doc_id string, text string").write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path)


def test_walker_sees_self_join_scans(spark, parquet_tokens):
    """Control for the zero-scan assertions below: an UNmaterialized
    parquet self-join shows one file scan per side, so plan_file_scans
    returning 0 elsewhere is a property of checkpointing, not a broken
    walker."""
    j = parquet_tokens.alias("a").join(
        parquet_tokens.alias("b").withColumnRenamed("n_tok", "n2"),
        "doc_id",
    )
    j.collect()
    assert plan_file_scans(j) >= 2


def test_window_matches_plan_single_consumption(spark, parquet_tokens):
    """The grouped in-array containment filter consumes the upstream
    window-index subtree exactly once: one file scan per ws branch
    (ws∈{3,4} → 2), never the 6 the anti-join shape re-executed."""
    from tsc_spark.operators.matching import (
        exact_window_matches,
        filter_contained_relational,
    )

    out = filter_contained_relational(
        exact_window_matches(parquet_tokens, window_sizes=(3, 4))
    )
    rows = out.collect()
    assert len(rows) > 0  # non-vacuous: the synth corpus self-matches
    assert plan_file_scans(out) <= 2, plan_nodes(out)


def test_antijoin_variant_reads_checkpoint_and_matches_grouped(
    spark, parquet_tokens
):
    from tsc_spark.operators.matching import (
        exact_window_matches,
        filter_contained_antijoin,
        filter_contained_relational,
    )

    matches = exact_window_matches(parquet_tokens, window_sizes=(3, 4))
    out = filter_contained_antijoin(matches)
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(
        tuple(r) for r in filter_contained_relational(matches).collect()
    )
    assert got == want
    # final plan: both anti-join sides read the checkpointed match RDD
    assert plan_file_scans(out) == 0, plan_nodes(out)
    assert "RDDScanExec" in plan_nodes(out)


def test_ngram_jaccard_plan_reads_checkpoint_not_parquet(spark, parquet_docs):
    from tsc_spark.operators.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(parquet_docs, n=3, threshold=0.8)
    rows = out.collect()
    assert len(rows) >= 4  # the cloned docs pair up
    assert plan_file_scans(out) == 0, plan_nodes(out)


def test_lsh_pairs_plan_reads_checkpoint_not_parquet(spark, parquet_docs):
    from tsc_spark.operators.dedup import lsh_candidate_pairs

    out = lsh_candidate_pairs(parquet_docs, n=3, k=8, bands=4)
    rows = out.collect()
    assert len(rows) >= 4
    # the banded self-join reads the checkpointed band table; the one
    # materialization job upstream is where the single corpus scan lives
    assert plan_file_scans(out) == 0, plan_nodes(out)
