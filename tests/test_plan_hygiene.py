"""Engine-wide physical-plan hygiene, pinned for every registered query.

The scale rules the repo is built on (SCALE.md) as executable
invariants: candidate generation is never an unbounded cross product,
and no Python ever runs row-at-a-time — the only Python paths are
Arrow-batched (ArrowEvalPython / mapInPandas). Runs against the full
registry so any future query or refactor that regresses the plan shape
fails here before the driver sees it.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from gmall_flink_parent_spark import plans

# Deliberate constant-size broadcast cross joins — the one legitimate
# BroadcastNestedLoopJoin shape: the broadcast side is bounded by a
# CONSTANT (not by data), so the "nested loop" is k comparisons per row.
BNLJ_ALLOWED = {
    "cosine_topk_bruteforce",  # 8-vector query set × candidates (the baseline)
    "ivf_kmeans_assign",  # k=10 centroids × vectors (Lloyd assignment)
    "vocab_top_tokens",  # ≤50-row rank-offset frame × top tokens
    "doc_unigram_logprob",  # 1-row corpus-total scalar × vocab
    "doc_unigram_logprob_topv",  # 1-row (total, head_mass, n_tail) scalar × tokens
    "chunk_bm25_topk",  # 1-row (N, avgdl, df…) corpus stats × chunks
    "doc_bigram_logprob",  # 1-row vocabulary-size scalar × bigram model
    "quality_annealed_mixture",  # 1-row p75-threshold scalar × scored docs
    "term_postings_stats",  # 1-row chunk-count scalar × vocabulary
    "dsir_importance_weights",  # 1-row (t_t, t_r) gram-total scalar × buckets
    "dsir_gumbel_resample",  # same 1-row totals scalar (shared weight core)
}


def _physical_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _assert_hygienic(plan: str, name: str) -> None:
    assert "CartesianProduct" not in plan, f"{name}: unbounded cross product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join outside the constant-broadcast allowlist"
        )


# dedup_cluster_keep runs its iterative construction when the frame is
# built, so it rides the shared session fixture (test below) instead of
# re-running here.
@pytest.mark.parametrize(
    "name",
    sorted(set(plans.all_queries()) - {"dedup_cluster_keep", "embedding_dedup_keep"}),
)
def test_plan_hygiene(spark, sf_dir, name):
    _assert_hygienic(
        _physical_plan(plans.all_queries()[name].fn(spark, sf_dir)), name
    )


def test_plan_hygiene_cluster_keep(cluster_keep_df):
    _assert_hygienic(_physical_plan(cluster_keep_df), "dedup_cluster_keep")


def test_plan_hygiene_embedding_keep(embedding_keep_df):
    _assert_hygienic(_physical_plan(embedding_keep_df), "embedding_dedup_keep")


def test_training_mix_weighted_plan_is_shuffle_free(spark, sf_dir):
    """SCALE.md claims the weighted mixture is one corpus scan with no
    shuffle: broadcast weight join + epoch explode + codegen hash
    filter. Pin it — the only Exchange allowed is the broadcast of the
    (≤20-row) weight table."""
    import re

    plan = _physical_plan(
        plans.all_queries()["training_mix_weighted"].fn(spark, sf_dir)
    )
    exchanges = re.findall(r"\w*Exchange\b", plan)
    assert exchanges, "expected the broadcast weight-table exchange"
    assert all(e == "BroadcastExchange" for e in exchanges), exchanges
    assert "BroadcastHashJoin" in plan
