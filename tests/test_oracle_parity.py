"""Every registered query with an oracle must match DuckDB exactly —
the local mirror of the driver's CORRECTNESS gate (at sf0.001 for speed;
the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from gmall_flink_parent_spark import plans
from tests.oracle_harness import assert_arrow_schema_matches, assert_matches_oracle

SPECS = [s for s in plans.all_queries().values() if s.oracle is not None]

# Pair-producing dedup queries may legitimately be empty at tiny SF;
# every other query must return rows.
MAY_BE_EMPTY = {
    "dedup_jaccard_tiers",
    "dedup_minhash_lsh",
    "simhash_near_dup",
    "dedup_embedding_cosine",
}


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spark, duck, sf_dir, spec):
    df = spec.fn(spark, sf_dir)
    n = assert_matches_oracle(df, duck, spec.oracle, name=spec.name)
    if spec.name not in MAY_BE_EMPTY:
        assert n > 0, f"{spec.name} returned 0 rows"


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_arrow_dtypes_match_oracle(spark, duck, sf_dir, spec):
    # The driver hashes Arrow values, so dtype class must agree even when
    # normalized values do (the round-2 sessionize HUGEINT-vs-int64 miss).
    df = spec.fn(spark, sf_dir)
    assert_arrow_schema_matches(df, duck, spec.oracle, name=spec.name)


def test_oracle_less_queries_have_nonempty_results(
    spark, sf_dir, cluster_keep_df, embedding_keep_df, leakage_split_df,
    best_keeper_df,
):
    """The nonempty pin for the rows-only queries. Oracle-backed queries
    are already executed (and nonempty-checked) by the parity sweep
    above, so re-running all 50 here would only re-pay their cost;
    the two iterative heads reuse shared session fixtures because their
    constructions are the most expensive builds."""
    assert cluster_keep_df.count() > 0, "dedup_cluster_keep returned 0 rows"
    assert embedding_keep_df.count() > 0, "embedding_dedup_keep returned 0 rows"
    assert leakage_split_df.count() > 0, "leakage_safe_split returned 0 rows"
    assert best_keeper_df.count() > 0, "cluster_keep_best_quality returned 0 rows"
    for name, spec in plans.all_queries().items():
        if spec.oracle is None and name not in (
            "dedup_cluster_keep",
            "embedding_dedup_keep",
            "leakage_safe_split",
            "cluster_keep_best_quality",
        ):
            assert spec.fn(spark, sf_dir).count() > 0, f"{name} returned 0 rows"


def test_driver_window_is_exactly_the_long_green_oracle_set():
    """The driver checks the FIRST 50 registry entries. QUERIES.md
    documents the ordering contract (oracle-backed first, past_window
    additions behind the long-green rows); this pins it as CI so a new
    registration cannot silently push one of the driver's green rows
    out of its slot:

    - exactly 50 oracle-backed queries carry past_window=False — a new
      oracle query MUST be registered past_window=True (this assertion
      is the loud reminder);
    - the first 50 entries of the ordered registry are exactly that
      set, each oracle-backed;
    - everything after slot 50 is past-window-oracle first, then
      rows-only — so the driver's weaker rows-only check never applies
      to a query that has an oracle.
    """
    specs = list(plans.all_queries().values())
    windowed = [s for s in specs if s.oracle is not None and not s.past_window]
    assert len(windowed) == 50, (
        f"{len(windowed)} oracle-backed queries claim a driver window slot; "
        "the window holds exactly 50 — register new oracle queries with "
        "past_window=True"
    )
    first_50 = specs[:50]
    assert {s.name for s in first_50} == {s.name for s in windowed}
    assert all(s.oracle is not None for s in first_50)
    tail = specs[50:]
    past = [s for s in tail if s.oracle is not None]
    rows_only = [s for s in tail if s.oracle is None]
    assert all(s.past_window for s in past)
    assert tail[: len(past)] == past and tail[len(past):] == rows_only


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))


def test_registry_driver_window_is_fully_oracle_backed():
    """The driver hash-checks the first 50 registry entries; those slots
    must all carry oracles, with past-window additions sorted directly
    after them (before the rows-only group) so long-green driver rows
    never lose their slot to a newly registered query."""
    specs = list(plans.all_queries().values())
    assert all(s.oracle is not None for s in specs[:50])
    tail = specs[50:]
    n_late = sum(1 for s in tail if s.oracle is not None)
    assert all(s.oracle is not None and s.past_window for s in tail[:n_late])
    assert all(s.oracle is None for s in tail[n_late:])
    assert not any(s.past_window for s in specs[:50])
