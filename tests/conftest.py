from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from gmall_flink_parent_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("gmall-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def cluster_keep_df(spark, sf_dir):
    """dedup_cluster_keep built ONCE per session: the iterative label
    propagation runs driver-side actions while constructing the frame
    (~12 s), so the hygiene, invariant, and nonempty checks share one
    construction instead of paying it three times."""
    from gmall_flink_parent_spark import plans

    return plans.query_map()["dedup_cluster_keep"](spark, SF_DIR)


@pytest.fixture(scope="session")
def leakage_split_df(spark, sf_dir):
    """leakage_safe_split built ONCE per session — same rationale as
    cluster_keep_df (iterative CC construction runs driver-side
    actions)."""
    from gmall_flink_parent_spark import plans

    return plans.query_map()["leakage_safe_split"](spark, SF_DIR)


@pytest.fixture(scope="session")
def best_keeper_df(spark, sf_dir):
    """cluster_keep_best_quality built ONCE per session — same
    rationale as cluster_keep_df (iterative CC construction)."""
    from gmall_flink_parent_spark import plans

    return plans.query_map()["cluster_keep_best_quality"](spark, SF_DIR)


@pytest.fixture(scope="session")
def embedding_keep_df(spark, sf_dir):
    """embedding_dedup_keep built ONCE per session — same rationale as
    cluster_keep_df (iterative construction runs driver-side actions)."""
    from gmall_flink_parent_spark import plans

    return plans.query_map()["embedding_dedup_keep"](spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()
