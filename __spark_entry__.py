"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship OrderWide query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every registered operator from
SURVEY.md §2 plus the LLM-data-pipeline surface, backed by
``gmall_flink_parent_spark.plans`` (the registry each operator module
populates at import time).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gmall_flink_parent_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.query_map()["order_wide_enriched"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per SQL-expressible query."""
    return plans.oracle_map()
