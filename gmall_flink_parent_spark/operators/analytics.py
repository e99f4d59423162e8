"""Analytic-SQL surface: distribution window functions and set operations.

The reference exposes no window functions or set operations (SURVEY
§2.6: "grouping-sets/cube/rollup, sorts, limits, top-k, set operations
… are absent"), but its DWS layer — the one the snapshot points to and
doesn't contain — is exactly where they'd live. Catalyst gives them for
free (SURVEY §2.5 note); these queries pin the semantics under the
DuckDB oracle so a reference user gets the full analytic surface, not
just the operators the Flink code happened to hand-build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gmall_flink_parent_spark.plans.registry import register
from gmall_flink_parent_spark.sources.tables import load_table

VALUE_DIST_ORACLE = """
SELECT event_type, user_id, CAST(spend AS DOUBLE) AS spend,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cume,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile
FROM (
    SELECT event_type, user_id, SUM(CAST(value AS DECIMAL(18,2))) AS spend
    FROM events
    GROUP BY event_type, user_id
)
WINDOW w AS (PARTITION BY event_type ORDER BY spend, user_id)
"""


@register("user_value_distribution", oracle=VALUE_DIST_ORACLE, tags=("dws", "window-fn"))
def user_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type spend distribution: percent_rank, cume_dist, quartiles.

    One shuffle on (event_type, user_id) for the aggregate; the window
    pass repartitions on event_type alone — tiny after reduction. All
    three window functions share one sort, and the (spend, user_id)
    ordering makes ntile assignment deterministic across engines.

    Scale bound (documented, not hidden): percent_rank/cume_dist/ntile
    need a total order per partition key, so with ~5 event types the
    sort runs on ≤5 tasks over users-per-type aggregates — rows ∝
    distinct users, NOT fact rows, which keeps it tractable well past
    the fact table's 100 TB. If users-per-type itself outgrows a task,
    the rewrite is a two-pass range-partition rank (per-range counts →
    cumulative offsets broadcast → within-range rank + offset).
    """
    events = load_table(spark, sf_dir, "events")
    spend = events.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("spend")
    )
    w = Window.partitionBy("event_type").orderBy("spend", "user_id")
    return spend.select(
        "event_type",
        "user_id",
        F.col("spend").cast("double").alias("spend"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


SEMI_ANTI_ORACLE = """
SELECT c.c_custkey, c.c_mktsegment,
       CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            THEN 'active' ELSE 'dormant' END AS status
FROM customer c
"""


@register("customer_order_status", oracle=SEMI_ANTI_ORACLE, tags=("join", "semi-anti"))
def customer_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti-join surface: customers labeled by order existence.

    ``left_semi`` + ``left_anti`` are first-class Catalyst join types —
    each is one equi-join shuffle that never materializes the orders
    payload (the probe side contributes existence only), which is the
    scalable form of EXISTS/NOT EXISTS at fact-table cardinality.
    """
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    order_keys = load_table(spark, sf_dir, "orders").select("o_custkey")
    active = customer.join(
        order_keys, customer.c_custkey == order_keys.o_custkey, "left_semi"
    ).withColumn("status", F.lit("active"))
    dormant = customer.join(
        order_keys, customer.c_custkey == order_keys.o_custkey, "left_anti"
    ).withColumn("status", F.lit("dormant"))
    return active.unionByName(dormant)


OVERLAP_ORACLE = """
WITH v AS (SELECT DISTINCT user_id, strftime(ts, '%Y%m%d') AS ymd
           FROM events WHERE event_type = 'view'),
     p AS (SELECT DISTINCT user_id, strftime(ts, '%Y%m%d') AS ymd
           FROM events WHERE event_type = 'purchase')
SELECT 'view_no_purchase' AS segment, user_id, ymd
FROM (SELECT * FROM v EXCEPT SELECT * FROM p)
UNION ALL
SELECT 'view_and_purchase' AS segment, user_id, ymd
FROM (SELECT * FROM v INTERSECT SELECT * FROM p)
"""


@register("engaged_user_overlap", oracle=OVERLAP_ORACLE, tags=("dws", "set-op"))
def engaged_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-day browse/buy overlap via EXCEPT / INTERSECT / UNION ALL.

    Set operations compile to aggregates and left-anti/left-semi joins
    under Catalyst — the same shuffle-on-key shape as any equi-join, so
    they scale like the joins they desugar to. Both branches share the
    one scan of ``events`` (two filters off it), and each set op keys on
    the (user_id, ymd) pair.
    """
    events = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyyMMdd").alias("ymd")
    v = events.filter(F.col("event_type") == "view").select("user_id", day).distinct()
    p = events.filter(F.col("event_type") == "purchase").select("user_id", day).distinct()
    return (
        v.subtract(p)
        .select(F.lit("view_no_purchase").alias("segment"), "user_id", "ymd")
        .unionByName(
            v.intersect(p).select(
                F.lit("view_and_purchase").alias("segment"), "user_id", "ymd"
            )
        )
    )
