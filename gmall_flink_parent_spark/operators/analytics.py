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

from gmall_flink_parent_spark.plans.registry import register, scoped_persist
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


def value_distribution_frame(spark: SparkSession, spend: DataFrame) -> DataFrame:
    """Per-type spend distribution over a (event_type, user_id, spend)
    frame: percent_rank, cume_dist, quartiles —
    computed as a two-pass range-partition rank, NOT a per-type window.

    Frame-level core shared by the batch ``user_value_distribution``
    query and the ``user_value_distribution_from_store`` final pass
    over ``topk_spend_job``'s partial store (``streaming/jobs.py``) —
    one store, many heads.

    A naive ``Window.partitionBy(event_type)`` puts ALL users of one
    type on one task (~5 types ⇒ ≤5 tasks sort users-per-type rows); at
    100 TB that single task is the plan's ceiling. Instead:

    1. range-partition the (event_type, user_id) aggregates on the full
       sort key — every partition holds a contiguous key range, bounded
       by rows/partitions, regardless of type cardinality;
    2. per-(range, type) row counts + first-row offsets (a
       partitions×types-sized frame) give each range's cumulative
       offset and each type's total via a window over that TINY
       summary frame;
    3. global position = within-range local offset + broadcast offset.
       The local offset comes from ``monotonically_increasing_id``
       stamped over the SORTED partitions ((partition << 33) |
       row-offset, decoded with a shift and mask) minus the group's
       first offset from the summary — NOT from a ``row_number``
       window, which would re-shuffle the full frame on (pid, type)
       to prove a clustering the range exchange already produced.

    Because (spend, user_id) is unique within a type (the aggregate's
    grain), the order is total: rank == position ``p``,
    so percent_rank = (p-1)/(n-1), cume_dist = p/n, and ntile(4)
    follows arithmetically (first n mod 4 buckets get ⌈n/4⌉ rows) — no
    per-type sort task ever sees more than one range partition.
    """
    n_ranges = spark.sparkContext.defaultParallelism
    # persisted (query-scoped): both the ranked path and the offsets
    # summary consume it (and must agree on partition membership), and
    # it is the REDUCED frame (one row per (type, user)) — without the
    # cache the scan + aggregate + range shuffle all run twice.
    part = scoped_persist(
        spend.repartitionByRange(n_ranges, "event_type", "spend", "user_id")
        .sortWithinPartitions("event_type", "spend", "user_id")
        .withColumn("__mid", F.monotonically_increasing_id())
    )
    pid = F.shiftright("__mid", 33)
    mid_off = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    counts = part.groupBy(pid.alias("pid"), "event_type").agg(
        F.count(F.lit(1)).alias("cnt"), F.min(mid_off).alias("first_off")
    )
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "pid",
        "event_type",
        "first_off",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
    )
    ranked = part.withColumn("pid", pid).join(
        F.broadcast(offsets), ["pid", "event_type"]
    )
    p = F.col("off") + (mid_off - F.col("first_off")) + 1
    n = F.col("n")
    big, small, rem = (n / 4).cast("long") + 1, (n / 4).cast("long"), n % 4
    quartile = F.when(p <= big * rem, F.ceil(p / big)).otherwise(
        rem + F.ceil((p - big * rem) / small)
    )
    return ranked.select(
        "event_type",
        "user_id",
        F.col("spend").cast("double").alias("spend"),
        F.round(
            F.when(n > 1, (p - 1).cast("double") / (n - 1)).otherwise(0.0), 6
        ).alias("pct_rank"),
        F.round(p.cast("double") / n, 6).alias("cume"),
        quartile.cast("int").alias("quartile"),
    )


@register("user_value_distribution", oracle=VALUE_DIST_ORACLE, tags=("dws", "window-fn"))
def user_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type spend distribution (percent_rank / cume_dist / ntile)
    over the shared ``spend_by_type_user`` grain — the scalable
    two-pass rank lives in ``value_distribution_frame``."""
    from gmall_flink_parent_spark.operators.windows import spend_by_type_user

    return value_distribution_frame(
        spark, spend_by_type_user(load_table(spark, sf_dir, "events"))
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


# ------------------------------------------------------------- funnel

_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_HORIZON_H = 72  # each step must follow the previous within 72 h

FUNNEL_ORACLE = f"""
WITH e AS (
    SELECT user_id, event_type, ts FROM events
), t1 AS (
    SELECT user_id, min(ts) AS t FROM e
    WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
), t2 AS (
    SELECT e.user_id, min(ts) AS t FROM e JOIN t1 USING (user_id)
    WHERE event_type = '{_FUNNEL_STEPS[1]}'
      AND ts > t1.t AND ts <= t1.t + INTERVAL {_FUNNEL_HORIZON_H} HOUR
    GROUP BY e.user_id
), t3 AS (
    SELECT e.user_id, min(ts) AS t FROM e JOIN t2 USING (user_id)
    WHERE event_type = '{_FUNNEL_STEPS[2]}'
      AND ts > t2.t AND ts <= t2.t + INTERVAL {_FUNNEL_HORIZON_H} HOUR
    GROUP BY e.user_id
), n AS (
    SELECT 1 AS step, '{_FUNNEL_STEPS[0]}' AS event_type,
           (SELECT count(*) FROM t1) AS n_users
    UNION ALL
    SELECT 2, '{_FUNNEL_STEPS[1]}', (SELECT count(*) FROM t2)
    UNION ALL
    SELECT 3, '{_FUNNEL_STEPS[2]}', (SELECT count(*) FROM t3)
)
SELECT CAST(step AS INTEGER) AS step, event_type,
       CAST(n_users AS BIGINT) AS n_users,
       ROUND(CASE WHEN (SELECT n_users FROM n WHERE step = 1) > 0
             THEN CAST(n_users AS DOUBLE)
                  / (SELECT n_users FROM n WHERE step = 1) END, 6) AS conversion
FROM n
"""


@register(
    "funnel_conversion",
    oracle=FUNNEL_ORACLE,
    tags=("dws", "funnel", "sequence"),
    past_window=True,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel over event time: per user, the first
    ``view``, the first ``click`` AFTER that view, and the first
    ``purchase`` after that click — each within a
    72-hour horizon of the previous step — reported
    as per-step user counts and conversion vs step 1. The classic
    e-commerce DWS read (the reference's bounce CEP is the 2-step
    negative form of the same sequence logic; this is the k-step
    positive form).

    Sequential dependence (step k's window opens at the user's step
    k−1 time) makes this a chain of per-user joins, NOT a window
    function: each stage filters the event scan by type (pushed-down
    predicate), joins the previous stage's (user, t) frame on
    ``user_id``, and takes a per-user min — user-keyed equi-joins all
    the way down, with the stage frames user-cardinality-sized (they
    broadcast for dimension-scale user sets and shuffle-join past
    that). The final report is three 1-row counts unioned; at 100 TB
    the cost is one scan per step plus user-keyed joins — never a
    per-user sort of the whole event stream.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    horizon = F.expr(f"INTERVAL {_FUNNEL_HORIZON_H} HOURS")

    def next_step(prev: DataFrame, step_type: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == step_type)
            .join(prev.select("user_id", F.col("t").alias("_pt")), "user_id")
            .filter((F.col("ts") > F.col("_pt")) & (F.col("ts") <= F.col("_pt") + horizon))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )

    t1 = (
        e.filter(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    t2 = next_step(t1, _FUNNEL_STEPS[1])
    t3 = next_step(t2, _FUNNEL_STEPS[2])
    counts = [
        s.agg(F.count(F.lit(1)).alias(f"n{i}"))
        for i, s in enumerate((t1, t2, t3), start=1)
    ]
    base = counts[0].crossJoin(counts[1]).crossJoin(counts[2])
    rows = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("step"),
                        F.lit(_FUNNEL_STEPS[i - 1]).alias("event_type"),
                        F.col(f"n{i}").cast("long").alias("n_users"),
                    )
                    for i in (1, 2, 3)
                ]
            )
        ).alias("r"),
        F.col("n1"),
    ).select("r.*", "n1")
    return rows.select(
        "step",
        "event_type",
        "n_users",
        F.round(
            F.when(F.col("n1") > 0, F.col("n_users").cast("double") / F.col("n1")),
            6,
        ).alias("conversion"),
    )


# ------------------------------------------------ market basket pairs

_COPURCHASE_MIN_SUP = 3

COPURCHASE_ORACLE = f"""
WITH baskets AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS support
FROM baskets a JOIN baskets b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
HAVING count(*) >= {_COPURCHASE_MIN_SUP}
"""


@register(
    "part_copurchase_pairs",
    oracle=COPURCHASE_ORACLE,
    tags=("dws", "market-basket"),
    past_window=True,
)
def part_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequently co-purchased part pairs (support ≥ 3) — the market
    basket primitive behind "bought together" and feature
    co-occurrence mining.

    The oracle states the NAIVE semantics (basket self-join, group,
    HAVING); the plan applies the Apriori monotonicity prune first: a
    part occurring in fewer than min_sup baskets cannot appear in any
    qualifying pair, so the basket stream is semi-joined against the
    frequent-part set BEFORE the pair fan-out — losslessly identical
    results (the oracle hash proves it every run), but the quadratic
    per-basket pair generation runs only over frequent items. Per-order
    fan-out is bounded by basket size (single digits in order data);
    the real shuffle is the pair aggregate, map-side combined. The
    frequent-part set is df-thresholded — small under any realistic
    support, broadcast; a degenerate corpus where most parts are
    frequent degrades gracefully to the naive plan's cost, never worse.
    """
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    baskets = scoped_persist(baskets)
    frequent = (
        baskets.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("f"))
        .filter(F.col("f") >= _COPURCHASE_MIN_SUP)
        .select("l_partkey")
    )
    pruned = baskets.join(F.broadcast(frequent), "l_partkey")
    a = pruned.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a")
    )
    b = pruned.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, (a["k"] == b["k"]) & (a["part_a"] < b["part_b"]))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _COPURCHASE_MIN_SUP)
    )
