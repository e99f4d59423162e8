"""BaseLogTask analog — JSON parse, 3-way split, array explode (EP1).

Reference semantics (``gmall-realtime/.../app/dwd/BaseLogTask.java``):

- parse raw JSON log lines (``:52-57``, P1),
- split one stream three ways with side outputs: start-logs, page-logs,
  display records (``:109-148``, X1),
- flatten the ``displays`` array, injecting the parent ``page_id`` into
  each element (``:126-135``, X2),
- day-grain date bucketing ``yyyyMMdd`` (``:76,87``, P8).

Spark-first design: side outputs become N filtered DataFrames off one
cached parse — Catalyst pushes each branch's filter into the scan, and
``explode`` replaces the per-element ``ctx.output`` loop. The ``events``
test table plays the log stream: ``props`` is the semi-structured JSON
remainder (parsed with ``get_json_object``), ``event_type`` drives the
split, and ``documents`` supplies the array-valued column for the
explode analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_parent_spark.plans.registry import register
from gmall_flink_parent_spark.sources.tables import load_table

LOG_SPLIT_START_ORACLE = """
SELECT event_id,
       user_id,
       ts,
       strftime(ts, '%Y%m%d') AS ymd,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
FROM events
WHERE event_type = 'signup'
"""


@register("log_split_start", oracle=LOG_SPLIT_START_ORACLE, tags=("X1", "P1", "P8"))
def log_split_start(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Start-log branch of the 3-way split (BaseLogTask.java:117-121).

    ``signup`` events play the reference's ``start`` logs. The JSON
    ``props`` remainder is parsed JVM-side with ``get_json_object`` — no
    Python in the row path.
    """
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "signup").select(
        "event_id",
        "user_id",
        "ts",
        F.date_format("ts", "yyyyMMdd").alias("ymd"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


LOG_SPLIT_PAGE_ORACLE = """
SELECT event_id,
       user_id,
       ts,
       event_type,
       strftime(ts, '%Y%m%d') AS ymd,
       CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS page_value,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
FROM events
WHERE event_type IN ('view', 'click')
"""


# rotated out of the driver window (round 10): long-green since round 1,
# the split family keeps log_split_start in-window; local sweep covers this
@register(
    "log_split_page",
    oracle=LOG_SPLIT_PAGE_ORACLE,
    tags=("X1", "P1", "P8"),
    past_window=True,
)
def log_split_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-log branch of the 3-way split (BaseLogTask.java:123-146).

    ``view``/``click`` events play the reference's page logs; the other
    branches (start / display) are separate registered queries — in a
    streaming deployment all three share one parsed source and one
    ``foreachBatch`` (SURVEY §2 X1 side-output mapping).
    """
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type").isin("view", "click")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.date_format("ts", "yyyyMMdd").alias("ymd"),
        # decimal cast fixes the money scale; DOUBLE only at the output edge
        F.col("value").cast("decimal(18,2)").cast("double").alias("page_value"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


TOKEN_EXPLODE_ORACLE = """
SELECT d.doc_id,
       d.source,
       u.token
FROM documents d, UNNEST(string_split(d.text, ' ')) AS u(token)
"""


PROPS_EXTRACT_ORACLE = """
SELECT event_id,
       event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_bucket
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) IS NOT NULL
"""


@register("props_json_extract", oracle=PROPS_EXTRACT_ORACLE, tags=("P1", "json"))
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON field extraction (P1) + derived bucket (P6).

    The reference parses every record's JSON payload before anything
    else (``BaseLogTask.java:52-57``, ``BaseDbTask.java:54``);
    ``get_json_object`` is the per-field analog and ``from_json`` the
    full-record one (used by the streaming jobs). JVM-side JSON path
    evaluation — no Python, stays in codegen, and the null filter drops
    malformed payloads exactly like the reference's try/catch dirty-data
    guard.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select(
            "event_id",
            "event_type",
            k.alias("k"),
            (k % 10).alias("k_bucket"),
        )
        .filter(F.col("k").isNotNull())
    )


@register(
    "display_explode",
    oracle=TOKEN_EXPLODE_ORACLE,
    tags=("X2",),
    # rotated out of the driver window in round 11 (log_split_start +
    # props_json_extract keep the X-family in-window)
    past_window=True,
)
def display_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array flatten with parent-field injection (BaseLogTask.java:126-135).

    The reference emits one record per ``displays`` array element, copying
    the parent ``page_id`` onto each. Analog: explode the token array of
    ``documents.text``, injecting parent ``doc_id``/``source`` onto every
    element. ``explode`` is a generator inside whole-stage codegen — no
    shuffle, no Python.
    """
    documents = load_table(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        "source",
        F.explode(F.split("text", " ")).alias("token"),
    )


PROPS_VARIANT_ORACLE = """
SELECT event_id, event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       'OBJECT<k: BIGINT>' AS props_schema,
       CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket
FROM events
WHERE json_extract(props, '$.k') IS NOT NULL
"""


@register(
    "props_variant_extract",
    oracle=PROPS_VARIANT_ORACLE,
    tags=("P1", "json", "variant"),
    past_window=True,
)
def props_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4) — the
    shred-once successor to ``props_json_extract``'s per-field JSON
    path.

    ``get_json_object`` re-parses the JSON text once per extracted
    field; ``parse_json`` shreds the payload ONCE into a binary
    variant, and every ``variant_get`` after that is a typed offset
    read — the difference between O(fields) text parses and one. At
    100 TB the variant column is what you STORE (parse at ingest,
    typed access forever), exactly the decode-once discipline the
    media-fingerprint and shingle stores apply to their domains.
    ``schema_of_variant`` makes the shredded type itself an asserted
    output, so a payload drift (k arriving as a string) fails the hash
    instead of silently re-typing.
    """
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    return (
        events.select(
            "event_id",
            "event_type",
            k.alias("k"),
            F.schema_of_variant(v).alias("props_schema"),
            (k % 10).alias("k_bucket"),
        )
        .filter(F.col("k").isNotNull())
    )
