"""Streaming sources over the test tables + Kafka wiring.

S1 (``utils/MyKafkaUtil.java:25-30``) is the reference's only real
source. ``kafka_stream``/``kafka_sink`` carry that surface; tests and
the batch harness replay the same logical stream from parquet files with
``trigger(availableNow=True)`` — the reference's inline-fixture idiom
(S5, ``UserJumpDetailApp.java:59-69``) done with real sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gmall_flink_parent_spark.sources.tables import load_table

EVENTS_BASE_COLS = "event_id long, {ts}, user_id long, event_type string, value double, props string"


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded view of the events table (file source, one file = one replay).

    ``ts`` is normalized to a UTC micros timestamp **whatever the file's
    physical type is** — the fixture generator has shipped both
    nanos-as-long (int64) and ``timestamp[us]`` over time, and a
    hardcoded assumption silently shifts every event-time computation by
    1000×. A streaming source must declare its schema up front, so we
    probe the file's actual dtype with a zero-row batch read (schema
    only — no data scan) and branch exactly like the batch loader
    (``sources/tables.py``): bigint ⇒ nanos → truncate to micros;
    timestamp ⇒ cast through the UTC session TZ. Batch and streaming
    therefore share event-time semantics for any fixture vintage.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    probed = dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes)
    ts_is_long = probed.get("ts") == "bigint"
    schema = EVENTS_BASE_COLS.format(ts=f"ts {probed.get('ts', 'timestamp')}")
    # the file source watches a directory; single-file replay = glob filter
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if ts_is_long:
        return raw.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def kafka_stream(spark: SparkSession, brokers: str, topic: str, group: str) -> DataFrame:
    """Kafka string source (S1 — MyKafkaUtil.getKafkaSource analog).

    Returns (key, value) as strings; callers apply ``from_json`` with an
    explicit schema (P1). Requires the spark-sql-kafka package on the
    classpath — not present in this container, so tests use
    ``events_stream`` instead; the wiring is the deployment surface.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("kafka.group.id", group)
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
    )


def kafka_payload(df: DataFrame, topic: str | None = None) -> DataFrame:
    """Shape a frame for the Kafka sink: JSON value, plus a per-row
    ``topic`` column when no fixed topic is given (K2 — the reference's
    per-record topic serializer, ``app/dwd/BaseDbTask.java:81-82``,
    is a column Spark's sink honors natively). Unit-tested without a
    broker in ``tests/test_streaming.py``."""
    return df.select(
        *([F.col("topic")] if topic is None else []),
        F.to_json(F.struct(*[c for c in df.columns if c != "topic"])).alias("value"),
    )


def kafka_sink(df: DataFrame, brokers: str, checkpoint: str, topic: str | None = None):
    """Kafka sink (K1 fixed-topic / K2 dynamic-topic).

    If ``topic`` is None the frame must carry a ``topic`` column — Spark's
    Kafka sink honors it natively, replacing the reference's custom
    per-record serializer (``app/dwd/BaseDbTask.java:74-85``).
    Exactly-once ≈ checkpointed offsets + idempotent/transactional
    producer downstream (W7).
    """
    payload = kafka_payload(df, topic)
    writer = (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("checkpointLocation", checkpoint)
    )
    if topic is not None:
        writer = writer.option("topic", topic)
    return writer
