"""JSONL corpus ingestion — the format LLM training corpora actually
arrive in (one JSON document per line, usually gzipped).

The reference ingests via Kafka/HTTP (SURVEY §2.1); a training-data
engine's front door is files: `documents.jsonl.gz` drops from a crawler
or a vendor, and the first pipeline stage is parse + validate + type.
This module is that stage, Spark-native:

- **Explicit schema, never inference.** Schema inference reads the data
  twice and silently unions conflicting types across files; at 100 TB
  the extra pass alone is disqualifying. The documents schema is pinned
  and malformed lines are CAPTURED, not dropped (`PERMISSIVE` +
  `columnNameOfCorruptRecord`), so ingest can quarantine and count them
  — silently losing 0.1% of a crawl is how bias sneaks into a corpus.
- **gzip/zstd transparency.** Spark decompresses by extension; `.gz` is
  not splittable, so at scale the unit of parallelism is the FILE — the
  standard corpus layout (many ~100 MB-1 GB shards) is exactly what the
  scan wants, and `fan_out` repairs the few-huge-files case.
- **Batch and streaming from one schema.** The same pinned schema
  drives `spark.read.json` (backfill) and `spark.readStream.json`
  (ingest-directory watching for `curation_ingest_job` and friends).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The documents-table contract (TESTDATA.md): doc_id/text required,
# lang/source optional metadata, n_chars derivable.
_CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField(_CORRUPT_COL, T.StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """Read a JSONL(.gz) documents corpus with the pinned schema.

    Returns the RAW typed frame including the ``_corrupt_record``
    column — route it through ``split_corrupt`` to separate clean rows
    from quarantine rows. ``streaming=True`` returns the readStream
    form over the same schema (an ingest directory the streaming jobs
    watch); file-source streaming tracks processed files in the
    checkpoint, so a crashed ingest resumes without re-parsing.
    """
    reader = spark.readStream if streaming else spark.read
    return (
        reader.schema(DOCUMENTS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT_COL)
        .json(path)
    )


def split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) from a ``read_documents_jsonl`` frame.

    A row is quarantined when the line failed to parse OR the required
    fields are missing/null after parsing — both are data-loss events an
    ingest run must COUNT, not swallow. Clean rows get ``n_chars``
    derived when the file didn't carry it, so downstream operators see
    the full documents contract either way. Both frames are narrow
    filters over the one scan — no shuffle, no second read.
    """
    bad = F.col(_CORRUPT_COL).isNotNull() | F.col("doc_id").isNull() | F.col(
        "text"
    ).isNull()
    clean = (
        raw.filter(~bad)
        .withColumn("n_chars", F.coalesce(F.col("n_chars"), F.length("text")))
        .drop(_CORRUPT_COL)
    )
    quarantine = raw.filter(bad).select(
        F.coalesce(F.col(_CORRUPT_COL), F.to_json(F.struct("doc_id", "text"))).alias(
            "raw_line"
        ),
        F.col(_CORRUPT_COL).isNotNull().alias("parse_failed"),
    )
    return clean, quarantine
