"""WARC ingestion: a pure-Python Spark DataSource for web-crawl
archives.

The highest-volume input an LLM pretraining pipeline ever reads is the
Common Crawl WARC container, and Spark has no native reader for it.
Spark 4's Python DataSource API closes that without JVM code: this
module implements the WARC/1.0 record grammar (ISO 28500 — CRLF header
block, ``Content-Length`` payload, CRLF CRLF separator) over plain and
gzipped archives, with ONE INPUT PARTITION PER ARCHIVE FILE — the same
parallelism unit production crawls use (Common Crawl ships ~100 MB
.warc.gz segments precisely so a reader can scale by file count;
per-record splits are impossible in concatenated-gzip anyway).

Reference analog: the Kafka string source is the reference's only
ingest (SURVEY §2.1); this is the batch-corpus front door the Spark
engine adds, beside the JSONL one (``sources/documents.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

WARC_SCHEMA = (
    "warc_file string, record_seq long, warc_type string, "
    "target_uri string, content_length long, payload binary"
)


class WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _iter_warc_records(stream):
    """Parse WARC/1.0 records from a byte stream: (headers, payload).

    Strict on the envelope (a bad magic line raises with the offset —
    corrupt archives should fail loudly, the JSONL front door's
    quarantine is for row-grain dirt) but tolerant of arbitrary header
    order and of the optional trailing separators at EOF.
    """
    seq = 0
    while True:
        line = stream.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):  # inter-record separators
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"record {seq}: bad WARC magic {line[:20]!r}")
        headers = {}
        while True:
            h = stream.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            name, _, value = h.decode("utf-8", "replace").partition(":")
            headers[name.strip().lower()] = value.strip()
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        if len(payload) != length:
            raise ValueError(f"record {seq}: truncated payload")
        yield seq, headers, payload
        seq += 1


class WarcLiteReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warclite: the 'path' option is required")

    def partitions(self):
        import os

        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith((".warc", ".warc.gz"))
        )
        if not files:
            raise ValueError(f"warclite: no .warc/.warc.gz under {self.path}")
        return [WarcFilePartition(p) for p in files]

    def read(self, partition):
        import gzip
        import os

        opener = gzip.open if partition.path.endswith(".gz") else open
        fname = os.path.basename(partition.path)
        with opener(partition.path, "rb") as fh:
            for seq, headers, payload in _iter_warc_records(fh):
                yield (
                    fname,
                    seq,
                    headers.get("warc-type", ""),
                    headers.get("warc-target-uri", ""),
                    len(payload),
                    payload,
                )


class WarcLiteDataSource(DataSource):
    @classmethod
    def name(cls):
        return "warclite"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema):
        return WarcLiteReader(self.options)


def register_warc_source(spark: SparkSession) -> None:
    """Idempotently register the ``warclite`` format on the session."""
    spark.dataSource.register(WarcLiteDataSource)


def load_warc_documents(spark: SparkSession, path: str) -> DataFrame:
    """WARC response records as a documents-shaped frame — the bridge
    from the crawl container into every text head the engine has
    (dedup, quality, chunking, mixtures all key on this schema).

    doc_id is md5-derived from (file, seq) — stable across re-reads and
    collision-checked at corpus scale by the same birthday math as the
    dedup keys; text decodes as UTF-8 with replacement (crawl payloads
    lie about encodings; replacement keeps the row, the quality gates
    downstream decide its fate).
    """
    from pyspark.sql import functions as F

    register_warc_source(spark)
    raw = spark.read.format("warclite").option("path", path).load()
    # strict decode() raises on crawl dirt; cast keeps the raw bytes and
    # make_valid_utf8 rewrites invalid sequences to U+FFFD — the
    # replacement semantics every crawl pipeline uses
    text = F.expr("make_valid_utf8(CAST(payload AS STRING))")
    return raw.filter(F.col("warc_type") == "response").select(
        F.conv(F.substring(F.md5(F.concat_ws("#", "warc_file", "record_seq")), 1, 15), 16, 10)
        .cast("long")
        .alias("doc_id"),
        text.alias("text"),
        F.lit("und").alias("lang"),
        F.col("warc_file").alias("source"),
        F.length(text).alias("n_chars"),
    )


def warc_stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """STREAMING WARC front door: new crawl segments landing under
    ``path`` become micro-batches of documents-schema rows.

    Composition instead of a custom stream reader: the built-in
    ``binaryFile`` source already owns file-arrival semantics
    (checkpointed file tracking, ``maxFilesPerTrigger`` batching,
    exactly-once file accounting), and each whole segment file feeds
    the SAME ``_iter_warc_records`` grammar the batch reader uses —
    one parser, two front doors, so batch and stream cannot drift
    (parity-pinned). Whole-file rows are the right granule for WARC
    (concatenated gzip is unsplittable — the batch reader's partition
    unit too); the parse runs in Arrow batches via ``mapInPandas``,
    never per-row Python.

    Output matches ``load_warc_documents`` exactly: stable md5 doc ids
    from (file, seq), replacement-decoded text. Feed it to
    ``curation_ingest_job`` / any ``*_store_job`` for
    fingerprint-at-ingest over a live crawl.
    """
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .load(path)
    )

    def parse(batches):
        import gzip
        import io
        import os

        import pandas as pd

        for pdf in batches:
            out = {"warc_file": [], "record_seq": [], "warc_type": [], "payload": []}
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if p.endswith(".gz"):
                    data = gzip.decompress(data)
                fname = os.path.basename(p)
                for seq, headers, payload in _iter_warc_records(io.BytesIO(data)):
                    out["warc_file"].append(fname)
                    out["record_seq"].append(seq)
                    out["warc_type"].append(headers.get("warc-type", ""))
                    out["payload"].append(payload)
            yield pd.DataFrame(out)

    recs = stream.mapInPandas(
        parse, schema="warc_file string, record_seq long, warc_type string, payload binary"
    )
    text = F.expr("make_valid_utf8(CAST(payload AS STRING))")
    return recs.filter(F.col("warc_type") == "response").select(
        F.conv(F.substring(F.md5(F.concat_ws("#", "warc_file", "record_seq")), 1, 15), 16, 10)
        .cast("long")
        .alias("doc_id"),
        text.alias("text"),
        F.lit("und").alias("lang"),
        F.col("warc_file").alias("source"),
        F.length(text).alias("n_chars"),
    )
