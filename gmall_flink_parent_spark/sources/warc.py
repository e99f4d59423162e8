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

# Synthetic per-archive summary row emitted in quarantine mode:
# content_length carries the malformed-record count for the archive
# (0 included, so the counts frame covers EVERY archive read).
QUARANTINE_TYPE = "warclite/quarantine"


class WarcFilePartition(InputPartition):
    def __init__(self, path: str, rel: str):
        self.path = path
        self.rel = rel


def _resolve_warc_paths(path: str) -> list[tuple[str, str]]:
    """Resolve the ``path`` option to sorted (absolute, archive-name)
    pairs. Accepts a direct file, a directory (RECURSIVE walk — crawl
    drops arrive as nested ``dump/segment/part.warc.gz`` trees), or a
    glob pattern (``**`` supported). The archive name is the path
    relative to the directory/glob root (flat layouts: the basename,
    unchanged) so two segments named ``part-0.warc.gz`` in different
    subdirs keep distinct names — doc_id derives from (name, seq) and
    MUST NOT collide across a tree."""
    import glob as globlib
    import os

    if any(ch in path for ch in "*?["):
        # static prefix of the pattern = the root the names are relative to
        root = path
        while any(ch in root for ch in "*?["):
            root = os.path.dirname(root)
        files = [
            p
            for p in globlib.glob(path, recursive=True)
            if p.endswith((".warc", ".warc.gz")) and os.path.isfile(p)
        ]
    elif os.path.isfile(path):
        return [(path, os.path.basename(path))]
    else:
        root = path
        files = [
            os.path.join(r, f)
            for r, _dirs, fns in os.walk(path)
            for f in fns
            if f.endswith((".warc", ".warc.gz"))
        ]
    return sorted(
        (p, os.path.relpath(p, root).replace(os.sep, "/")) for p in files
    )


def _iter_warc_records(stream, strict: bool = True, stats: dict | None = None):
    """Parse WARC/1.0 records from a byte stream: (seq, headers, payload).

    ``strict=True`` (default): a bad magic line or truncated payload
    raises with the offset — corrupt archives fail loudly.

    ``strict=False`` (quarantine mode): a malformed record is COUNTED in
    ``stats["malformed"]`` and skipped — on bad magic the parser resyncs
    by scanning forward to the next ``WARC/`` line; on a truncated tail
    it stops the archive. One bad crawl segment must not kill a 100 TB
    ingest; the counts surface per-archive so the loss is measured, not
    silent (the JSONL front door's quarantine contract).
    """
    if stats is None:
        stats = {}
    stats.setdefault("malformed", 0)
    seq = 0
    line = None  # carries a resync'd magic line across iterations
    # After a bad Content-Length the record's payload is left unconsumed
    # in the stream; the resync scan that swallows it belongs to the SAME
    # physical record, so its increment is suppressed once — otherwise
    # one broken record would count as two malformed entries.
    counted_this_desync = False
    while True:
        if line is None:
            line = stream.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):  # inter-record separators
            line = None
            continue
        if not line.startswith(b"WARC/"):
            if strict:
                raise ValueError(f"record {seq}: bad WARC magic {line[:20]!r}")
            # desync: count one malformed record (unless this scan is the
            # abandoned payload of a record already counted at its bad
            # Content-Length), then scan to the next magic
            if not counted_this_desync:
                stats["malformed"] += 1
            counted_this_desync = False
            while line and not line.startswith(b"WARC/"):
                line = stream.readline()
            continue
        counted_this_desync = False  # a clean record start ends the desync
        line = None
        headers = {}
        while True:
            h = stream.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            name, _, value = h.decode("utf-8", "replace").partition(":")
            headers[name.strip().lower()] = value.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            if strict:
                raise ValueError(f"record {seq}: bad Content-Length")
            stats["malformed"] += 1
            counted_this_desync = True  # the resync scan must not re-count
            continue  # next readline resyncs if this desyncs the stream
        payload = stream.read(length)
        if len(payload) != length:
            if strict:
                raise ValueError(f"record {seq}: truncated payload")
            stats["malformed"] += 1
            return  # truncated tail: nothing left to resync to
        yield seq, headers, payload
        seq += 1


class WarcLiteReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warclite: the 'path' option is required")
        mode = options.get("mode", "strict")
        if mode not in ("strict", "quarantine"):
            raise ValueError(f"warclite: mode must be strict|quarantine, got {mode}")
        self.strict = mode == "strict"

    def partitions(self):
        files = _resolve_warc_paths(self.path)
        if not files:
            raise ValueError(f"warclite: no .warc/.warc.gz under {self.path}")
        return [WarcFilePartition(p, rel) for p, rel in files]

    def read(self, partition):
        import gzip

        opener = gzip.open if partition.path.endswith(".gz") else open
        fname = partition.rel
        stats: dict = {}
        with opener(partition.path, "rb") as fh:
            for seq, headers, payload in _iter_warc_records(
                fh, strict=self.strict, stats=stats
            ):
                yield (
                    fname,
                    seq,
                    headers.get("warc-type", ""),
                    headers.get("warc-target-uri", ""),
                    len(payload),
                    payload,
                )
        if not self.strict:
            # per-archive quarantine summary (count 0 included): the
            # manifest row downstream ingest aggregates loss from
            yield (fname, -1, QUARANTINE_TYPE, "", stats["malformed"], b"")


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


def warc_quarantine_counts(raw: DataFrame) -> DataFrame:
    """Per-archive malformed-record counts from a quarantine-mode read:
    (warc_file, n_malformed), one row per archive including clean ones
    (count 0) — the ingest-manifest frame that proves how much of the
    crawl was lost to dirt instead of losing it silently."""
    from pyspark.sql import functions as F

    return raw.filter(F.col("warc_type") == QUARANTINE_TYPE).select(
        "warc_file", F.col("content_length").alias("n_malformed")
    )


def load_warc_documents(
    spark: SparkSession, path: str, mode: str = "strict"
) -> DataFrame:
    """WARC response records as a documents-shaped frame — the bridge
    from the crawl container into every text head the engine has
    (dedup, quality, chunking, mixtures all key on this schema).

    doc_id is md5-derived from (file, seq) — stable across re-reads and
    collision-checked at corpus scale by the same birthday math as the
    dedup keys; text decodes as UTF-8 with replacement (crawl payloads
    lie about encodings; replacement keeps the row, the quality gates
    downstream decide its fate). ``path`` may be a file, a directory
    (recursive), or a glob; ``mode="quarantine"`` counts-and-skips
    malformed records per archive instead of failing the read (pull the
    counts with ``warc_quarantine_counts`` on the raw warclite frame).
    """
    from pyspark.sql import functions as F

    register_warc_source(spark)
    raw = (
        spark.read.format("warclite")
        .option("path", path)
        .option("mode", mode)
        .load()
    )
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


def warc_stream_documents(
    spark: SparkSession, path: str, mode: str = "strict"
) -> DataFrame:
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
    from (file, seq), replacement-decoded text (archive names are the
    path relative to the watch root, matching the batch door's naming
    across nested segment trees). Feed it to ``curation_ingest_job`` /
    any ``*_store_job`` for fingerprint-at-ingest over a live crawl.
    ``mode="quarantine"`` counts-and-skips malformed records per segment
    (the batch door's contract) instead of failing the micro-batch.
    """
    import os as _os

    from pyspark.sql import functions as F

    stream = (
        spark.readStream.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .option("recursiveFileLookup", "true")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .load(path)
    )
    strict = mode == "strict"
    root = _os.path.abspath(path)

    def parse(batches):
        import gzip
        import io

        import pandas as pd

        def rel_name(p: str) -> str:
            # binaryFile yields file:/abs/path URIs; name = path under root
            local = p[5:] if p.startswith("file:") else p
            local = "/" + local.lstrip("/")
            prefix = root.rstrip("/") + "/"
            return local[len(prefix):] if local.startswith(prefix) else local.rsplit("/", 1)[-1]

        for pdf in batches:
            out = {
                "warc_file": [],
                "record_seq": [],
                "warc_type": [],
                "content_length": [],
                "payload": [],
            }
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if p.endswith(".gz"):
                    data = gzip.decompress(data)
                fname = rel_name(p)
                stats: dict = {}
                for seq, headers, payload in _iter_warc_records(
                    io.BytesIO(data), strict=strict, stats=stats
                ):
                    out["warc_file"].append(fname)
                    out["record_seq"].append(seq)
                    out["warc_type"].append(headers.get("warc-type", ""))
                    out["content_length"].append(len(payload))
                    out["payload"].append(payload)
                if not strict:
                    # same summary contract as the batch door: the count
                    # rides content_length, warc_quarantine_counts works
                    # on either frame
                    out["warc_file"].append(fname)
                    out["record_seq"].append(-1)
                    out["warc_type"].append(QUARANTINE_TYPE)
                    out["content_length"].append(stats.get("malformed", 0))
                    out["payload"].append(b"")
            yield pd.DataFrame(out)

    recs = stream.mapInPandas(
        parse,
        schema=(
            "warc_file string, record_seq long, warc_type string, "
            "content_length long, payload binary"
        ),
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
