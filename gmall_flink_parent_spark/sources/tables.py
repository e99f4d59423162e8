"""Batch parquet sources over the driver-generated test tables.

Reference analog: the Kafka string source (S1,
``gmall-realtime/.../utils/MyKafkaUtil.java:25-30``) is the reference's
only real source; our batch harness reads the same logical tables from
parquet so Catalyst gets columnar scans with predicate pushdown and
column pruning — at 100 TB this is partition-pruned, vectorized I/O
rather than a per-record consumer loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables eligible for broadcast in enrichment joins
# (reference's Redis-cached async dim lookups, utils/DimUtil.java:31-87,
# become broadcast hash joins). region/nation are BOUNDED (25/5 rows at
# any scale factor — the TPC-H spec fixes them); customer/supplier/part
# GROW with the fact data, so broadcasting them is only safe behind the
# size gate below (``gated_broadcast``).
BROADCAST_DIMS = ("region", "nation", "customer", "supplier", "part")
BOUNDED_DIMS = ("region", "nation")

# Gate for broadcasting an sf-PROPORTIONAL table: broadcast only while
# its parquet footprint stays under this many compressed bytes. 128 MiB
# parquet inflates to roughly 0.5 GB as a long-lived in-memory hash
# relation (dictionary + row overhead ~4×) — comfortably under Spark's
# 8 GB broadcast hard limit and small enough that several concurrent
# broadcasts don't evict the executor block cache. Above the gate the
# hint is DROPPED (not replaced with a shuffle hint): AQE's runtime
# size-based strategy then decides, which is exactly the fallback a
# hard ``F.broadcast`` would have overridden.
DIM_BROADCAST_MAX_BYTES = 128 << 20


def table_parquet_bytes(sf_dir: str, name: str) -> int | None:
    """Compressed on-disk bytes of ``{sf_dir}/{name}.parquet`` — a
    driver-side filesystem metadata read, launching NO Spark job
    (same discipline as ``streaming.store.store_row_count``).
    Returns ``None`` when the path has no parquet files (caller must
    then fail safe: no broadcast hint).
    """
    import pathlib

    root = pathlib.Path(sf_dir) / f"{name}.parquet"
    if root.is_file():
        return root.stat().st_size
    if not root.is_dir():
        return None
    total = 0
    n_files = 0
    for f in root.rglob("*.parquet"):
        total += f.stat().st_size
        n_files += 1
    return total if n_files else None


def gated_broadcast(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    df: DataFrame | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Size-gated broadcast hint for a dim-side frame backed by table
    ``name`` — the scale-safe replacement for a bare ``F.broadcast``.

    ``df`` may be the table itself or any frame DERIVED from it by
    filters/projections/per-key aggregation (e.g. a customer-grain
    enrichment frame): those only shrink the data, so the backing
    table's parquet footprint is an upper bound on the broadcast size.
    The bound is read from file metadata on the driver (no job). Bounded
    dims (nation/region — fixed row counts at every scale factor) always
    broadcast; sf-proportional tables broadcast only under the byte
    gate, and when the gate trips (or the path can't be measured) the
    frame is returned WITHOUT any hint so AQE's runtime statistics pick
    the join strategy.

    This answers the 100×-scale question a hard hint cannot: at bench
    scale every dim passes the gate and the plan is identical; at a
    scale where ``part`` is gigabytes, the hint silently disappears
    instead of overriding AQE into an executor-OOM broadcast.
    """
    if df is None:
        df = load_table(spark, sf_dir, name)
    if name in BOUNDED_DIMS:
        return F.broadcast(df)
    if max_bytes is None:
        # resolved at call time (not def time) so tests can trip the
        # gate on any registered head by patching the module constant
        max_bytes = DIM_BROADCAST_MAX_BYTES
    size = table_parquet_bytes(sf_dir, name)
    if size is not None and size <= max_bytes:
        return F.broadcast(df)
    return df


# The driver-generated parquet stores TIMESTAMP(NANOS) (pyarrow default),
# which Spark's vectorized reader rejects; we read nanos as long
# (legacy flag) and truncate to microsecond TimestampType — the same
# truncation DuckDB applies, so event-time semantics agree across engines.
TS_COLUMNS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


# Session-scoped DataFrame HANDLE cache: (session, absolute path, file
# signature) → the lazily-planned frame. This memoizes plan METADATA
# only — ``spark.read.parquet`` (file listing + footer schema read),
# the dtypes analysis, and the timestamp-repair expressions — never
# rows: every action on the returned frame still scans the parquet
# from disk, so repeated bench/oracle invocations recompute from the
# inputs exactly as before. Measured ~130–170 ms per uncached call on
# this host; a 175-head bench sweep makes ~300 load_table calls (~40 s
# of pure driver-side re-planning of the same ten tables). The file
# signature (mtime_ns, size — or the directory mtime for multi-file
# tables, whose name set changes on any Spark overwrite) invalidates
# the handle when a test rewrites the path; the session object rides
# in the value so a stopped session's entries can never be revived by
# an id() collision.
_HANDLE_CACHE: dict[tuple[int, str, tuple[int, int] | None], tuple[SparkSession, DataFrame]] = {}
_HANDLE_CACHE_MAX = 256


def _path_sig(path: str) -> tuple[int, int] | None:
    import os

    try:
        st = os.stat(path)
    except OSError:
        return None
    return (st.st_mtime_ns, st.st_size)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one logical table from ``{sf_dir}/{name}.parquet``."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Event-time semantics are UTC-naive (parquet NTZ / DuckDB naive);
    # pin the session so day-bucketing agrees regardless of host TZ.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import os

    path = f"{sf_dir}/{name}.parquet"
    sig = _path_sig(path)
    key = (id(spark), os.path.abspath(path), sig)
    hit = _HANDLE_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for c in TS_COLUMNS.get(name, ()):
        if dtypes.get(c) == "bigint":  # nanos-as-long → truncate to micros
            df = df.withColumn(c, F.expr(f"timestamp_micros(CAST({c} DIV 1000 AS BIGINT))"))
        else:  # TIMESTAMP_NTZ → session-TZ timestamp (UTC, so same wall time)
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    if sig is not None:
        if len(_HANDLE_CACHE) >= _HANDLE_CACHE_MAX:
            _HANDLE_CACHE.clear()
        _HANDLE_CACHE[key] = (spark, df)
    return df


_SIZE_UNITS = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}

# Stream codecs Spark cannot split mid-file (Hadoop SplittableCompressionCodec
# is only bzip2): one scan task per file regardless of size. Parquet/ORC are
# container formats and stay splittable whatever their internal compression.
_UNSPLITTABLE_SUFFIXES = (".gz", ".gzip", ".deflate", ".zst", ".lz4", ".snappy")


def _parse_bytes(s: str) -> int:
    """Spark byte-size conf string ('128m', '134217728b', '1g') → bytes."""
    s = s.strip().lower()
    for suffix in ("kb", "mb", "gb", "tb", "k", "m", "g", "t", "b"):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * _SIZE_UNITS[suffix[0]])
    return int(s)


def fan_out(spark: SparkSession, df: DataFrame, *keys: str) -> DataFrame:
    """Parallelism repair before a compute-dense stage: repartition IFF
    the scan has fewer partitions than the cluster has cores —
    round-robin by default, HASH on ``keys`` when given.

    Pass ``keys`` when the next operation clusters by those columns
    (``groupBy(*keys)``, a join key): the repair's exchange then IS the
    exchange the downstream aggregation/join needed, so the repaired
    plan still carries ONE exchange (the aggregate's partial/final pair
    fuses into one wide stage on top of it) — where the round-robin form
    would add a second. Keyed repair also skips round-robin's
    sort-before-repartition pass (hash placement is already
    deterministic under task retry).

    Single-file / single-row-group inputs scan as ONE task, and a
    broadcast join or per-row expression stage inherits that parallelism
    — one core does all the work while 31 idle (measured 4-10× slowdowns
    on the pair-generation joins at sf0.1). When the per-partition cost
    is CPU (quadratic joins, JSON codec, 64-term dot products), a cheap
    shuffle of the input buys full-width execution. The guard makes this
    a **no-op at real scale**: a 100 TB table scans as thousands of
    splits, already ≥ cores, so no shuffle is ever added — the repair
    only fires when the data is too small for the cluster, which is
    exactly when the shuffle is cheapest.

    The guard estimates the scan's task count from file metadata
    (``inputFiles`` + FS file sizes) by mirroring Spark's own
    FilePartition packing — ``maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, totalBytes/parallelism))`` with every file
    padded by ``openCostInBytes`` — instead of ``df.rdd.
    getNumPartitions()``, which would force full physical planning of
    the frame once per call. Counting raw files would overestimate:
    many tiny files bin-pack into few FilePartitions, exactly the
    single-digit-task scans this repair exists for.
    """
    target = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if files:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        max_pb = _parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
        open_cost = _parse_bytes(
            spark.conf.get("spark.sql.files.openCostInBytes", "4m")
        )
        total = packed = n_unsplit = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            size = p.getFileSystem(hconf).getFileStatus(p).getLen()
            total += size + open_cost
            # A stream-codec file is ONE task however large it is; only
            # splittable bytes participate in FilePartition packing.
            if f.endswith(_UNSPLITTABLE_SUFFIXES):
                n_unsplit += 1
            else:
                packed += size + open_cost
            if n_unsplit + packed // max_pb >= target:
                # maxSplitBytes ≤ maxPartitionBytes, so this lower bound
                # already guarantees ≥ target tasks — stop statting
                # (keeps the guard O(1)-ish on thousand-file scans).
                return df
        bytes_per_core = max(1, total // target)
        max_split = min(max_pb, max(open_cost, bytes_per_core))
        if n_unsplit + -(-packed // max_split) >= target:  # ceil: est. tasks
            return df
    # Small scan (or file-less in-memory frame) — but an upstream shuffle
    # may already have widened the plan beyond what its files imply, so
    # confirm with the planned partition count before adding a shuffle.
    # Only reached in the small-data regime (big scans exit above on
    # metadata alone), so the physical planning this forces is cheap by
    # construction.
    if df.rdd.getNumPartitions() >= target:
        return df
    if keys:
        return df.repartition(target, *[F.col(k) for k in keys])
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read all test tables as a name → DataFrame dict."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
