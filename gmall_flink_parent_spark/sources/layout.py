"""Storage layout: range-clustered parquet writes.

At 100 TB the cheapest scan is the one that never happens: parquet
readers prune whole files and row groups from footer min/max
statistics, but only if the WRITER put correlated values together. A
table written in arrival order has every file spanning the whole key
range — min/max prunes nothing; the same rows range-clustered on the
query key give each file a narrow, disjoint range, so a selective
predicate touches O(selectivity) files instead of all of them.

The reference has no batch storage tier at all (sinks are Kafka /
Phoenix rows, SURVEY §2.3); this is the capability a Spark warehouse
adds on top. `write_training_shards` (``functions/mixture.py``) is the
training-stream-specific instance of the same discipline; this module
is the general table form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_range_clustered(
    df: DataFrame, path: str, cols: list[str], n_files: int | None = None
) -> None:
    """Write ``df`` as parquet range-clustered on ``cols``.

    ``repartitionByRange`` samples the key distribution and assigns
    each output file a contiguous, BALANCED key range (skewed keys
    split across range boundaries instead of hot-spotting one file);
    ``sortWithinPartitions`` orders rows inside each file so ROW-GROUP
    stats are narrow too — both levels of the reader's pruning
    hierarchy get real ranges. One shuffle, the same cost a plain
    ``repartition(n)`` write would pay, but the footers come out
    disjoint (pinned by the pyarrow footer test) instead of
    all-overlapping.
    """
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    # Spark's default timestamp physical type is INT96, which carries NO
    # parquet min/max statistics — a clustered layout written that way
    # is unprunable no matter how well sorted. Force INT64 micros (the
    # modern type every reader pruning path understands).
    df.sparkSession.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def footer_ranges(path: str, col: str) -> list[tuple]:
    """Per-file (min, max) of ``col`` read from parquet FOOTERS only —
    the exact metadata a pruning reader consults; no row is decoded."""
    import os

    import pyarrow.parquet as pq

    out = []
    for fn in sorted(os.listdir(path)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        idx = md.schema.names.index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return []  # stats missing → caller treats as unprunable
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((_naive(lo), _naive(hi)))
    return out


def _naive(v):
    """Normalize footer stats to tz-naive: Spark writes TIMESTAMP_MICROS
    as UTC-adjusted (stats decode tz-aware) while the session reads the
    same instants as naive wall times under the pinned UTC session tz —
    one convention for comparisons."""
    import datetime

    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return v.replace(tzinfo=None)
    return v


def pruned_fraction(ranges: list[tuple], lo, hi) -> float:
    """Fraction of files a [lo, hi] predicate can skip from footers
    alone — the observable the clustered layout exists to maximize."""
    if not ranges:
        return 0.0
    skipped = sum(1 for mn, mx in ranges if mx < lo or mn > hi)
    return skipped / len(ranges)


def write_zorder_clustered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int | None = None
) -> None:
    """Write ``df`` parquet clustered on the Z-ORDER (Morton) curve of
    two columns — multi-dimensional pruning when queries slice on
    EITHER key.

    Range-clustering on one key makes the other key's footer ranges as
    wide as the table (a ``user_id`` slice over a ``ts``-clustered
    table prunes nothing). Interleaving the bits of the two keys' 16-bit
    normalized ranks puts rows close in BOTH dimensions into the same
    file, so each file's footer range is narrow on each column —
    neither as narrow as single-key clustering would make its own key,
    but BOTH prunable (the pinned test demands real skipping on each).

    Normalization is min/max from a 1-row aggregate (broadcast
    literals, no second pass over the data at write time beyond the
    range shuffle every clustered write pays). Timestamps normalize
    through their epoch micros. This is the hand-rolled form of Delta/
    Iceberg ``ZORDER BY`` — built from the same ``repartitionByRange``
    + footer-stats primitives as ``write_range_clustered``.
    """
    from pyspark.sql import functions as F

    def as_long(c: str):
        col = F.col(c)
        return F.unix_micros(col) if dict(df.dtypes)[c] == "timestamp" else col.cast("long")

    stats = df.agg(
        F.min(as_long(col_a)).alias("amin"),
        F.max(as_long(col_a)).alias("amax"),
        F.min(as_long(col_b)).alias("bmin"),
        F.max(as_long(col_b)).alias("bmax"),
    ).collect()[0]

    def rank16(c: str, lo: int, hi: int):
        span = max(hi - lo, 1)
        return ((as_long(c) - F.lit(lo)) * 65535 / F.lit(span)).cast("long")

    ra = rank16(col_a, stats.amin, stats.amax)
    rb = rank16(col_b, stats.bmin, stats.bmax)
    morton = F.lit(0).cast("long")
    for bit in range(16):
        morton = morton.bitwiseOR(
            F.shiftleft(F.shiftright(ra, bit).bitwiseAND(F.lit(1)), 2 * bit + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(rb, bit).bitwiseAND(F.lit(1)), 2 * bit)
        )
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    df.sparkSession.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    (
        df.withColumn("__z", morton)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
