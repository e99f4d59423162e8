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
