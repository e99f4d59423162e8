"""Data-layout evidence: what clustering the write buys the read path.

At 100 TB the dominant lever on scan cost is not the query plan — it is
whether the parquet files' row-group min/max statistics let the reader
SKIP data. This script makes that concrete on the events table: the
same rows written two ways, the same filtered aggregate read back, and
the row-group-level skip ratio measured from the parquet footers (the
statistics Spark's parquet reader uses for row-group pruning) plus the
wall-clock effect.

Layouts:

- ``shuffled``  — rows in hash-shuffled order (what a naive parallel
  write produces): every row group spans every event type and most of
  the time range, so min/max stats prune nothing.
- ``clustered`` — ``repartitionByRange(event_type, ts)`` +
  ``sortWithinPartitions(event_type, ts)`` (the cluster-by-write
  idiom: a global (type, time) order): a (type, day-range) predicate
  touches only the row groups whose stats overlap it.

Probe query: ``event_type = <hottest type> AND ts in a 7-day band`` →
count + exact decimal value sum (a scan-bound shape; any narrower and
setup noise dominates).

Prints ONE JSON line; the committed copy lives in LAYOUT.json.

Usage: python scripts/layout_pruning_bench.py [SF_DIR]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rowgroup_skip_stats(path_glob: str, event_type: str, lo, hi) -> dict:
    """Fraction of row groups whose footer stats CANNOT overlap the
    predicate — exactly the skip decision a stats-aware reader makes."""
    import pyarrow.parquet as pq

    total = skippable = rows_total = rows_skippable = 0
    for f in sorted(glob.glob(path_glob)):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            total += 1
            rows_total += g.num_rows
            st_t = g.column(names["event_type"]).statistics
            st_ts = g.column(names["ts"]).statistics
            skip = False
            if st_t is not None and st_t.has_min_max:
                if st_t.min > event_type or st_t.max < event_type:
                    skip = True
            if not skip and st_ts is not None and st_ts.has_min_max:
                # TIMESTAMP_MICROS stats come back tz-aware (UTC);
                # the probe bounds are session-UTC naive — same clock
                ts_min = st_ts.min.replace(tzinfo=None)
                ts_max = st_ts.max.replace(tzinfo=None)
                if ts_min > hi or ts_max < lo:
                    skip = True
            if skip:
                skippable += 1
                rows_skippable += g.num_rows
    return {
        "row_groups": total,
        "row_groups_skippable": skippable,
        "skip_fraction": round(skippable / total, 4) if total else None,
        "rows_skippable_fraction": (
            round(rows_skippable / rows_total, 4) if rows_total else None
        ),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from pyspark.sql import functions as F

    from gmall_flink_parent_spark.session import get_spark
    from gmall_flink_parent_spark.sources.tables import load_table

    spark = get_spark("layout-pruning-bench")
    events = load_table(spark, sf_dir, "events")

    # hottest type + a 7-day band inside the observed range
    probe = (
        events.groupBy("event_type").count().orderBy(F.desc("count")).first()
    )
    days = events.agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("lo")
    ).first()
    et = probe["event_type"]
    lo = days["lo"] + " 00:00:00"
    import datetime as dt

    hi = (
        dt.datetime.fromisoformat(days["lo"]) + dt.timedelta(days=7)
    ).strftime("%Y-%m-%d 00:00:00")

    base = "/tmp/layout_bench"
    shutil.rmtree(base, ignore_errors=True)
    # identical bytes of data, two physical orders. Row groups are
    # sized so the table has ~100s of them — at 100 TB row groups are
    # plentiful at the DEFAULT 128 MiB; the small test table needs a
    # proportionally small block size for the skip ratio to be about
    # layout rather than about having two groups total.
    # INT96 (Spark's default parquet timestamp) carries NO footer
    # statistics — with it, only the event_type stats can prune and the
    # time-band predicate contributes nothing. INT64 micros is what a
    # lakehouse write path uses precisely so time-range scans prune.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    block = {"parquet.block.size": str(256 << 10)}
    events.repartition(8).write.options(**block).parquet(f"{base}/shuffled")
    (
        events.repartitionByRange(8, F.col("event_type"), F.col("ts"))
        .sortWithinPartitions("event_type", "ts")
        .write.options(**block)
        .parquet(f"{base}/clustered")
    )

    out: dict = {"metric": "layout_pruning", "sf_dir": sf_dir,
                 "probe": {"event_type": et, "ts_lo": lo, "ts_hi": hi}}
    expect = None
    for layout in ("shuffled", "clustered"):
        path = f"{base}/{layout}"
        # footer-level truth: how many row groups a stats-aware reader skips
        stats = rowgroup_skip_stats(
            f"{path}/*.parquet",
            et,
            dt.datetime.fromisoformat(lo),
            dt.datetime.fromisoformat(hi),
        )
        # wall-clock: cold-ish read of the probe aggregate (3 reps, min)
        walls = []
        got = None
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            got = (
                spark.read.parquet(path)
                .filter(
                    (F.col("event_type") == et)
                    & (F.col("ts") >= F.lit(lo).cast("timestamp"))
                    & (F.col("ts") < F.lit(hi).cast("timestamp"))
                )
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
                )
                .collect()[0]
            )
            walls.append(time.monotonic() - t0)
        if expect is None:
            expect = (got["n"], got["s"])
        else:
            assert (got["n"], got["s"]) == expect, "layout changed the answer"
        out[layout] = {**stats, "probe_sec_min": round(min(walls), 3),
                       "probe_rows": got["n"]}

    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
