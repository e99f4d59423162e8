"""Measured evidence for the bucketing claim in SCALE.md/DEPLOY.md.

Writes orders/lineitem (sf0.1) twice — plain parquet and
bucketed+sorted on the order key — and times the fact-fact join-count
on each layout with broadcast disabled (the big-fact regime where the
join must be sort-merge). The bucketed layout plans ZERO exchanges and
skips both sorts; the plain layout shuffles and sorts both sides every
run. min-of-``reps`` per layout, one JSON line out; results land in
SCALE.md.

Usage: python scripts/bucketed_join_bench.py [n_buckets]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_parent_spark.session import get_spark
from gmall_flink_parent_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _exchanges(df) -> int:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().count("Exchange")


def main() -> None:
    n_buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = 3
    spark = get_spark("bucketed-join-bench")
    spark.sparkContext.setLogLevel("ERROR")
    saved_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    tmp = tempfile.mkdtemp(prefix="bucketbench_")
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    try:
        orders.write.mode("overwrite").parquet(f"{tmp}/o_plain")
        li.write.mode("overwrite").parquet(f"{tmp}/l_plain")
        for name in ("bb_orders", "bb_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        orders.write.bucketBy(n_buckets, "o_orderkey").sortBy("o_orderkey").option(
            "path", f"{tmp}/o_bucketed"
        ).mode("overwrite").saveAsTable("bb_orders")
        li.write.bucketBy(n_buckets, "l_orderkey").sortBy("l_orderkey").option(
            "path", f"{tmp}/l_bucketed"
        ).mode("overwrite").saveAsTable("bb_lineitem")

        def joined(layout: str):
            if layout == "plain":
                o = spark.read.parquet(f"{tmp}/o_plain")
                l = spark.read.parquet(f"{tmp}/l_plain")
            else:
                o, l = spark.table("bb_orders"), spark.table("bb_lineitem")
            return o.join(l, o["o_orderkey"] == l["l_orderkey"])

        out = {"sf_dir": SF_DIR, "n_buckets": n_buckets}
        counts = set()
        for layout in ("plain", "bucketed"):
            out[f"{layout}_exchanges"] = _exchanges(joined(layout))
            times = []
            for _ in range(reps):
                t0 = time.time()
                counts.add(joined(layout).count())
                times.append(round(time.time() - t0, 2))
            out[f"{layout}_sec"] = min(times)
            out[f"{layout}_times"] = times
        assert len(counts) == 1, "layouts disagree on the join result"
        out["rows"] = counts.pop()
        print(json.dumps(out))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_threshold)
        for name in ("bb_orders", "bb_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
