"""Oracle-check a SUBSET of registered queries — the per-change loop of
the optimization round (full_oracle_sweep.py covers the whole registry).

Usage: python scripts/oracle_check.py [--sf DIR] q1 q2 ...
Same comparison as the harness: row count + Arrow schema + order-
insensitive value hash vs DuckDB; rows-only queries get a nonempty check.
"""

from __future__ import annotations

import argparse
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tests"))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb

    from gmall_flink_parent_spark import plans
    from gmall_flink_parent_spark.session import get_spark
    from oracle_harness import assert_arrow_schema_matches, assert_matches_oracle

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    specs = plans.all_queries()
    failures = []
    for name in args.names:
        spec = specs[name]
        try:
            if spec.oracle is None:
                n = spec.fn(spark, args.sf).count()
                assert n > 0, "rows-only query returned 0 rows"
                print(f"{name} OK rows-only ({n})", flush=True)
            else:
                df = spec.fn(spark, args.sf)
                n = assert_matches_oracle(df, con, spec.oracle, name=name)
                assert_arrow_schema_matches(df, con, spec.oracle, name=name)
                print(f"{name} OK ({n})", flush=True)
        except Exception as ex:  # noqa: BLE001
            failures.append((name, str(ex)[:300]))
            print(f"{name} FAIL {str(ex)[:200]}", flush=True)
    print(f"{len(failures)} failures" if failures else "all green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
