"""Full-registry oracle sweep at an arbitrary scale factor.

The local test suite checks oracle parity at sf0.001 (speed) and the
round driver checks its 50-query window at sf0.01; this script closes
the remaining gap by running EVERY oracle-backed registered query —
past-window entries included — against DuckDB at any SF, with the same
column-sorted, type-normalized comparison the harness uses, plus a
nonempty check for the rows-only queries.

Usage:
    python scripts/full_oracle_sweep.py [SF_DIR]

Default: /root/testdata/sf0.01 (the driver's correctness scale).
Prints one line per query and exits nonzero on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb

    from gmall_flink_parent_spark import plans
    from gmall_flink_parent_spark.session import get_spark
    from oracle_harness import assert_arrow_schema_matches, assert_matches_oracle

    spark = get_spark("full-oracle-sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures: list[tuple[str, str]] = []
    for name, spec in plans.all_queries().items():
        try:
            if spec.oracle is None:
                n = spec.fn(spark, sf_dir).count()
                assert n > 0, "rows-only query returned 0 rows"
                print(f"{name} OK rows-only ({n})", flush=True)
            else:
                # build the frame ONCE: both assertions execute it, and a
                # second spec.fn() call would re-run the whole query at
                # the larger SFs this script exists to cover
                df = spec.fn(spark, sf_dir)
                n = assert_matches_oracle(df, con, spec.oracle, name=name)
                assert_arrow_schema_matches(df, con, spec.oracle, name=name)
                print(f"{name} OK ({n})", flush=True)
        except Exception as ex:  # noqa: BLE001 — report every query, then fail
            failures.append((name, str(ex)[:300]))
            print(f"{name} FAIL {str(ex)[:160]}", flush=True)

    print(f"\n{len(failures)} failures" if failures else "\nall queries green")
    for name, err in failures:
        print(f"  {name}: {err}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
