"""Local replica of the driver's correctness gate — thin CLI over
openlogreplicator_spark.oracle_check.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from openlogreplicator_spark.oracle_check import check_query, duckdb_connection
    from openlogreplicator_spark.queries import QUERIES
    from openlogreplicator_spark.session import build_session

    spark = build_session(app_name="check-oracle", cores=8, shuffle_partitions=16)
    con = duckdb_connection(sf_dir)

    failures = []
    n_run = 0
    for name in QUERIES:
        if only and name not in only:
            continue
        n_run += 1
        try:
            ok, msg = check_query(spark, con, name, sf_dir)
        except Exception as e:
            ok, msg = False, f"error: {e}"
        if not ok:
            failures.append(name)
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}")

    spark.stop()
    print(f"\n{n_run - len(failures)}/{n_run} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
