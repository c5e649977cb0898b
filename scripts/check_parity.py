"""Run every registered query against its DuckDB oracle and print a report.

Usage: python scripts/check_parity.py [sf_dir] [name_filter ...]
Mirrors the driver's per-round correctness check; run at sf0.01 before
claiming a query done.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_1_3_2_hopsworks_spark import get_spark, registry
from flink_1_3_2_hopsworks_spark.testing.parity import compare, duckdb_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filters = sys.argv[2:]
    spark = get_spark()
    qs = registry.queries()
    oracles = registry.oracle_sql()
    con = duckdb_connection(sf_dir)
    failures = 0
    for name, fn in sorted(qs.items()):
        if name_filters and not any(f in name for f in name_filters):
            continue
        t0 = time.time()
        try:
            res = compare(name, spark, sf_dir, fn, oracles.get(name), con=con)
        except Exception as exc:  # noqa: BLE001 — report and keep going
            print(f"ERROR {name}: {type(exc).__name__}: {exc}")
            failures += 1
            continue
        dt = time.time() - t0
        status = "OK  " if res.ok else "FAIL"
        print(f"{status} {name}: spark={res.spark_rows} oracle={res.oracle_rows} "
              f"({dt:.1f}s) {res.detail}")
        if not res.ok:
            failures += 1
            for m in res.mismatches:
                print(f"     {m}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
