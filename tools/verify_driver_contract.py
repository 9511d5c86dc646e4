#!/usr/bin/env python
"""Driver-contract replica (the /verify surface-1 runner): t1 smoke via
`entry(spark)` on a VANILLA session, then the full t2 sweep — every
`queries()` entry executed at the given SF dir, oracle-backed entries
compared value-exactly against DuckDB via tests/oracle_harness.compare,
rows-only entries checked non-empty with a stable schema.

Usage: python tools/verify_driver_contract.py [sf_dir] [--skip-t1]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
    skip_t1 = "--skip-t1" in sys.argv
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    import __spark_entry__ as m
    from tests.oracle_harness import compare, run_oracle

    if not skip_t1:
        rows = m.entry(spark).collect()
        assert len(rows) > 0, "t1: entry() returned 0 rows"
        print(f"t1 OK: entry() -> {len(rows)} rows", flush=True)

    qs, osql = m.queries(), m.oracle_sql()
    failures: list[str] = []
    t_start = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.time()
        try:
            pdf = fn(spark, sf_dir).toPandas()
            if name in osql:
                compare(pdf, run_oracle(osql[name], sf_dir), name)
                status = f"MATCH ({len(pdf)} rows)"
            else:
                assert len(pdf) > 0 or sf_dir.endswith("0.1") and name in (
                    "spatial_buffer_erase", "spray_targets"
                ), f"{name}: empty rows-only result"
                status = f"rows-only ({len(pdf)} rows)"
        except Exception as e:  # noqa: BLE001
            status = f"FAIL: {e}"
            failures.append(name)
            traceback.print_exc()
        print(f"[{i + 1}/{len(qs)}] {name}: {status} [{time.time() - t0:.1f}s]", flush=True)
    print(
        f"done in {time.time() - t_start:.0f}s: {len(qs) - len(failures)}/{len(qs)} OK, "
        f"failures={failures}",
        flush=True,
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
