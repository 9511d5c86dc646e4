#!/usr/bin/env python
"""Micro-bench a subset of registry queries: `python tools/qbench.py
corpus_curation_stats dedup_minhash_lsh [--sf /root/testdata/sf0.1]
[--runs 3]`. Same warm+min-of-runs protocol as bench.py, scoped to the
named queries so a single-operator iteration loop is seconds, not the
full 28-query sweep."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wnv_etl_lab2_spark import get_spark
from wnv_etl_lab2_spark import queries as q


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="qbench", cpus=32, shuffle_partitions=32)
    q._ensure_loaded()
    warm = "/root/testdata/sf0.001"
    if not os.path.isdir(warm):
        warm = args.sf
    for name in args.names:
        q.REGISTRY[name].fn(spark, warm).write.mode("overwrite").format("noop").save()
    samples: dict[str, list[float]] = {n: [] for n in args.names}
    for _ in range(args.runs):
        for name in args.names:
            t0 = time.perf_counter()
            q.REGISTRY[name].fn(spark, args.sf).write.mode("overwrite").format(
                "noop"
            ).save()
            samples[name].append(time.perf_counter() - t0)
    for name, runs in samples.items():
        print(f"{name:32s} min={min(runs):.3f}  all={[round(r, 3) for r in runs]}")


if __name__ == "__main__":
    main()
