"""Rate-limited external-enrichment operator (reference O4/O5).

The reference geocodes one address per second through the Nominatim
REST API inside its row loop (`Lab2ETL.py:22-45,72` — the pipeline's
entire cost model, SURVEY.md §6). Here enrichment is an interface with
two implementations:

- lookup_join_enrich: the production/test path — a broadcast join
  against a lookup table (deterministic, oracle-checkable, and the
  100 TB design: precompute/caches beat live HTTP at any scale).
- rate_limited_enrich: the live path — `mapInPandas` with a
  per-partition token bucket, so an N-partition job respects a global
  rate of partitions x rate_per_sec. The HTTP call itself is injected
  (tests inject a pure function; no network I/O in this repo).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_join_enrich(
    rows: DataFrame,
    lookup: DataFrame,
    key: str,
    lookup_key: str,
    how: str = "left",
) -> DataFrame:
    """Broadcast-join enrichment: the geocode lookup table stand-in
    (SURVEY.md O4 mapping). Misses surface as NULLs, mirroring the
    reference's (None, None) on geocode failure (`Lab2ETL.py:42-45`)."""
    return rows.join(F.broadcast(lookup), rows[key] == lookup[lookup_key], how)


def rate_limited_enrich(
    rows: DataFrame,
    fn: Callable[[str], tuple[float | None, float | None]],
    key: str,
    rate_per_sec: float = 1.0,
    out_schema: str | None = None,
) -> DataFrame:
    """Live-enrichment path: Arrow-batched, token-bucket throttled.

    ``fn`` maps one key to (x, y) — the injected geocoder. Each
    partition enforces ``rate_per_sec`` locally (reference parity:
    `time.sleep(1)` per row, `Lab2ETL.py:72`, generalized to a token
    bucket so bursts inside a batch are smoothed, not serialized)."""
    out_schema = out_schema or f"{key} string, x double, y double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        allowance, last = rate_per_sec, time.monotonic()
        xs: list[float | None]
        for pdf in batches:
            xs, ys = [], []
            for k in pdf[key]:
                now = time.monotonic()
                allowance = min(rate_per_sec, allowance + (now - last) * rate_per_sec)
                last = now
                if allowance < 1.0:
                    time.sleep((1.0 - allowance) / rate_per_sec)
                    allowance = 1.0
                    last = time.monotonic()
                allowance -= 1.0
                x, y = fn(k)
                xs.append(x)
                ys.append(y)
            yield pd.DataFrame({key: pdf[key], "x": xs, "y": ys})

    return rows.select(key).distinct().mapInPandas(run, schema=out_schema)
