"""HTTP CSV source (reference O1).

The reference's extract() GETs a published Google-Sheet CSV and writes
the body verbatim to a landing file (`GSheetsETL_Lab2.py:28-39`,
`final_project2.py:31-45`). Spark-side, ingestion from HTTP is a
driver-side landing fetch followed by a parallel `spark.read.csv` —
the fetch is I/O-bound and tiny next to the data plane, and the
landing file gives idempotent re-reads (the reference's re-run model).

The URL opener is injected so tests (and this container, which has no
network) exercise the full path without sockets; production passes
``lambda url: urllib.request.urlopen(url, timeout=10).read()`` (the
opener contract is url -> BYTES, mirroring the reference's
requests.get(...).text with its 10 s timeout, `Lab2ETL.py:33`).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wnv_etl_lab2_spark.pipeline import csv_source

Opener = Callable[[str], bytes]


def replay_opener(
    responses: dict[str, tuple[int, dict[str, str], bytes]],
    max_redirects: int = 5,
) -> Opener:
    """Recorded-response opener: replays ``url -> (status, headers,
    body)`` with the same observable semantics a requests/urllib
    opener has — 3xx follows the ``Location`` header (the reference's
    published-sheet GET is answered with a 307 to googleusercontent
    before the 200 CSV, `Nonewnv.log:3-6`), 2xx returns the body,
    anything else raises. This closes the gap between "opener
    contract tested" and "redirect-following opener tested" without a
    socket: integration tests drive fetch -> landing -> spark.read
    end-to-end against the recorded flow, and a capture of real
    traffic can be replayed byte-for-byte.
    """

    def opener(url: str) -> bytes:
        seen = 0
        while True:
            if url not in responses:
                raise KeyError(f"no recorded response for {url!r}")
            status, headers, body = responses[url]
            if 300 <= status < 400:
                seen += 1
                if seen > max_redirects:
                    raise RuntimeError(f"redirect loop at {url!r}")
                loc = {k.lower(): v for k, v in headers.items()}.get("location")
                if not loc:
                    raise ValueError(f"{status} response without Location: {url!r}")
                url = loc
                continue
            if 200 <= status < 300:
                return body
            raise RuntimeError(f"HTTP {status} for {url!r}")

    return opener


def fetch_to_landing(url: str, landing_path: str, opener: Opener) -> str:
    """GET ``url`` and write the body verbatim (reference parity:
    overwrite any prior landing file, `Lab2ETL.py:54-60`)."""
    body = opener(url)
    os.makedirs(os.path.dirname(landing_path) or ".", exist_ok=True)
    with open(landing_path, "wb") as f:
        f.write(body)
    return landing_path


def read_http_csv(
    spark: SparkSession,
    url: str,
    landing_path: str,
    opener: Opener,
    schema: str | None = None,
) -> DataFrame:
    """Fetch + parallel CSV read. Explicit DDL schema recommended; the
    inference fallback mirrors the reference's DictReader dynamism.
    (Reader semantics live in pipeline.csv_source — one copy.)"""
    path = fetch_to_landing(url, landing_path, opener)
    return csv_source(path, schema)(spark)
