"""Streaming HTTP feed source on the Spark 4 Python DataSource API —
the STREAMING twin of reference O1 (`GSheetsETL_Lab2.py:28-39`): a
published sheet/feed that keeps growing, consumed incrementally
instead of re-downloaded per run (the reference's refresh model is a
full re-run; see streaming/events.py for the same argument on sinks).

    spark.dataSource.register(HttpFeedDataSource)  # or a subclass
    s = (spark.readStream.format("http_feed")
         .schema("x double, y double, type string")
         .option("base_url", "https://feed.example/page-")
         .load())

The feed is PAGINATED: page N lives at ``{base_url}{N}.csv``. Offsets
are ``{"page": N}`` — the next page to fetch. Each micro-batch polls
forward from the current offset until a page is missing (HTTP 404 /
no recorded response), yielding every complete page it finds; a page
is immutable once published, which is what makes
``readBetweenOffsets`` (failure-recovery re-read) exactly
deterministic — the replay contract Structured Streaming requires
from a source. Exactly-once then composes from deterministic offsets
+ an idempotent sink, precisely as with the built-in file source.

The fetch opener is injectable like `http_datasource.py` (subclass in
local scope, pickled by value); pages parse with python csv against
the DECLARED schema (header validated, fail-loud). The per-batch page
scan runs in the driver-side source worker — offsets are a driver
concern; page BODIES are small per batch by construction (whatever
was published since the last trigger). A firehose-scale feed would
use the partitioned batch connector per discovered page instead.
"""

from __future__ import annotations

import csv
import io
from collections.abc import Callable

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

Opener = Callable[[str], bytes]


class FeedPageMissing(KeyError):
    """Raised by openers when a page is not (yet) published."""


def _default_opener(url: str) -> bytes:  # pragma: no cover
    import urllib.error
    import urllib.request

    try:
        return urllib.request.urlopen(url, timeout=10).read()
    except urllib.error.HTTPError as e:
        if e.code == 404:
            raise FeedPageMissing(url) from e
        raise


class HttpFeedDataSource(DataSource):
    """`format("http_feed")`: incremental paginated CSV feed."""

    opener: staticmethod = staticmethod(_default_opener)

    @classmethod
    def name(cls) -> str:
        return "http_feed"

    def schema(self):
        raise NotImplementedError(
            "http_feed requires an explicit .schema(...) — ingestion "
            "never infers from an unfetched payload"
        )

    def simpleStreamReader(self, schema) -> "HttpFeedStreamReader":
        base = self.options.get("base_url")
        if not base:
            raise ValueError("http_feed needs option 'base_url'")
        return HttpFeedStreamReader(schema, base, type(self).opener)


class HttpFeedStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema, base_url: str, opener: Opener) -> None:
        self._schema = schema
        self._base = base_url
        self._opener = opener

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _fetch_page(self, page: int) -> list[tuple] | None:
        # Only FeedPageMissing means "end of feed". A bare KeyError
        # escaping a custom opener is an opener bug and must surface
        # (fail-loud policy) — swallowing it here would silently stop
        # the trigger from consuming pages.
        try:
            body = self._opener(f"{self._base}{page}.csv")
        except FeedPageMissing:
            return None
        rows = list(csv.reader(io.StringIO(body.decode("utf-8"))))
        expected = [f.name for f in self._schema.fields]
        if not rows or rows[0] != expected:
            raise ValueError(
                f"http_feed header mismatch on page {page}: "
                f"{rows[0] if rows else 'empty'} != {expected}"
            )
        out = []
        for r in rows[1:]:
            vals = []
            for f, cell in zip(self._schema.fields, r):
                t = f.dataType.simpleString()
                vals.append(
                    float(cell) if t == "double" else int(cell) if t == "bigint" else cell
                )
            out.append(tuple(vals))
        return out

    def read(self, start: dict):
        page = int(start["page"])
        rows: list[tuple] = []
        while True:
            got = self._fetch_page(page)
            if got is None:
                break
            rows.extend(got)
            page += 1
        return iter(rows), {"page": page}

    def readBetweenOffsets(self, start: dict, end: dict):
        # pages are immutable once published -> deterministic replay
        rows: list[tuple] = []
        for page in range(int(start["page"]), int(end["page"])):
            got = self._fetch_page(page)
            if got is None:
                raise RuntimeError(
                    f"feed page {page} vanished during recovery replay — "
                    "the immutability contract is broken"
                )
            rows.extend(got)
        return iter(rows)
