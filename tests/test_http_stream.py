"""Streaming paginated HTTP feed source (sources/http_stream.py):
incremental page consumption, cross-trigger offset progress, and
schema fail-loud — driven with recorded responses, no sockets."""

from __future__ import annotations

import pytest

from wnv_etl_lab2_spark.sources.http_stream import FeedPageMissing, HttpFeedDataSource

PAGES = {
    "https://feed.example/page-0.csv": (
        200,
        {},
        b"x,y,type\n1.0,2.0,Residential\n",
    ),
    "https://feed.example/page-1.csv": (200, {}, b"x,y,type\n3.0,4.0,Commercial\n"),
}


def _opener_for(pages):
    # Raise the typed end-of-feed signal, not a bare KeyError: the
    # reader only treats FeedPageMissing as "no more pages" and lets
    # any other exception (an opener bug) propagate.
    def opener(url: str) -> bytes:
        if url not in pages:
            raise FeedPageMissing(url)
        return pages[url][2]

    return opener


def test_feed_consumes_pages_incrementally(spark, tmp_path):
    captured = dict(PAGES)

    class ReplayFeed(HttpFeedDataSource):
        opener = staticmethod(_opener_for(captured))

    spark.dataSource.register(ReplayFeed)
    s = (
        spark.readStream.format("http_feed")
        .schema("x double, y double, type string")
        .option("base_url", "https://feed.example/page-")
        .load()
    )
    out = str(tmp_path / "feed_out")
    q = (
        s.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r.x, r.y, r.type) for r in spark.read.parquet(out).collect()
    )
    assert rows == [(1.0, 2.0, "Residential"), (3.0, 4.0, "Commercial")]

    # a THIRD page published later is picked up by a restart from the
    # same checkpoint — offset {"page": 2} persisted, pages 0-1 are
    # not re-emitted (total rows 3, not 5)
    captured["https://feed.example/page-2.csv"] = (
        200,
        {},
        b"x,y,type\n5.0,6.0,Park\n",
    )

    # the registered class was pickled with the old page dict;
    # re-register with the grown feed (same source name) and restart
    # from the SAME checkpoint
    class ReplayFeedGrown(HttpFeedDataSource):
        opener = staticmethod(_opener_for(dict(captured)))

    spark.dataSource.register(ReplayFeedGrown)
    s2 = (
        spark.readStream.format("http_feed")
        .schema("x double, y double, type string")
        .option("base_url", "https://feed.example/page-")
        .load()
    )
    q2 = (
        s2.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows2 = sorted((r.x, r.y, r.type) for r in spark.read.parquet(out).collect())
    assert rows2 == [
        (1.0, 2.0, "Residential"),
        (3.0, 4.0, "Commercial"),
        (5.0, 6.0, "Park"),
    ]


def test_feed_opener_bug_propagates_not_treated_as_eof():
    """A bare KeyError (or any non-FeedPageMissing error) from a
    custom opener is an opener BUG, not end-of-feed: the reader must
    let it surface instead of silently stopping consumption."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    from wnv_etl_lab2_spark.sources.http_stream import HttpFeedStreamReader

    def buggy_opener(url: str) -> bytes:
        raise KeyError("lookup bug in opener internals")

    schema = StructType([StructField("x", DoubleType())])
    reader = HttpFeedStreamReader(schema, "https://feed.example/page-", buggy_opener)
    with pytest.raises(KeyError, match="lookup bug"):
        reader.read({"page": 0})


def test_feed_header_mismatch_fails(spark, tmp_path):
    bad = {"https://feed.example/page-0.csv": (200, {}, b"wrong,cols\n1,2\n")}

    class BadFeed(HttpFeedDataSource):
        opener = staticmethod(_opener_for(bad))

    spark.dataSource.register(BadFeed)
    s = (
        spark.readStream.format("http_feed")
        .schema("x double, y double, type string")
        .option("base_url", "https://feed.example/page-")
        .load()
    )
    q = (
        s.writeStream.format("memory")
        .queryName("feed_bad")
        .option("checkpointLocation", str(tmp_path / "ckpt_bad"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="header mismatch"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()
