"""Streaming webhook sink (sources/http_sink.py): per-partition CSV
POSTs plus a driver commit marker, captured to a spool directory by an
injected poster — no sockets."""

from __future__ import annotations

import glob
import os

from wnv_etl_lab2_spark.sources.http_sink import WebhookSinkDataSource


def _spooling_poster(spool_dir: str):
    os.makedirs(spool_dir, exist_ok=True)

    def poster(url: str, payload: bytes) -> None:
        import uuid

        tag = "commit" if url.endswith("/commit") else (
            "abort" if url.endswith("/abort") else "data"
        )
        with open(os.path.join(spool_dir, f"{tag}-{uuid.uuid4().hex}"), "wb") as f:
            f.write(payload)

    return poster


def test_webhook_sink_posts_partitions_then_commit_marker(spark, tmp_path):
    spool = str(tmp_path / "spool")

    class SpoolWebhook(WebhookSinkDataSource):
        poster = staticmethod(_spooling_poster(spool))

    spark.dataSource.register(SpoolWebhook)

    src_dir = str(tmp_path / "rows")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    ).repartition(2).write.mode("overwrite").parquet(src_dir)

    stream = (
        spark.readStream.schema("id long, v string").parquet(src_dir)
    )
    q = (
        stream.writeStream.format("webhook")
        .option("url", "https://hooks.example/report")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    data = sorted(glob.glob(os.path.join(spool, "data-*")))
    commits = glob.glob(os.path.join(spool, "commit-*"))
    aborts = glob.glob(os.path.join(spool, "abort-*"))
    assert not aborts
    # every emitted row arrived exactly once across the data payloads,
    # each payload carrying the declared header
    rows = []
    for p in data:
        lines = open(p).read().strip().splitlines()
        assert lines[0] == "id,v"
        rows += lines[1:]
    assert sorted(rows) == ["1,a", "2,b", "3,c"]
    # the driver-side marker confirms the batch with the total row
    # count only after all partitions succeeded
    assert len(commits) >= 1
    marker = open(commits[0]).read()
    assert "rows=3" in marker and "batch_id=" in marker
