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


def test_batch_webhook_export_posts_then_commits(spark, tmp_path):
    """The BATCH writer (df.write.format('webhook')): one CSV POST per
    non-empty partition, then exactly one commit marker carrying the
    true part/row totals — the executor-parallel generalization of
    the reference's one-shot report export."""
    import csv as _csv
    import io as _io

    spool = str(tmp_path / "bspool")

    class SpoolWebhook(WebhookSinkDataSource):
        poster = staticmethod(_spooling_poster(spool))

    spark.dataSource.register(SpoolWebhook)
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(7)], "id long, v string"
    ).repartition(3)
    (
        df.write.format("webhook")
        .option("url", "https://hooks.example/batch-report")
        .mode("append")
        .save()
    )
    data = sorted(glob.glob(os.path.join(spool, "data-*")))
    commits = glob.glob(os.path.join(spool, "commit-*"))
    assert not glob.glob(os.path.join(spool, "abort-*"))
    assert len(commits) == 1
    rows = []
    for p in data:
        with open(p, "rb") as f:
            body = list(_csv.reader(_io.StringIO(f.read().decode())))
        assert body[0] == ["id", "v"]
        rows.extend(body[1:])
    assert sorted(int(r[0]) for r in rows) == list(range(7))
    with open(commits[0], "rb") as f:
        marker = f.read().decode()
    assert f"parts={len(data)}" in marker and "rows=7" in marker


def test_batch_webhook_task_failure_aborts(spark, tmp_path):
    """A poster failure in any task must fail the job and POST the
    abort marker, never a commit — the atomicity signal a downstream
    consumer keys on."""
    import pytest

    spool = str(tmp_path / "fspool")
    inner = _spooling_poster(spool)

    def failing_poster(url: str, payload: bytes) -> None:
        if not url.endswith(("/commit", "/abort")) and b"v3" in payload:
            raise RuntimeError("downstream 503")
        inner(url, payload)

    class FailingWebhook(WebhookSinkDataSource):
        poster = staticmethod(failing_poster)

    spark.dataSource.register(FailingWebhook)
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(4)], "id long, v string"
    ).repartition(4)
    with pytest.raises(Exception):
        (
            df.write.format("webhook")
            .option("url", "https://hooks.example/batch-report")
            .mode("append")
            .save()
        )
    assert not glob.glob(os.path.join(spool, "commit-*"))
    assert glob.glob(os.path.join(spool, "abort-*"))
