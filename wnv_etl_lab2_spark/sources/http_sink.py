"""Streaming webhook (HTTP POST) sink on the Spark 4 Python
DataSource API — the streaming generalization of the reference's
report EXPORT step (`final_project2.py:250-260` writes the final CSV
report; a live pipeline pushes each micro-batch of report rows to a
downstream consumer instead).

    spark.dataSource.register(WebhookSinkDataSource)  # or a subclass
    q = (df.writeStream.format("webhook")
         .option("url", "https://hooks.example/report")
         .option("checkpointLocation", ...).start())

Semantics — the standard two-phase shape of a DataSourceStreamWriter:

- executors serialize their partition's rows as CSV and POST one
  payload per non-empty partition (`write`), returning a commit
  message with (partition, rows, bytes);
- the driver receives every partition's message only if ALL tasks of
  the micro-batch succeeded, then POSTs a tiny commit marker
  ``{batch_id, parts, rows}`` to ``url + '/commit'`` (`commit`); on
  any task failure `abort` posts an abort marker instead. A
  downstream consumer that applies data payloads only after seeing
  the commit marker gets effective exactly-once out of at-least-once
  POSTs + deterministic batch ids — the same contract foreachBatch
  users implement by hand, packaged as a connector.

The POST function is injectable like the readers (subclass in local
scope, pickled by value): tests capture executor-side payloads to a
spooling directory with no sockets. Production overrides with a real
urllib/requests poster.
"""

from __future__ import annotations

import csv
import io
from collections.abc import Callable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

Poster = Callable[[str, bytes], None]


def _default_poster(url: str, payload: bytes) -> None:  # pragma: no cover
    import urllib.request

    req = urllib.request.Request(url, data=payload, method="POST")
    urllib.request.urlopen(req, timeout=10).read()


class WebhookCommit(WriterCommitMessage):
    def __init__(self, partition_id: int, rows: int, nbytes: int) -> None:
        self.partition_id = partition_id
        self.rows = rows
        self.nbytes = nbytes


class WebhookSinkDataSource(DataSource):
    """`format("webhook")`: POST each micro-batch partition as CSV,
    then a driver-side commit marker."""

    poster: staticmethod = staticmethod(_default_poster)

    @classmethod
    def name(cls) -> str:
        return "webhook"

    def streamWriter(self, schema, overwrite: bool) -> "WebhookStreamWriter":
        url = self.options.get("url")
        if not url:
            raise ValueError("webhook sink needs option 'url'")
        return WebhookStreamWriter(schema, url, type(self).poster)

    def writer(self, schema, overwrite: bool) -> "WebhookBatchWriter":
        url = self.options.get("url")
        if not url:
            raise ValueError("webhook sink needs option 'url'")
        return WebhookBatchWriter(schema, url, type(self).poster)


class WebhookStreamWriter(DataSourceStreamWriter):
    def __init__(self, schema, url: str, poster: Poster) -> None:
        self._schema = schema
        self._url = url
        self._poster = poster

    def write(self, iterator: Iterator) -> WebhookCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow([f.name for f in self._schema.fields])
        n = 0
        for row in iterator:
            w.writerow([row[f.name] for f in self._schema.fields])
            n += 1
        if n == 0:
            return WebhookCommit(pid, 0, 0)
        payload = buf.getvalue().encode("utf-8")
        self._poster(self._url, payload)
        return WebhookCommit(pid, n, len(payload))

    def commit(self, messages, batchId: int) -> None:
        parts = [m for m in messages if m is not None and m.rows > 0]
        marker = (
            f"batch_id={batchId},parts={len(parts)},"
            f"rows={sum(m.rows for m in parts)}"
        ).encode("utf-8")
        self._poster(self._url + "/commit", marker)

    def abort(self, messages, batchId: int) -> None:
        self._poster(self._url + "/abort", f"batch_id={batchId}".encode("utf-8"))


class WebhookBatchWriter(DataSourceWriter):
    """Batch twin of the stream writer — `df.write.format("webhook")`
    — completing the connector matrix (batch read / stream read /
    stream write / batch write). Same two-phase contract: executors
    POST one CSV payload per non-empty partition; the driver POSTs a
    single ``parts=...,rows=...`` commit marker only after every task
    succeeded, or an abort marker if any failed. This is the live
    generalization of the reference's one-shot report export
    (`final_project2.py:250-260`): same rows, but the export is
    executor-parallel and the consumer gets an atomicity signal
    instead of a half-written file on failure."""

    def __init__(self, schema, url: str, poster: Poster) -> None:
        self._schema = schema
        self._url = url
        self._poster = poster

    # identical executor-side serialization to the stream writer
    write = WebhookStreamWriter.write

    def commit(self, messages) -> None:
        parts = [m for m in messages if m is not None and m.rows > 0]
        marker = (
            f"parts={len(parts)},rows={sum(m.rows for m in parts)}"
        ).encode("utf-8")
        self._poster(self._url + "/commit", marker)

    def abort(self, messages) -> None:
        self._poster(self._url + "/abort", b"aborted")
