"""Exactly-once streaming appends into a versioned table.

The transactional-sink pattern the lakehouse formats provide for
Structured Streaming (Delta's idempotent `foreachBatch` writes),
rebuilt on `sources/versioned.py`: every micro-batch commits as ONE
new table version stamped with its `batch_id`, and a replayed batch —
the at-least-once delivery Structured Streaming guarantees after a
failure — is detected by the stamp and skipped, which upgrades the
pipeline to effectively-once table content.

Why this composes correctly:

- `append_table` is O(batch): the new version's manifest reuses the
  previous version's files and adds only the micro-batch's files, so
  an infinite stream never rewrites history (and OPTIMIZE can fold
  the accumulated small files into a fresh version at any time
  without stopping the stream's idempotence ledger — the stamp set is
  read from every still-present manifest).
- The commit point is the manifest's create-exclusive write, so a
  batch that dies between data-file write and commit leaves only
  unreferenced garbage for vacuum; on replay the stamp is absent and
  the batch commits cleanly.
- `committed_batch_ids` is the ledger; it shrinks only under vacuum,
  so `keep_last` must cover the sink's replay horizon (checkpointed
  Structured Streaming replays at most the last unacknowledged batch,
  so any keep_last >= 1 that retains the newest stamped manifest per
  source suffices; the conservative default here never vacuums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from wnv_etl_lab2_spark.sources.versioned import (
    append_table,
    create_table,
    last_committed_batch_id,
    latest_version,
    with_retries,
)


def versioned_append_batch(table_path: str, writer_id: str = "default"):
    """`foreachBatch` handler: commit each micro-batch as a stamped
    append version; skip replayed deliveries. The replay test is
    ``batch_id <= last_committed_batch_id`` — complete because a
    query's foreachBatch ids are monotonic and sequential (batch N+1
    never starts before N's handler returned), and O(manifests since
    this writer's last commit) instead of an O(versions) ledger scan
    per batch. ``writer_id`` scopes the ledger so multiple stream
    queries can append to one table (each passes its own id — the
    transactional-writer pattern), and the whole check-and-commit runs
    under `with_retries` so a lost version race against ANOTHER
    writer's commit rebases and retries instead of failing this
    streaming query (round-9 advisory fix) — the replay check re-reads
    the ledger inside the closure, so a replay first detected after a
    rebase is still skipped, and two writers racing to CREATE the
    table resolve to one create plus one rebased append."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession

        def attempt() -> None:
            if latest_version(spark, table_path) is None:
                create_table(
                    batch_df, table_path, batch_id=batch_id, writer_id=writer_id
                )
                return
            last = last_committed_batch_id(spark, table_path, writer_id)
            if last is not None and int(batch_id) <= last:
                return  # replayed delivery — already committed
            append_table(batch_df, table_path, batch_id=batch_id, writer_id=writer_id)

        with_retries(attempt)

    return handle


def write_stream_versioned(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    writer_id: str = "default",
):
    """Wire a streaming DataFrame into the versioned table; returns
    the StreamingQuery (caller drives processAllAvailable/stop)."""
    return (
        stream_df.writeStream.foreachBatch(
            versioned_append_batch(table_path, writer_id)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
