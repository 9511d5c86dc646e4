"""Change Data Feed over versioned tables: what changed between two
snapshots, keyed — the Delta CDF / Iceberg changelog contract
(`_change_type` in insert / delete / update_preimage /
update_postimage), computed as a SNAPSHOT DIFF so it works for any
version pair of `sources/versioned.py` tables without the write path
having to record row-level change files.

This is the hand-off primitive for incremental downstream consumers:
a derived table or index subscribes to `table_changes(v_last_seen,
latest)` and applies a batch of keyed deltas instead of re-reading
the snapshot — the same consumption pattern as Delta's
`table_changes` TVF.

Scale shape: ONE full-outer join on the key (big-big — full outer
cannot broadcast, so this is a legitimate sort-merge join, the same
audited-correct SMJ class as `incremental_agg_merge`), with pre/post
images packed as structs so the change classification is a pure
projection over the join output. Unchanged keys are filtered by a
null-safe struct comparison before the explode-to-two-rows step, so
the update fan-out pays only for genuinely changed rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from wnv_etl_lab2_spark.sources.versioned import read_table


def _aligned(df: DataFrame, columns: list[str], types: dict[str, str]) -> DataFrame:
    """Project ``df`` onto ``columns``, null-filling the ones it lacks
    (additive schema evolution: an old snapshot simply predates the
    new columns)."""
    cols = [
        F.col(c) if c in df.columns else F.lit(None).cast(types[c]).alias(c)
        for c in columns
    ]
    return df.select(*cols)


def table_changes(
    spark: SparkSession,
    table_path: str,
    key: str,
    v_from: int,
    v_to: int | None = None,
) -> DataFrame:
    """Keyed changes from snapshot ``v_from`` to ``v_to`` (default:
    latest): the returned frame has ``v_to``'s columns plus
    ``_change_type``; updates emit BOTH images (preimage carries the
    old values) exactly like Delta CDF, so a consumer can maintain
    aggregates by retracting the preimage and applying the postimage."""
    old = read_table(spark, table_path, v_from)
    new = read_table(spark, table_path, v_to)
    value_cols = [c for c in new.columns if c != key]
    types = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    old_a = _aligned(old, [key] + value_cols, types)
    o = old_a.select(key, F.struct(*value_cols).alias("_pre"))
    n = new.select(key, F.struct(*value_cols).alias("_post"))
    j = o.join(n, key, "full_outer")

    def unpack(frame: DataFrame, img: str, change: str) -> DataFrame:
        return frame.select(
            key, F.col(f"{img}.*"), F.lit(change).alias("_change_type")
        )

    changed = j.where(
        F.col("_pre").isNotNull()
        & F.col("_post").isNotNull()
        & ~F.col("_pre").eqNullSafe(F.col("_post"))
    )
    return (
        unpack(j.where(F.col("_pre").isNull()), "_post", "insert")
        .unionByName(unpack(j.where(F.col("_post").isNull()), "_pre", "delete"))
        .unionByName(unpack(changed, "_pre", "update_preimage"))
        .unionByName(unpack(changed, "_post", "update_postimage"))
    )


def read_change_data(
    spark: SparkSession,
    table_path: str,
    v_from: int,
    v_to: int | None = None,
) -> DataFrame:
    """Batch read of the PERSISTED row-level change files for the
    version range ``(v_from, v_to]`` (round 11): each version written
    with ``change_data=True`` contributes its exact change rows
    (table columns + ``_change_type``), appends contribute their added
    rows as ``'insert'``, and analyze/optimize versions are skipped
    (metadata-only / data-neutral). Raises on a rewrite version that
    recorded no change files — that range needs the snapshot-diff
    `table_changes` instead. O(changed rows) end to end; the returned
    frame adds ``_commit_version`` so consumers can apply versions in
    order."""
    from wnv_etl_lab2_spark.sources.versioned import (
        _read_manifest,
        latest_version,
        read_table,
    )

    from wnv_etl_lab2_spark.sources.versioned import _scan_snapshot_files

    if v_to is None:
        v_to = latest_version(spark, table_path)
        if v_to is None:
            raise ValueError(f"not a versioned table (no log): {table_path}")
    out: DataFrame | None = None
    for v in range(v_from + 1, v_to + 1):
        m = _read_manifest(spark, table_path, v)
        if m["op"] in (
            "analyze", "optimize", "drop_column", "rename_column",
            "add_column", "alter_column_type", "set_default",
            "drop_default",
        ):
            continue  # metadata-only / data-neutral
        if "changes" in m:
            # change files store the stable PHYSICAL names and (being
            # ordinary files written from the full logical row) carry
            # partition columns as data — project through this
            # version's map to its logical schema, keeping _change_type
            ch_manifest = {
                "schema": m.get("schema"),
                "column_map": m.get("column_map"),
                "widened": m.get("widened"),
            }
            part = _scan_snapshot_files(
                spark, m["changes"], ch_manifest, extra_cols=("_change_type",)
            ).withColumn("_commit_version", F.lit(v).cast("long"))
        elif m["op"] == "append":
            part = (
                table_appends(spark, table_path, v - 1, v)
                .withColumn("_change_type", F.lit("insert"))
                .withColumn("_commit_version", F.lit(v).cast("long"))
            )
        else:
            raise ValueError(
                f"version {v} is op={m['op']!r} with no recorded change "
                "files — writer did not opt into change_data; use "
                "table_changes for a snapshot diff of this range"
            )
        out = part if out is None else out.unionByName(part, allowMissingColumns=True)
    if out is None:
        return (
            read_table(spark, table_path, v_to)
            .withColumn("_change_type", F.lit(""))
            .withColumn("_commit_version", F.lit(0).cast("long"))
            .where(F.lit(False))
        )
    return out


def table_appends(
    spark: SparkSession,
    table_path: str,
    v_from: int,
    v_to: int | None = None,
) -> DataFrame:
    """Incremental consumption for APPEND-ONLY ranges: the rows added
    after ``v_from`` up to ``v_to``, read from ONLY the appended
    version's data files — O(new data), no join, no old-snapshot scan.
    This is the cheap path a streaming/batch subscriber uses when the
    producer is an append-only pipeline (e.g. the exactly-once
    streaming sink): each poll reads just the manifests' ``add`` lists
    since its last-seen version. Raises if the range contains a
    non-append commit (overwrite/delete/merge/optimize rewrite
    history, so 'rows added' is no longer the change set — use
    `table_changes` there instead; analyze is metadata-only and
    skipped)."""
    from wnv_etl_lab2_spark.sources.versioned import (
        _fs,
        _qualify,
        _read_manifest,
        _resolve_files,
        latest_version,
    )

    if v_to is None:
        v_to = latest_version(spark, table_path)
        if v_to is None:
            raise ValueError(f"not a versioned table (no log): {table_path}")
    files: list[str] = []
    for v in range(v_from + 1, v_to + 1):
        m = _read_manifest(spark, table_path, v)
        if m["op"] == "analyze":
            continue  # metadata-only: no data change
        if m["op"] != "append":
            raise ValueError(
                f"version {v} is op={m['op']!r}, not append — the range "
                f"({v_from}, {v_to}] is not append-only; use table_changes"
            )
        if "add" in m:
            files.extend(m["add"])
        else:
            # pre-round-9 append manifest: no log-structured "add"
            # list, just the full snapshot "files" — recover the added
            # set as this version's files minus the parent's, qualified
            # on both sides so scheme-less legacy entries compare with
            # qualified ones (round-10 advisory fix: an upgraded
            # table's old history must stay consumable)
            fs, jvm = _fs(spark, table_path)
            parent = {
                _qualify(fs, jvm, f)
                for f in _resolve_files(spark, table_path, v - 1)
            }
            files.extend(
                f for f in _resolve_files(spark, table_path, v)
                if _qualify(fs, jvm, f) not in parent
            )
    if not files:
        # empty change set with the table's schema
        from wnv_etl_lab2_spark.sources.versioned import read_table

        return read_table(spark, table_path, v_to).where(F.lit(False))
    # project through the range-end manifest: hive partition columns
    # re-attach from the paths, metadata renames map physical ->
    # logical (round 13; identity for unpartitioned/unmapped tables)
    from wnv_etl_lab2_spark.sources.versioned import _scan_snapshot_files

    m_to = _read_manifest(spark, table_path, v_to)
    return _scan_snapshot_files(
        spark, files,
        {k: m_to.get(k) for k in ("schema", "partition_by", "column_map", "widened")}
    )
