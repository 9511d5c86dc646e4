"""Manifest FILE-LIST SIDECARS (round 16 — the 'remaining ceiling'
SCALING.md declared after parquet checkpoints): a full-snapshot
manifest whose file list crosses FILES_SIDECAR_MIN stores the list in
a parquet sidecar (written and read through the executors) and keeps
only an O(1) `files_ref` pointer in the JSON — so manifest reads that
only need metadata (visibility walks, history, schema) stay KB-sized
at any file count, and resolution parses the list columnar-side."""

from __future__ import annotations

import glob
import os

import pytest

import wnv_etl_lab2_spark.sources.versioned as V
from wnv_etl_lab2_spark.sources.versioned import (
    _read_manifest,
    append_table,
    create_table,
    delete_from_table,
    latest_version,
    read_table,
    vacuum_table,
)


@pytest.fixture()
def small_threshold():
    old = V.FILES_SIDECAR_MIN
    V.FILES_SIDECAR_MIN = 3
    try:
        yield
    finally:
        V.FILES_SIDECAR_MIN = old


def _mk(spark, path, n_files=4, partitioned=False):
    df = spark.createDataFrame(
        [(i, i % 2) for i in range(n_files * 5)], "id long, p int"
    ).repartition(n_files)
    create_table(df, path, partition_by=["p"] if partitioned else None)


def test_big_manifest_swaps_to_sidecar(spark, tmp_path, small_threshold):
    path = str(tmp_path / "t")
    _mk(spark, path, n_files=4)
    m = _read_manifest(spark, path, 0)
    assert "files" not in m and m["files_ref"]["n"] >= 3
    assert "file_list_sidecar" in m.get("features", [])
    assert os.path.isdir(m["files_ref"]["path"].replace("file:", ""))
    # the JSON stays O(1) regardless of file count
    raw = open(os.path.join(path, "_log", "00000000.json")).read()
    assert len(raw) < 4000
    # reads resolve through the sidecar
    assert read_table(spark, path).count() == 20
    # DML lifecycle keeps working: CoW delete rewrites (new sidecar),
    # MoR delete carries the ref forward
    delete_from_table(spark, path, "id >= 15")
    assert read_table(spark, path).count() == 15
    delete_from_table(spark, path, "id < 5", mode="merge_on_read")
    assert sorted(r.id for r in read_table(spark, path).collect()) == list(
        range(5, 15)
    )


def test_small_manifest_stays_inline(spark, tmp_path, small_threshold):
    path = str(tmp_path / "t")
    create_table(
        spark.createDataFrame([(1,)], "id long").coalesce(1), path
    )
    m = _read_manifest(spark, path, 0)
    assert "files" in m and "files_ref" not in m


def test_metadata_ddl_shares_the_sidecar(spark, tmp_path, small_threshold):
    """Metadata-only commits (rename/constraint/stats) carry the SAME
    files_ref — no O(files) copy per metadata commit; vacuum
    ref-counts the shared sidecar."""
    from wnv_etl_lab2_spark.sources.versioned import (
        add_check_constraint,
        rename_column,
    )

    path = str(tmp_path / "t")
    _mk(spark, path, n_files=4)
    ref0 = _read_manifest(spark, path, 0)["files_ref"]
    rename_column(spark, path, "id", "key")
    add_check_constraint(spark, path, "pos", "key >= 0")
    m2 = _read_manifest(spark, path, 2)
    assert m2["files_ref"] == ref0  # shared, not copied
    assert read_table(spark, path).columns == ["key", "p"]
    # vacuum keeps the sidecar while any kept manifest references it
    vacuum_table(spark, path, keep_last=1)
    assert os.path.isdir(ref0["path"].replace("file:", ""))
    assert read_table(spark, path).count() == 20


def test_vacuum_collects_orphan_sidecars(spark, tmp_path, small_threshold):
    path = str(tmp_path / "t")
    _mk(spark, path, n_files=4)
    ref0 = _read_manifest(spark, path, 0)["files_ref"]["path"].replace(
        "file:", ""
    )
    # a full rewrite makes v0's sidecar unreferenced once v0 drops
    delete_from_table(spark, path, "id < 0")  # rewrite, same rows
    assert _read_manifest(spark, path, 1)["files_ref"] != _read_manifest(
        spark, path, 0
    )["files_ref"]
    vacuum_table(spark, path, keep_last=1)
    assert not os.path.exists(ref0)
    assert read_table(spark, path).count() == 20


def test_partition_pruning_pushes_into_sidecar_scan(
    spark, tmp_path, small_threshold
):
    path = str(tmp_path / "t")
    _mk(spark, path, n_files=4, partitioned=True)
    m = _read_manifest(spark, path, 0)
    assert "files_ref" in m
    rows = read_table(spark, path, partition_filter={"p": 1}).collect()
    assert rows and all(r.p == 1 for r in rows)
    assert len(rows) == 10


def test_append_chain_over_sidecar_base(spark, tmp_path, small_threshold):
    path = str(tmp_path / "t")
    _mk(spark, path, n_files=4)
    append_table(
        spark.createDataFrame([(100, 0)], "id long, p int").coalesce(1), path
    )
    assert latest_version(spark, path) == 1
    assert read_table(spark, path).count() == 21
    # history reports the file count from the ref without inflating
    from wnv_etl_lab2_spark.sources.versioned import table_history

    h = {r.version: r.n_files for r in table_history(spark, path).collect()}
    assert h[0] >= 3 and h[1] == 1


def test_stream_reads_sidecar_manifests(spark, tmp_path, small_threshold):
    """The Python streaming source inflates files_ref via pyarrow —
    a create-with-sidecar streams all its files, and the feature gate
    stays honest for both readers."""
    import json as _json

    from pyspark.sql.types import StructType

    from wnv_etl_lab2_spark.sources.versioned_stream import (
        VersionedTableStreamReader,
    )

    path = str(tmp_path / "t")
    _mk(spark, path, n_files=4)
    schema = StructType.fromJson(
        _json.loads(_read_manifest(spark, path, 0)["schema"])
    )
    r = VersionedTableStreamReader(path, schema, -1)
    parts = r.partitions(r.initialOffset(), r.latestOffset())
    assert len(parts) >= 3  # v0's sidecar-listed files


def test_old_reader_refuses_sidecar_manifest(spark, tmp_path, small_threshold):
    """A reader without the feature would KeyError into wrong behavior
    — the feature gate refuses instead."""
    import json as _json

    path = str(tmp_path / "t")
    _mk(spark, path, n_files=4)
    p = os.path.join(path, "_log", "00000000.json")
    m = _json.load(open(p))
    assert "file_list_sidecar" in m["features"]
    # simulate a FUTURE feature this reader lacks on the same manifest
    m["features"].append("file_list_sidecar_v9")
    with open(p, "w") as f:
        _json.dump(m, f)
    crc = os.path.join(path, "_log", ".00000000.json.crc")
    if os.path.exists(crc):  # hadoop local-FS checksum of the old bytes
        os.remove(crc)
    with pytest.raises(ValueError, match="file_list_sidecar_v9"):
        read_table(spark, path)


def test_sidecar_table_streams_with_real_engine(spark, tmp_path, small_threshold):
    """Engine-level pin (not just the reader object): a sidecar-backed
    table feeds a real readStream with Trigger.AvailableNow — v0's
    sidecar-listed files replay as the first batch and a later append
    arrives on the next run."""
    from wnv_etl_lab2_spark.sources.versioned_stream import (
        VersionedTableStreamSource,
    )

    spark.dataSource.register(VersionedTableStreamSource)
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    _mk(spark, path, n_files=4)
    assert "files_ref" in _read_manifest(spark, path, 0)

    got: list[int] = []

    def run_available_now():
        q = (
            spark.readStream.format("versioned_table")
            .option("path", path)
            .load()
            .writeStream.foreachBatch(
                lambda df, _b: got.extend(r.id for r in df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run_available_now()
    assert sorted(got) == list(range(20))  # v0's sidecar-listed files
    append_table(
        spark.createDataFrame([(99, 0)], "id long, p int").coalesce(1), path
    )
    got.clear()
    run_available_now()
    assert got == [99]  # incremental: only the appended file
