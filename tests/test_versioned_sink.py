"""Exactly-once streaming appends into a versioned table: stream
replay == batch content, O(batch) append file reuse, idempotent
re-delivery, and vacuum's reference counting under shared files."""

from __future__ import annotations

from pyspark.sql import functions as F

from wnv_etl_lab2_spark.sources.catalog import load_table
from wnv_etl_lab2_spark.sources.versioned import (
    _read_manifest,
    append_table,
    committed_batch_ids,
    create_table,
    latest_version,
    read_table,
    vacuum_table,
)
from wnv_etl_lab2_spark.streaming.documents import stage_documents_for_streaming
from wnv_etl_lab2_spark.streaming.versioned_sink import (
    versioned_append_batch,
    write_stream_versioned,
)


def test_stream_appends_match_batch_and_are_stamped(spark, sf_dir, tmp_path):
    src = stage_documents_for_streaming(
        spark, sf_dir, str(tmp_path / "src"), n_files=4
    )
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    tbl = str(tmp_path / "tbl")
    q = write_stream_versioned(stream, tbl, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    batch = load_table(spark, "documents", sf_dir)
    got = read_table(spark, tbl)
    assert got.count() == batch.count()
    g = got.select("doc_id", "text")
    b = batch.select("doc_id", "text")
    assert g.exceptAll(b).count() == 0 and b.exceptAll(g).count() == 0
    # one version per micro-batch, every one stamped
    vmax = latest_version(spark, tbl)
    assert vmax >= 1  # maxFilesPerTrigger=1 over 4 files -> several batches
    assert committed_batch_ids(spark, tbl) == set(range(vmax + 1))


def test_replayed_batch_is_skipped(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    handler = versioned_append_batch(tbl)
    b0 = spark.createDataFrame([(1, "a")], "id long, v string")
    b1 = spark.createDataFrame([(2, "b")], "id long, v string")
    handler(b0, 0)
    handler(b1, 1)
    handler(b1, 1)  # at-least-once re-delivery
    handler(b0, 0)
    assert latest_version(spark, tbl) == 1  # no duplicate versions
    assert read_table(spark, tbl).count() == 2


def test_append_manifest_is_o_batch_and_resolves_to_superset(spark, tmp_path):
    from wnv_etl_lab2_spark.sources.versioned import _resolve_files

    tbl = str(tmp_path / "tbl")
    create_table(spark.createDataFrame([(1, "a")], "id long, v string"), tbl)
    append_table(spark.createDataFrame([(2, "b")], "id long, v string"), tbl)
    m0 = _read_manifest(spark, tbl, 0)
    m1 = _read_manifest(spark, tbl, 1)
    # log-structured append (r9): the manifest records ONLY the added
    # files + a parent pointer — O(batch) metadata per commit — and
    # resolution reconstructs the full snapshot as reuse + new
    assert "files" not in m1 and m1["parent"] == 0
    assert all("/data/v1-" in f for f in m1["add"])
    assert m1["n_rows"] == 2
    r0, r1 = (set(_resolve_files(spark, tbl, v)) for v in (0, 1))
    assert set(m0["files"]) == r0 and r0 < r1  # strict superset
    assert r1 - r0 == set(m1["add"])


def test_vacuum_keeps_files_shared_with_kept_versions(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    create_table(spark.createDataFrame([(1, "a")], "id long, v string"), tbl)
    append_table(spark.createDataFrame([(2, "b")], "id long, v string"), tbl)
    append_table(spark.createDataFrame([(3, "c")], "id long, v string"), tbl)
    # dropping v0/v1 must NOT delete v0's files: v2's manifest still
    # references them through the append chain
    assert vacuum_table(spark, tbl, keep_last=1) == [0, 1]
    assert read_table(spark, tbl).count() == 3
    assert {r.id for r in read_table(spark, tbl).collect()} == {1, 2, 3}


def test_crashed_writer_never_wedges_the_table(spark, tmp_path):
    """Crash-recovery invariants of the attempt-dir protocol:

    1. a writer that died after its data write but before its manifest
       commit leaves a dead ``v{N}-{token}`` attempt dir that can NOT
       collide with (wedge) the next writer targeting version N;
    2. vacuum leaves the dead dir alone while N > latest (it is
       indistinguishable from an in-flight write), then removes it the
       moment any commit for N lands (reference-counted, N <= latest);
    3. a dir whose MANIFEST was vacuumed but whose files a live append
       chain still references survives the garbage pass."""
    import glob
    import os

    from wnv_etl_lab2_spark.sources.versioned import vacuum_table

    tbl = str(tmp_path / "tbl")
    create_table(spark.createDataFrame([(1, "a")], "id long, v string"), tbl)
    # crashed attempt at v1: data written, no manifest
    dead = f"{tbl}/data/v1-deadbeef"
    os.makedirs(dead)
    with open(f"{dead}/part-dead.parquet", "w") as f:
        f.write("dead")
    # in-flight protection: v1 > latest(0) -> vacuum must not touch it
    vacuum_table(spark, tbl, keep_last=5)
    assert os.path.isdir(dead)
    # the next writer commits v1 WITHOUT colliding with the dead dir
    append_table(spark.createDataFrame([(2, "b")], "id long, v string"), tbl)
    assert read_table(spark, tbl).count() == 2
    # now v1 is committed -> the dead attempt is provably garbage
    vacuum_table(spark, tbl, keep_last=5)
    assert not os.path.isdir(dead)
    assert read_table(spark, tbl).count() == 2
    # manifest-vacuumed-but-still-referenced dir survives: drop v0's
    # manifest; its files are referenced through v1's append manifest
    assert vacuum_table(spark, tbl, keep_last=1) == [0]
    assert glob.glob(f"{tbl}/data/v0-*/")  # dir still there
    assert read_table(spark, tbl).count() == 2


def test_writer_scoped_monotonic_ledger(spark, tmp_path):
    """Two stream writers appending to one table keep independent
    idempotence ledgers: writer B replaying its batch 0 is skipped
    even after writer A committed batch 5, and vice versa."""
    from wnv_etl_lab2_spark.sources.versioned import last_committed_batch_id

    tbl = str(tmp_path / "tbl")
    a = versioned_append_batch(tbl, writer_id="A")
    b = versioned_append_batch(tbl, writer_id="B")
    mk = lambda i: spark.createDataFrame([(i, "x")], "id long, v string")
    a(mk(1), 0)
    a(mk(2), 1)
    b(mk(10), 0)  # B's own batch 0 - must commit despite A being at 1
    assert read_table(spark, tbl).count() == 3
    b(mk(10), 0)  # B replay - skipped
    a(mk(2), 1)   # A replay - skipped
    assert read_table(spark, tbl).count() == 3
    assert last_committed_batch_id(spark, tbl, "A") == 1
    assert last_committed_batch_id(spark, tbl, "B") == 0


def test_streaming_curation_into_versioned_table_matches_batch(
    spark, sf_dir, tmp_path
):
    """The full streaming-lakehouse ingestion path: documents stream
    -> quality filter + cross-micro-batch digest dedup
    (`streaming_curation`) -> exactly-once versioned appends. The
    final table content must equal the BATCH curation of the same
    corpus (filter + one-per-digest), every version must be stamped,
    and time travel must show monotonically growing snapshots."""
    from wnv_etl_lab2_spark.functions import quality as Q
    from wnv_etl_lab2_spark.streaming.documents import (
        read_documents_stream,
        stage_documents_for_streaming,
        streaming_curation,
    )

    src = stage_documents_for_streaming(
        spark, sf_dir, str(tmp_path / "src"), n_files=4
    )
    stream = streaming_curation(
        read_documents_stream(spark, src).repartition(4)
    )
    tbl = str(tmp_path / "tbl")
    q = write_stream_versioned(
        stream, tbl, str(tmp_path / "ckpt"), writer_id="curation"
    )
    q.processAllAvailable()
    q.stop()

    batch = (
        load_table(spark, "documents", sf_dir)
        .where(Q.quality_keep())
        .withColumn("digest", F.md5("text"))
        .dropDuplicates(["digest"])
    )
    got = read_table(spark, tbl)
    # content-set equality modulo WHICH duplicate survived (stream
    # keeps first arrival, batch keeps an arbitrary member): compare
    # the digest sets, which canonicalize the choice
    g = {r.digest for r in got.select("digest").collect()}
    b = {r.digest for r in batch.select("digest").collect()}
    assert g == b
    # stamped versions with monotonically non-decreasing snapshots
    vmax = latest_version(spark, tbl)
    sizes = [read_table(spark, tbl, v).count() for v in range(vmax + 1)]
    assert sizes == sorted(sizes) and sizes[-1] == len(b)


def test_concurrent_appenders_all_land_with_retries(spark, tmp_path):
    """Two threads race 4 appends each through with_retries: every
    batch must land exactly once (16 + 2*4 rows), versions are a
    gap-free sequence, and each version has exactly one manifest."""
    import threading

    from wnv_etl_lab2_spark.sources.versioned import (
        _list_versions,
        append_table,
        with_retries,
    )

    tbl = str(tmp_path / "tbl")
    create_table(
        spark.createDataFrame([(i, "base") for i in range(16)], "id long, v string"),
        tbl,
    )
    errors = []

    def writer(tag, ids):
        try:
            for i in ids:
                with_retries(
                    lambda i=i: append_table(
                        spark.createDataFrame([(i, tag)], "id long, v string"), tbl
                    ),
                    attempts=20,
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    t1 = threading.Thread(target=writer, args=("a", [100, 101, 102, 103]))
    t2 = threading.Thread(target=writer, args=("b", [200, 201, 202, 203]))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors, errors
    assert read_table(spark, tbl).count() == 24
    vs = _list_versions(spark, tbl)
    assert vs == list(range(9))  # v0 + 8 appends, gap-free
    assert {r.id for r in read_table(spark, tbl).collect()} == (
        set(range(16)) | {100, 101, 102, 103, 200, 201, 202, 203}
    )


def test_two_stream_writers_race_rebase_instead_of_failing(spark, tmp_path):
    """Two foreachBatch handlers (distinct writer_ids) drive batches
    into ONE table from concurrent threads: version races rebase under
    with_retries instead of propagating (the r9 advisory fix), every
    batch lands exactly once, and a post-race replay is still skipped
    because the ledger is re-read inside the retry closure."""
    import threading

    tbl = str(tmp_path / "tbl")
    a = versioned_append_batch(tbl, writer_id="A")
    b = versioned_append_batch(tbl, writer_id="B")
    errors = []

    def drive(handler, base):
        try:
            for i in range(4):
                handler(
                    spark.createDataFrame([(base + i,)], "id long"), i
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    t1 = threading.Thread(target=drive, args=(a, 100))
    t2 = threading.Thread(target=drive, args=(b, 200))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors, errors
    assert {r.id for r in read_table(spark, tbl).collect()} == (
        {100, 101, 102, 103} | {200, 201, 202, 203}
    )
    # replayed delivery after the races: still detected and skipped
    before = latest_version(spark, tbl)
    a(spark.createDataFrame([(999,)], "id long"), 2)
    assert latest_version(spark, tbl) == before
    assert read_table(spark, tbl).count() == 8
