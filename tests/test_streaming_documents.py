"""Streaming curation must reproduce the batch curation answer when
the whole corpus replays through the stream, and must deduplicate
across micro-batch boundaries (the property a per-batch map cannot
have)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wnv_etl_lab2_spark.functions import quality as Q
from wnv_etl_lab2_spark.sources.catalog import load_table
from wnv_etl_lab2_spark.streaming.documents import (
    read_documents_stream,
    stage_documents_for_streaming,
    streaming_curation,
)


@pytest.fixture()
def docs_path(spark, sf_dir, tmp_path):
    return stage_documents_for_streaming(
        spark, sf_dir, str(tmp_path / "docs_stream"), n_files=4
    )


def _run_to_memory(spark, sdf, name):
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_curation_matches_batch(spark, sf_dir, docs_path):
    """Replaying the corpus through the stream keeps exactly the
    batch-curated content set: same kept digests, same count (the
    surviving doc_id per digest may differ — micro-batch arrival
    order vs min-id — so the CONTENT set is the contract)."""
    out = _run_to_memory(
        spark,
        streaming_curation(read_documents_stream(spark, docs_path)),
        "stream_curation",
    ).toPandas()
    batch = (
        load_table(spark, "documents", sf_dir)
        .where(Q.quality_keep())
        .select(F.md5("text").alias("digest"))
        .distinct()
        .toPandas()
    )
    assert set(out.digest) == set(batch.digest)
    assert len(out) == len(batch)  # one survivor per digest
    # every surviving row passes the same quality predicate
    assert len(out) > 0


def test_streaming_curation_dedups_across_batches(spark, tmp_path):
    """Two files, same content: the second micro-batch's copy must be
    dropped by the keyed state, proving dedup spans batch boundaries."""
    # mean word length must land in [4.0, 5.0] for quality_keep
    base = "the torch spark query table always " * 8
    a = spark.createDataFrame(
        [(1, base, "en", "srcA", len(base))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    b = spark.createDataFrame(
        [(2, base, "en", "srcB", len(base)), (3, base + "tails ", "en", "srcB", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p = str(tmp_path / "two_batches")
    a.write.mode("overwrite").parquet(p)
    b.write.mode("append").parquet(p)
    out = _run_to_memory(
        spark,
        streaming_curation(read_documents_stream(spark, p)),
        "stream_curation_2b",
    ).toPandas()
    # both texts pass quality; the duplicate content keeps ONE row
    assert sorted(out.digest.value_counts().tolist()) == [1, 1]


# --- streaming NEAR-dup (MinHash band index across micro-batches) -----

from wnv_etl_lab2_spark.operators.dedup import minhash_band_survivors  # noqa: E402
from wnv_etl_lab2_spark.streaming.documents import (  # noqa: E402
    stage_documents_id_ranged,
    streaming_neardup_curation,
)


def _run_neardup_stream(spark, path, tmp_path):
    index_dir = str(tmp_path / "band_index")
    out_dir = str(tmp_path / "kept_docs")
    q = (
        streaming_neardup_curation(
            read_documents_stream(spark, path), index_dir, out_dir
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "neardup_ckpt"))
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out_dir)


def test_streaming_neardup_replay_equals_batch_survivors(spark, sf_dir, tmp_path):
    """Replaying the corpus in id order through the band-index stream
    keeps EXACTLY the batch greedy-survivor set (quality filter then
    minhash_band_survivors) — doc-id-for-doc-id, not just counts."""
    path = stage_documents_id_ranged(
        spark, sf_dir, str(tmp_path / "iddocs"), n_files=4
    )
    got = {r[0] for r in _run_neardup_stream(spark, path, tmp_path).select("doc_id").collect()}
    batch = minhash_band_survivors(
        load_table(spark, "documents", sf_dir).where(Q.quality_keep())
    )
    want = {r[0] for r in batch.select("doc_id").collect()}
    assert got == want
    assert len(got) > 0


def test_streaming_neardup_drops_across_batches(spark, tmp_path):
    """A near-duplicate (one substituted word) arriving in a LATER
    micro-batch must be dropped by the persisted band index — the
    cross-batch property a per-batch dedup cannot have — while a
    genuinely different later doc survives."""
    import os
    import time

    base = "the torch spark query table always " * 8
    near = base.replace("always", "seldom", 1)
    other = "the write flame crane spoke pivot mill of stone " * 6
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    p = str(tmp_path / "nd_batches")
    b1 = spark.createDataFrame([(1, base, "en", "a", len(base))], schema)
    b2 = spark.createDataFrame(
        [(5, near, "en", "b", len(near)), (6, other, "en", "b", len(other))], schema
    )
    now = time.time()
    for k, b in enumerate((b1, b2)):
        before = set(os.listdir(p)) if os.path.isdir(p) else set()
        b.coalesce(1).write.mode("append").parquet(p)
        for f in set(os.listdir(p)) - before:
            if f.endswith(".parquet"):
                os.utime(os.path.join(p, f), (now + k, now + k))
    kept = _run_neardup_stream(spark, p, tmp_path).select("doc_id").toPandas()
    assert set(kept.doc_id) == {1, 6}


def test_neardup_batch_retry_is_idempotent(spark, tmp_path):
    """A retried micro-batch (same batch_id, same data — the failure
    recovery case) must REPLACE its batch output, not double-append:
    survivors and index rows are written to batch_id-deterministic
    paths with overwrite."""
    from wnv_etl_lab2_spark.streaming.documents import neardup_batch_processor

    base = "the torch spark query table always " * 8
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b0 = spark.createDataFrame([(1, base, "en", "a", len(base))], schema)
    index_dir = str(tmp_path / "idx")
    out_dir = str(tmp_path / "out")
    process = neardup_batch_processor(index_dir, out_dir)
    process(b0, 0)
    first = spark.read.parquet(out_dir).select("doc_id").toPandas()
    idx_first = spark.read.parquet(index_dir).count()
    process(b0, 0)  # retry of the SAME batch
    again = spark.read.parquet(out_dir).select("doc_id").toPandas()
    assert sorted(again.doc_id) == sorted(first.doc_id) == [1]
    assert spark.read.parquet(index_dir).count() == idx_first
    # and a genuinely NEW batch still sees batch 0's index
    near = base.replace("always", "seldom", 1)
    b1 = spark.createDataFrame([(5, near, "en", "b", len(near))], schema)
    process(b1, 1)
    final = spark.read.parquet(out_dir).select("doc_id").toPandas()
    assert sorted(final.doc_id) == [1]  # 5 dropped as near-dup of 1


def test_band_index_join_is_exchange_free_on_index_side(spark, tmp_path):
    """The 100 TB property of the streaming near-dup design: the
    accumulated band index is a partitioned + bucketed table on the
    state-join keys, so the per-batch semi-join exchanges ONLY the new
    micro-batch — the index scan is `Bucketed: true` with no Exchange
    above it. Broadcast is disabled so the assertion checks the
    at-scale (sort-merge) plan, not the small-index broadcast shape."""
    from wnv_etl_lab2_spark.operators.dedup import minhash_band_signatures
    from wnv_etl_lab2_spark.streaming.documents import (
        band_index_table_name,
        neardup_batch_processor,
    )

    base = "the torch spark query table always " * 8
    other = "the write flame crane spoke pivot mill of stone " * 6
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b0 = spark.createDataFrame([(1, base, "en", "a", len(base))], schema)
    b1 = spark.createDataFrame([(2, other, "en", "b", len(other))], schema)
    index_dir = str(tmp_path / "bidx")
    process = neardup_batch_processor(index_dir, str(tmp_path / "bout"))
    process(b0, 0)
    process(b1, 1)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try:
        index = spark.table(band_index_table_name(index_dir)).where(
            F.col("batch_id") < 2
        )
        bands_new = minhash_band_signatures(b1.where(Q.quality_keep()))
        j = bands_new.join(index, ["band_id", "band_sig"], "left_semi")
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    assert "Bucketed: true" in plan, plan
    # The index subtree is the join's SECOND child — everything from
    # its Sort down to the bucketed FileScan. It must contain NO
    # Exchange: the only shuffles in the plan belong to the
    # micro-batch side (the join exchange plus `_shingled`'s
    # documented spreading repartition), both O(batch) not O(corpus).
    index_subtree = plan[plan.rindex("Sort [") :]
    assert "FileScan" in index_subtree, plan
    assert "Exchange" not in index_subtree, plan


# --- streaming IMAGE near-dup (dHash band index, round 11) ------------


def _image_corpus(spark):
    """12 binary payloads: three near-dup groups (+1-brightness
    variants hash identically; trailing-padded re-encodes carry the
    SAME pixels in a LARGER payload — the keep-better signal), three
    unique images, one corrupt payload. Returns (df, groups) where
    groups maps group label -> sorted doc_ids."""
    import numpy as np

    from test_multimodal_real import make_bmp

    def img(seed, size=16):
        r = np.random.RandomState(seed)
        return r.randint(0, 256, (size, size, 3), dtype=np.uint8)

    g1 = img(1)
    g2 = img(2)
    g3 = img(3)
    rows = [
        (1, make_bmp(g1)),
        (2, make_bmp(np.clip(g1.astype(int) + 1, 0, 255).astype(np.uint8))),
        (3, make_bmp(g1) + b"\x00" * 600),   # bigger payload, same dHash
        (4, make_bmp(g2)),
        (5, make_bmp(img(10))),              # unique
        (6, make_bmp(np.clip(g2.astype(int) + 1, 0, 255).astype(np.uint8))),
        (7, make_bmp(img(11))),              # unique
        (8, b"not an image at all"),         # corrupt: must survive
        (9, make_bmp(g3)),
        (10, make_bmp(img(12))),             # unique
        (11, make_bmp(g3) + b"\x00" * 600),  # bigger payload, same dHash
        (12, make_bmp(g3)),                  # exact re-encode of g3
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    groups = {"g1": [1, 2, 3], "g2": [4, 6], "g3": [9, 11, 12]}
    return df, groups


def _stage_media_id_ranged(df, out_path, n_files=3):
    import os
    import time

    ids = [r[0] for r in df.select("doc_id").orderBy("doc_id").collect()]
    step = max(1, (len(ids) + n_files - 1) // n_files)
    bounds = [ids[i] for i in range(0, len(ids), step)] + [ids[-1] + 1]
    now = time.time()
    for k in range(len(bounds) - 1):
        lo, hi = bounds[k], bounds[k + 1]
        before = set(os.listdir(out_path)) if os.path.isdir(out_path) else set()
        (
            df.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .parquet(out_path)
        )
        for f in set(os.listdir(out_path)) - before:
            if f.endswith(".parquet"):
                os.utime(os.path.join(out_path, f), (now + k, now + k))
    return out_path


def test_streaming_image_neardup_replay_equals_batch(spark, tmp_path):
    """Replaying a binary-media corpus in id order through the image
    band-index stream keeps EXACTLY the batch greedy-survivor set
    (curation.image_neardup_survivors) — id-for-id — including the
    undecodable payload, which must always survive."""
    import pyspark.sql.types as T

    from wnv_etl_lab2_spark.curation import image_neardup_survivors
    from wnv_etl_lab2_spark.streaming.documents import (
        streaming_image_neardup_curation,
    )

    media, groups = _image_corpus(spark)
    path = _stage_media_id_ranged(media, str(tmp_path / "imgs"), n_files=3)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(path)
    )
    out_dir = str(tmp_path / "kept_imgs")
    q = (
        streaming_image_neardup_curation(
            stream, str(tmp_path / "img_index"), out_dir
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "img_ckpt"))
        .start()
    )
    q.awaitTermination(180)
    got = {r[0] for r in spark.read.parquet(out_dir).select("doc_id").collect()}
    want = {r[0] for r in image_neardup_survivors(media).select("doc_id").collect()}
    assert got == want
    # greedy semantics: the smallest id of each group survives; later
    # members are dropped even when they arrive in later micro-batches
    # (g3: 9 survives, 11 and 12 — different batch — are dropped)
    assert {1, 4, 9} <= got
    assert not ({2, 3, 6, 11, 12} & got)
    assert 8 in got  # corrupt payload is data, not a silent loss


def test_image_neardup_prune_keeps_better_member(spark):
    """The keep-better batch stage: per near-dup component the highest
    score survives (default score = payload byte length — doc 3, the
    2x upsample, beats the smaller ids in its group); ties break to
    the lowest id; uniques and the corrupt payload pass through."""
    from wnv_etl_lab2_spark.curation import image_neardup_prune

    media, groups = _image_corpus(spark)
    kept = {r[0] for r in image_neardup_prune(media).select("doc_id").collect()}
    # g1: 3 is the 32x32 upsample (largest payload) -> beats 1 and 2
    assert 3 in kept and not ({1, 2} & kept)
    # g3: 11 is the upsample -> beats 9 and 12
    assert 11 in kept and not ({9, 12} & kept)
    # g2: same-size members tie -> lowest id wins
    assert 4 in kept and 6 not in kept
    # uniques + corrupt payload survive
    assert {5, 7, 8, 10} <= kept
    # explicit score column overrides the size default
    media2 = media.withColumn("score", F.col("doc_id").cast("double"))
    kept2 = {
        r[0]
        for r in image_neardup_prune(media2, score_col="score")
        .select("doc_id")
        .collect()
    }
    assert {3, 6, 12} <= kept2 and not ({1, 2, 4, 9, 11} & kept2)


def test_multimodal_txn_curation_replay_equals_batch_across_crash(
    spark, tmp_path, monkeypatch
):
    """Round 12 (r11 verdict #7): text + image curation commit as ONE
    cross-table transaction per micro-batch — mirroring
    tests/test_transactions.py's two-table atomicity pins. A hard
    crash mid-transaction (pending manifests published, no outcome
    decided) leaves BOTH curated tables at their prior versions —
    never documents without their media; the replayed batch recovers
    the wedged slots itself (`recover_pending`) and recommits; and the
    final replayed state equals the batch twins id-for-id
    (minhash_band_survivors over quality-kept docs;
    image_neardup_survivors over media). A second replay of a
    committed batch is a no-op (exactly-once via the txn's batch_id
    stamp)."""
    import wnv_etl_lab2_spark.sources.transactions as tx
    from wnv_etl_lab2_spark.curation import image_neardup_survivors
    from wnv_etl_lab2_spark.operators.dedup import minhash_band_survivors
    from wnv_etl_lab2_spark.sources.versioned import (
        create_table,
        latest_version,
        read_table,
    )
    from wnv_etl_lab2_spark.streaming.documents import (
        multimodal_txn_batch_processor,
    )

    media, _groups = _image_corpus(spark)
    payloads = {r.doc_id: r.payload for r in media.collect()}
    base = "the torch spark query table always lights the evening mill " * 6
    near = base.replace("always", "seldom", 1)
    other1 = "granite rivers bend around the northern archive of stone " * 6
    other2 = "copper wheels hum beneath the long glass bridge at dawn " * 6
    short = "too short"  # fails the quality rules
    texts = {
        1: base, 2: other1, 3: other2,
        4: base + "extra tail words here", 5: near, 6: short,
        7: "the quiet harbor keeps a ledger of every passing sail " * 6,
        8: "nine silver looms weave the morning fog into maps " * 6,
        9: "a patient orchard counts its apples twice a year " * 6,
        10: "the library of wind files every gust by name " * 6,
        11: "twelve lanterns argue about the color of midnight " * 6,
        12: "an iron kettle remembers every storm it boiled through " * 6,
    }
    schema = (
        "doc_id long, text string, lang string, source string, "
        "n_chars long, payload binary"
    )
    rows = [
        (i, texts[i], "en", f"s{i % 3}", len(texts[i]), payloads[i])
        for i in range(1, 13)
    ]
    full = spark.createDataFrame(rows, schema)
    batches = [
        full.where(F.col("doc_id") <= 4),
        full.where((F.col("doc_id") > 4) & (F.col("doc_id") <= 8)),
        full.where(F.col("doc_id") > 8),
    ]

    docs_table = str(tmp_path / "curated_docs")
    media_table = str(tmp_path / "curated_media")
    txn_log = str(tmp_path / "txn")
    create_table(full.drop("payload").limit(0), docs_table)
    create_table(full.select("doc_id", "payload").limit(0), media_table)

    proc = multimodal_txn_batch_processor(
        str(tmp_path / "docs_index"),
        str(tmp_path / "media_index"),
        docs_table,
        media_table,
        txn_log,
    )

    proc(batches[0], 0)
    assert latest_version(spark, docs_table) == 1
    assert latest_version(spark, media_table) == 1

    # HARD crash inside batch 1's transaction: pending manifests
    # published on both tables, process dies before the outcome marker
    def dead_resolve(s, log, txn_id, outcome):
        raise RuntimeError("process died before deciding the outcome")

    monkeypatch.setattr(tx, "resolve_outcome", dead_resolve)
    with pytest.raises(Exception):
        proc(batches[1], 1)
    monkeypatch.undo()

    # atomicity across the crash: NEITHER table advanced — a reader
    # never sees batch-1 documents without their media or vice versa
    assert latest_version(spark, docs_table) == 1
    assert latest_version(spark, media_table) == 1
    docs_ids = {r.doc_id for r in read_table(spark, docs_table).collect()}
    media_ids = {r.doc_id for r in read_table(spark, media_table).collect()}
    assert docs_ids <= {1, 2, 3, 4} and media_ids <= {1, 2, 3, 4}

    # REPLAY of the crashed batch: recover_pending frees the wedged
    # slots, the transaction recommits, the stream moves on
    proc(batches[1], 1)
    proc(batches[2], 2)
    assert latest_version(spark, docs_table) == 3
    assert latest_version(spark, media_table) == 3

    # replay of a COMMITTED batch is a no-op (batch_id ledger)
    proc(batches[2], 2)
    assert latest_version(spark, docs_table) == 3
    assert latest_version(spark, media_table) == 3

    # replayed state == batch twins, id-for-id
    from wnv_etl_lab2_spark.functions import quality as Q

    want_docs = {
        r.doc_id
        for r in minhash_band_survivors(
            full.drop("payload").where(Q.quality_keep())
        ).collect()
    }
    want_media = {
        r.doc_id
        for r in image_neardup_survivors(
            full.select("doc_id", "payload")
        ).collect()
    }
    got_docs = {r.doc_id for r in read_table(spark, docs_table).collect()}
    got_media = {r.doc_id for r in read_table(spark, media_table).collect()}
    assert got_docs == want_docs and len(want_docs) > 0
    assert got_media == want_media and len(want_media) > 0
    assert 6 not in got_docs  # quality-failed text
    assert 8 in got_media  # corrupt payload is data, not a silent loss
