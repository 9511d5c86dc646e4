"""Multimodal binary-column plumbing: deterministic features through
the Arrow/mapInPandas boundary."""

from __future__ import annotations

from wnv_etl_lab2_spark.operators.multimodal import (
    binary_features,
    decode_image_stub,
    documents_as_binary,
)
from wnv_etl_lab2_spark.sources.catalog import load_table


def test_features_deterministic_and_consistent(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(100)
    feats = binary_features(documents_as_binary(docs)).toPandas().sort_values("doc_id")
    again = binary_features(documents_as_binary(docs)).toPandas().sort_values("doc_id")
    assert feats.reset_index(drop=True).equals(again.reset_index(drop=True))

    # n_bytes must equal the utf-8 length of the text (plumbing integrity)
    truth = {r.doc_id: len(r.text.encode("utf-8")) for r in docs.collect()}
    for _, row in feats.iterrows():
        assert row.n_bytes == truth[row.doc_id]
        assert 64 <= row.fake_width < 128 and 64 <= row.fake_height < 128


def test_decode_stub_known_values(spark):
    assert decode_image_stub(b"") == (0, 0)
    w, h = decode_image_stub(bytes([5, 1, 2, 70]))
    assert (w, h) == (64 + 5 % 64, 64 + 70 % 64)


def test_resize_preserves_aspect(spark):
    from wnv_etl_lab2_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytes([10, 0, 0, 100])), (2, b"")], "doc_id long, payload binary"
    )
    out = {r.doc_id: r for r in resize_images(df, target=32).collect()}
    w, h = 64 + 10 % 64, 64 + 100 % 64  # stub-decoded dims
    scale = 32 / max(w, h)
    assert (out[1].out_width, out[1].out_height) == (round(w * scale), round(h * scale))
    assert max(out[1].out_width, out[1].out_height) == 32
    assert (out[2].out_width, out[2].out_height) == (0, 0)


def test_frame_sampling_fans_out(spark):
    from wnv_etl_lab2_spark.operators.multimodal import sample_frames

    payload = bytes(256 * 10)  # 10 "frames"
    df = spark.createDataFrame([(7, payload)], "doc_id long, payload binary")
    rows = sorted(sample_frames(df, frame_size=256, stride=4).collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 4, 8]
    assert [r.frame_offset for r in rows] == [0, 1024, 2048]
    assert all(r.frame_bytes == 256 for r in rows)


def test_empty_payload_row(spark):
    df = spark.createDataFrame([(1, b""), (2, b"abc")], "doc_id long, payload binary")
    out = {r.doc_id: r for r in binary_features(df).collect()}
    assert out[1].n_bytes == 0 and out[1].fake_width == 0
    assert out[2].n_bytes == 3
