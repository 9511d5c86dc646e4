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


def test_empty_payload_row(spark):
    df = spark.createDataFrame([(1, b""), (2, b"abc")], "doc_id long, payload binary")
    out = {r.doc_id: r for r in binary_features(df).collect()}
    assert out[1].n_bytes == 0 and out[1].fake_width == 0
    assert out[2].n_bytes == 3
