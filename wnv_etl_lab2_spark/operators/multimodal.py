"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (BASELINE.json north star): image/audio/video cells are plain
`binary` columns travelling next to typed metadata columns; decode /
feature-extraction runs as Arrow-batched `mapInPandas` so the Python
boundary is crossed once per batch, not per row. The decode step
itself is STUBBED here (no image/audio libraries in this container —
clearly marked below); everything Spark-side — schema, batching,
partitioning, output contract — is real and tested.

At 100 TB: binary payloads dominate I/O, so the operator projects
only (id, payload) into the Python stage and joins features back by
id if other columns are needed — never dragging full rows through
Arrow.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum long, fake_width int, fake_height int"
)


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB for the real decoder (PIL/libvips are not in this
    container). Returns deterministic fake (width, height) derived
    from the payload so the plumbing is testable end-to-end. A real
    deployment replaces this one function."""
    if not payload:
        return (0, 0)
    return (64 + payload[0] % 64, 64 + payload[-1] % 64)


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per Arrow batch, compute byte length, a
    cheap checksum, and the (stubbed) decoded dimensions."""
    for pdf in batches:
        payloads = pdf["payload"]
        dims = [decode_image_stub(p if p is not None else b"") for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                "checksum": [sum(p[:16]) % 256 if p else 0 for p in payloads],
                "fake_width": [d[0] for d in dims],
                "fake_height": [d[1] for d in dims],
            }
        )


RESIZE_SCHEMA = "doc_id long, out_width int, out_height int, n_bytes long"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_offset long, frame_bytes long"


def resize_stub(payload: bytes, target: int) -> tuple[int, int]:
    """STUB resize: a real kernel decodes + resamples; the stub keeps
    the aspect-ratio arithmetic (the part worth testing) on the fake
    decoded dims."""
    w, h = decode_image_stub(payload)
    if w == 0 or h == 0:
        return (0, 0)
    scale = target / max(w, h)
    return (max(1, round(w * scale)), max(1, round(h * scale)))


def resize_images(df: DataFrame, target: int = 32) -> DataFrame:
    """mapInPandas resize pipeline: (id, payload) -> output dims."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [resize_stub(p if p is not None else b"", target) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": [d[0] for d in dims],
                    "out_height": [d[1] for d in dims],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, frame_size: int = 256, stride: int = 4) -> DataFrame:
    """STUB video frame sampler: treats the payload as fixed-size
    frames and emits every ``stride``-th frame's (offset, length) —
    one input row fans out to N rows, the real shape of frame
    extraction (the decode itself would replace the offset math)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = payload or b""
                n_frames = len(payload) // frame_size
                for i in range(0, n_frames, stride):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(i * frame_size)
                    out["frame_bytes"].append(frame_size)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=FRAMES_SCHEMA)


def binary_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Project (id, payload) -> Arrow-batched feature extraction."""
    slim = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return slim.mapInPandas(extract_features, schema=FEATURE_SCHEMA)


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/queries: treat document text bytes as the
    opaque payload column (the container has no real media files)."""
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
