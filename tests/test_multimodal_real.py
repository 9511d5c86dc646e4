"""REAL multimodal decode (round 9): WAV PCM16 audio features and
24-bit BMP resize, verified against files synthesized with KNOWN
content — a 440 Hz sine must report ~440 Hz dominant frequency and
amplitude/sqrt(2) RMS; a two-color BMP must report the exact channel
means and a correct average-pooled thumbnail."""

from __future__ import annotations

import io
import math
import struct
import wave

import numpy as np
import pytest

from wnv_etl_lab2_spark.operators.multimodal import (
    decode_bmp24,
    decode_wav_pcm16,
    resize_bmp_images,
    wav_features,
)


def make_wav(freq_hz: float, sr: int = 8000, seconds: float = 0.5, amp: float = 0.5,
             channels: int = 1) -> bytes:
    n = int(sr * seconds)
    t = np.arange(n) / sr
    x = (amp * np.sin(2 * math.pi * freq_hz * t) * 32767).astype("<i2")
    if channels == 2:
        x = np.repeat(x, 2)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def make_bmp(pixels: np.ndarray) -> bytes:
    """Minimal 24bpp bottom-up BMP from an (h, w, 3) uint8 RGB array."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in pixels[::-1]:  # bottom-up
        line = row[:, ::-1].tobytes()  # RGB -> BGR
        body += line + b"\x00" * (stride - len(line))
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return bytes(hdr + info + body)


def test_wav_decode_and_features_known_sine(spark):
    payloads = [
        (1, make_wav(440.0)),
        (2, make_wav(1000.0, amp=0.25, channels=2)),
        (3, b"not a wav at all"),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {r.doc_id: r for r in wav_features(df).collect()}
    f1 = got[1]
    assert f1.sample_rate == 8000 and f1.n_samples == 4000
    assert abs(f1.dominant_freq_hz - 440.0) < 2.5  # one rfft bin
    assert abs(f1.rms - 0.5 / math.sqrt(2)) < 0.01
    assert abs(f1.peak - 0.5) < 0.01
    # zcr of a 440 Hz tone at 8 kHz: 2 crossings per period
    assert abs(f1.zero_crossing_rate - 2 * 440 / 8000) < 0.01
    f2 = got[2]  # stereo downmix preserved the tone
    assert abs(f2.dominant_freq_hz - 1000.0) < 2.5
    assert abs(f2.rms - 0.25 / math.sqrt(2)) < 0.01
    assert got[3].sample_rate is None  # malformed media is data, not a crash


def test_wav_decoder_rejects_non_pcm():
    wav = bytearray(make_wav(440.0))
    wav[20:22] = struct.pack("<H", 7)  # fmt tag: mu-law, not PCM
    assert decode_wav_pcm16(bytes(wav)) is None
    assert decode_wav_pcm16(b"") is None


def test_bmp_decode_roundtrip_and_resize(spark):
    # left half red, right half blue, 16x8
    img = np.zeros((8, 16, 3), dtype=np.uint8)
    img[:, :8, 0] = 200
    img[:, 8:, 2] = 100
    payload = make_bmp(img)
    back = decode_bmp24(payload)
    assert back is not None and np.array_equal(back, img)

    df = spark.createDataFrame(
        [(1, payload), (2, b"junk")], "doc_id long, payload binary"
    )
    got = {r.doc_id: r for r in resize_bmp_images(df, target=4).collect()}
    r1 = got[1]
    assert (r1.src_width, r1.src_height) == (16, 8)
    assert (r1.out_width, r1.out_height) == (4, 2)  # aspect preserved
    assert abs(r1.mean_r - 100.0) < 1e-9  # half the pixels at 200
    assert abs(r1.mean_b - 50.0) < 1e-9
    thumb = np.frombuffer(r1.thumb, dtype=np.uint8).reshape(2, 4, 3)
    assert np.array_equal(thumb[:, :2, 0], np.full((2, 2), 200))  # left red
    assert np.array_equal(thumb[:, 2:, 2], np.full((2, 2), 100))  # right blue
    assert got[2].mean_r is None  # non-BMP falls back to stub dims
    assert got[2].out_width > 0


def test_bmp_decoder_rejects_other_depths():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(make_bmp(img))
    payload[28:30] = struct.pack("<H", 8)  # 8bpp
    assert decode_bmp24(bytes(payload)) is None
