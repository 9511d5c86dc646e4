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


# ---- round 10: REAL PNG decode (stdlib zlib inflate + filter recon) ----

def make_png(pixels: np.ndarray, ctype: int = 2, filters=None, palette=None) -> bytes:
    """Minimal PNG encoder for tests: 8-bit depth, chooses the given
    filter type per scanline (applying the spec's INVERSE filter at
    encode time), so every reconstruction path in decode_png is
    exercised against known pixels."""
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    if ctype == 3:
        h, w = pixels.shape
        channels = 1
        flat = pixels.reshape(h, w, 1)
    else:
        h, w, channels = pixels.shape
        flat = pixels
    bpp = channels
    stride = w * bpp
    filters = filters or [0]
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = flat[y].tobytes()
        f = filters[y % len(filters)]
        raw.append(f)
        enc = bytearray(stride)
        for i in range(stride):
            x = line[i]
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                enc[i] = x
            elif f == 1:
                enc[i] = (x - a) & 0xFF
            elif f == 2:
                enc[i] = (x - b) & 0xFF
            elif f == 3:
                enc[i] = (x - ((a + b) >> 1)) & 0xFF
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (x - pr) & 0xFF
        raw += enc
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if ctype == 3:
        out += chunk(b"PLTE", b"".join(bytes(p) for p in palette))
    body = zlib.compress(bytes(raw))
    # split IDAT in two to exercise multi-chunk concatenation
    mid = len(body) // 2
    out += chunk(b"IDAT", body[:mid]) + chunk(b"IDAT", body[mid:])
    return out + chunk(b"IEND", b"")


def _pseudo_pixels(h, w, channels, seed=7):
    """Deterministic noisy pixels — stresses Sub/Up/Average/Paeth with
    non-trivial deltas."""
    n = h * w * channels
    vals = [(seed + 31 * i + (i * i) % 97) % 256 for i in range(n)]
    return np.array(vals, dtype=np.uint8).reshape(h, w, channels)


def test_png_decode_every_filter_type_roundtrips():
    from wnv_etl_lab2_spark.operators.multimodal import decode_png

    img = _pseudo_pixels(10, 7, 3)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        back = decode_png(make_png(img, ctype=2, filters=filters))
        assert back is not None and np.array_equal(back, img), filters


def test_png_decode_color_types():
    from wnv_etl_lab2_spark.operators.multimodal import decode_png

    gray = _pseudo_pixels(5, 6, 1)
    back = decode_png(make_png(gray, ctype=0, filters=[4]))
    assert np.array_equal(back, np.repeat(gray, 3, axis=2))

    ga = _pseudo_pixels(5, 6, 2)  # gray + alpha: alpha dropped
    back = decode_png(make_png(ga, ctype=4, filters=[3]))
    assert np.array_equal(back, np.repeat(ga[:, :, :1], 3, axis=2))

    rgba = _pseudo_pixels(4, 4, 4)
    back = decode_png(make_png(rgba, ctype=6, filters=[1, 2]))
    assert np.array_equal(back, rgba[:, :, :3])

    palette = [(250, 10, 30), (0, 200, 0), (5, 5, 255)]
    idx = np.array([[0, 1, 2, 1], [2, 2, 0, 0]], dtype=np.uint8)
    back = decode_png(make_png(idx, ctype=3, filters=[0], palette=palette))
    want = np.array(palette, dtype=np.uint8)[idx]
    assert np.array_equal(back, want)


def test_png_decode_rejects_malformed():
    import zlib

    from wnv_etl_lab2_spark.operators.multimodal import decode_png

    img = _pseudo_pixels(6, 6, 3)
    good = make_png(img)
    assert decode_png(b"") is None
    assert decode_png(b"\x89PNG\r\n\x1a\n") is None  # sig only
    assert decode_png(good[:40]) is None  # truncated mid-chunk
    bad_depth = bytearray(good)
    bad_depth[24] = 16  # IHDR bit depth
    assert decode_png(bytes(bad_depth)) is None
    interlaced = bytearray(good)
    interlaced[28] = 1  # Adam7
    assert decode_png(bytes(interlaced)) is None
    # corrupt the DEFLATE stream body (first IDAT payload byte)
    corrupt = bytearray(good)
    idat_at = good.index(b"IDAT")
    corrupt[idat_at + 8] ^= 0xFF
    assert decode_png(bytes(corrupt)) is None
    # palette index out of range
    idx = np.array([[0, 5]], dtype=np.uint8)
    assert decode_png(make_png(idx, ctype=3, palette=[(1, 2, 3)])) is None


def test_raster_resize_mixed_bmp_png_spark(spark):
    from wnv_etl_lab2_spark.operators.multimodal import resize_raster_images

    bmp_img = np.zeros((8, 16, 3), dtype=np.uint8)
    bmp_img[:, :8, 0] = 200
    bmp_img[:, 8:, 2] = 100
    png_img = np.zeros((8, 8, 3), dtype=np.uint8)
    png_img[:, :, 1] = 60
    df = spark.createDataFrame(
        [
            (1, make_bmp(bmp_img)),
            (2, make_png(png_img, filters=[0, 1, 2, 3, 4])),
            (3, b"neither format"),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in resize_raster_images(df, target=4).collect()}
    assert got[1].format == "bmp" and (got[1].src_width, got[1].src_height) == (16, 8)
    assert abs(got[1].mean_r - 100.0) < 1e-9
    r2 = got[2]
    assert r2.format == "png" and (r2.src_width, r2.src_height) == (8, 8)
    assert (r2.out_width, r2.out_height) == (4, 4)
    assert abs(r2.mean_g - 60.0) < 1e-9 and r2.mean_r == 0.0
    thumb = np.frombuffer(r2.thumb, dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(thumb[:, :, 1], np.full((4, 4), 60))
    assert got[3].format is None and got[3].mean_r is None


# ---- MP4/ISO-BMFF container metadata (round 10) ----


def make_mp4(major=b"isom", timescale=1000, duration=5000, tracks=2, mvhd_v=0):
    """Minimal ISO-BMFF box tree: ftyp + moov(mvhd, trak*n) + mdat."""
    import struct

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", major + struct.pack(">I", 0) + b"isom")
    if mvhd_v == 1:
        mvhd_body = bytes([1, 0, 0, 0]) + b"\0" * 16 + struct.pack(
            ">IQ", timescale, duration
        )
    else:
        mvhd_body = bytes([0, 0, 0, 0]) + b"\0" * 8 + struct.pack(
            ">II", timescale, duration
        )
    moov = box(b"moov", box(b"mvhd", mvhd_body) + b"".join(
        box(b"trak", b"") for _ in range(tracks)
    ))
    return ftyp + moov + box(b"mdat", b"\0" * 16)


def test_mp4_metadata_parses_box_tree(spark):
    from wnv_etl_lab2_spark.operators.multimodal import (
        mp4_metadata,
        parse_mp4_metadata,
    )

    good = make_mp4()
    meta = parse_mp4_metadata(good)
    assert meta == ("isom", 1000, 5.0, 2, ["ftyp", "moov", "mdat"])
    # 64-bit duration path (mvhd version 1)
    v1 = parse_mp4_metadata(make_mp4(timescale=600, duration=90_000, mvhd_v=1))
    assert v1[1] == 600 and v1[2] == 150.0
    # malformed shapes -> None, never an exception
    assert parse_mp4_metadata(b"") is None
    assert parse_mp4_metadata(b"\0\0\0\x08free") is None  # no ftyp first
    assert parse_mp4_metadata(good[:20]) is None or parse_mp4_metadata(good[:20])[3] == 0

    rows = [(1, bytearray(good)), (2, bytearray(b"not a video")), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in mp4_metadata(df).collect()}
    assert got[1].major_brand == "isom" and got[1].duration_sec == 5.0
    assert got[1].n_tracks == 2 and got[1].top_boxes == ["ftyp", "moov", "mdat"]
    assert got[2].major_brand is None and got[3].duration_sec is None


# ---- GIF (round 11): spec-literal encoder -> real decoder ------------


def _gif_lzw_encode(indices, min_code):
    """Independent GIF-LZW encoder (spec-literal, test-only): emits
    CLEAR, then longest-prefix codes growing the table exactly as the
    spec's decoder mirrors it, then EOI; codes packed LSB-first."""
    clear = 1 << min_code
    end = clear + 1
    table = {(i,): i for i in range(clear)}
    width = min_code + 1
    next_code = end + 1
    codes = [(clear, width)]
    buf = ()
    for px in indices:
        cand = buf + (int(px),)
        if cand in table:
            buf = cand
            continue
        codes.append((table[buf], width))
        if next_code < 4096:  # table full: stop defining (deferred clear)
            table[cand] = next_code
            next_code += 1
        # the decoder defines each entry one code LATER than the
        # encoder (while reading the pair's second code), so the
        # encoder grows the code width one entry later: when
        # next_code EXCEEDS 2^width (the spec's wire convention —
        # giflib/PIL interoperate on exactly this)
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        buf = (int(px),)
    if buf:
        codes.append((table[buf], width))
    codes.append((end, width))
    acc = 0
    nbits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif(pixels: np.ndarray, interlace: bool = False, gce: bool = False) -> bytes:
    """Minimal GIF89a from an (h, w, 3) uint8 array whose distinct
    colors fit a 256-entry palette. Optionally writes the interlaced
    row order and a Graphic Control Extension block."""
    h, w, _ = pixels.shape
    flat = pixels.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    n = len(palette)
    assert n <= 256
    size_field = max(1, (n - 1).bit_length() - 1) if n > 2 else 0
    size_field = 0
    while (2 << size_field) < n:
        size_field += 1
    table_n = 2 << size_field
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[:n] = palette
    idx = inverse.reshape(h, w)
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        idx = idx[order]  # rows stored in pass order
    min_code = max(2, size_field + 1)
    data = _gif_lzw_encode(idx.flatten(), min_code)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += pal.tobytes()
    if gce:  # Graphic Control Extension: decoder must skip it
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decode_roundtrip_plain_interlaced_and_extensions():
    from wnv_etl_lab2_spark.operators.multimodal import decode_gif, decode_raster

    rng = np.random.RandomState(3)
    # many distinct colors -> code width grows past its initial size
    img = rng.randint(0, 256, (24, 17, 1), dtype=np.uint8).repeat(3, axis=2)
    got = decode_gif(make_gif(img))
    assert got is not None and got.shape == img.shape
    assert np.array_equal(got, img)
    # interlaced storage decodes to the same pixels
    assert np.array_equal(decode_gif(make_gif(img, interlace=True)), img)
    # a GCE extension block is skipped, not fatal
    assert np.array_equal(decode_gif(make_gif(img, gce=True)), img)
    # dispatcher: magic sniff + format label
    fmt, arr = decode_raster(make_gif(img))
    assert fmt == "gif" and np.array_equal(arr, img)
    # 4-color image exercises the small-code-size path
    small = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    img4 = np.stack([small * 60] * 3, axis=2).astype(np.uint8)
    assert np.array_equal(decode_gif(make_gif(img4)), img4)


def test_gif_decoder_rejects_malformed():
    from wnv_etl_lab2_spark.operators.multimodal import decode_gif

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (8, 8, 1), dtype=np.uint8).repeat(3, axis=2)
    good = make_gif(img)
    assert decode_gif(b"GIF89a") is None  # truncated header
    assert decode_gif(good[:20]) is None  # truncated mid-palette
    assert decode_gif(b"not a gif") is None
    # truncated LZW data: fewer pixels than the descriptor promises
    cut = good[: len(good) // 2]
    assert decode_gif(cut) is None


def test_gif_dhash_matches_bmp_of_same_pixels(spark):
    """Cross-format invariance: the SAME pixels through GIF and BMP
    produce the SAME perceptual dHash, so GIF near-dups land in the
    existing image-curation path unchanged."""
    from wnv_etl_lab2_spark.operators.multimodal import image_dhash

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 16, 1), dtype=np.uint8).repeat(3, axis=2)
    df = spark.createDataFrame(
        [(1, make_gif(img)), (2, make_bmp(img))], "doc_id long, payload binary"
    )
    rows = {r.doc_id: (r.format, r.dhash) for r in image_dhash(df).collect()}
    assert rows[1][0] == "gif" and rows[2][0] == "bmp"
    assert rows[1][1] == rows[2][1]


# ---- MP3 frame-walk metadata (round 11) -------------------------------


def make_mp3(
    n_frames: int, kbps_seq, sr: int = 44100, id3: bool = False,
    id3_footer: bool = False,
) -> bytes:
    """Synthesize an MPEG-1 Layer III frame sequence: real 4-byte
    headers (sync, version=3, layer III, bitrate/sample-rate indices)
    followed by zero-fill to each frame's computed length."""
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sr]
    br_table = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    out = bytearray()
    if id3 or id3_footer:
        body = b"x" * 100
        flags = 0x10 if id3_footer else 0x00
        out += b"ID3\x04\x00" + bytes([flags]) + bytes(
            [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
             (len(body) >> 7) & 0x7F, len(body) & 0x7F]
        ) + body
        if id3_footer:
            # ID3v2.4 footer: 10 bytes after the body, "3DI" magic
            out += b"3DI\x04\x00" + bytes([flags]) + bytes(
                [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
                 (len(body) >> 7) & 0x7F, len(body) & 0x7F]
            )
    for i in range(n_frames):
        kbps = kbps_seq[i % len(kbps_seq)]
        br_idx = br_table.index(kbps)
        h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (br_idx << 12) | (sr_idx << 10)
        frame_len = 144 * kbps * 1000 // sr
        out += h.to_bytes(4, "big") + b"\x00" * (frame_len - 4)
    return bytes(out)


def test_mp3_metadata_frame_walk(spark):
    from wnv_etl_lab2_spark.operators.multimodal import (
        mp3_metadata,
        parse_mp3_metadata,
    )

    cbr = make_mp3(10, [128])
    vbr = make_mp3(9, [128, 192, 64], id3=True)
    meta = parse_mp3_metadata(cbr)
    assert meta == ("mpeg1", 10, 44100, round(10 * 1152 / 44100, 6), 128.0, True)
    v = parse_mp3_metadata(vbr)
    assert v[1] == 9 and v[5] is False and v[4] == round((128 + 192 + 64) * 3 / 9, 3)
    assert parse_mp3_metadata(b"not audio") is None
    # truncated final frame: the walk stops, under-reporting not crashing
    assert parse_mp3_metadata(cbr[:-10])[1] == 9
    # ID3v2.4 footer flag adds 10 bytes after the tag body: the skip
    # honors it (round-12 advisory fix — footered files parsed as None)
    footered = make_mp3(10, [128], id3_footer=True)
    assert parse_mp3_metadata(footered) == meta

    df = spark.createDataFrame(
        [(1, cbr), (2, vbr), (3, b"junk")], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in mp3_metadata(df).collect()}
    assert rows[1].is_cbr and rows[1].n_frames == 10
    assert rows[2].is_cbr is False and rows[2].version == "mpeg1"
    assert rows[3].n_frames is None and rows[3].duration_sec is None


# ---- FLAC STREAMINFO metadata (round 12) -------------------------------


def make_flac(
    sample_rate=44100, channels=2, bits=16, total=441000,
    min_block=4096, max_block=4096, md5=b"\x01" * 16, last=True,
) -> bytes:
    """Synthesize a FLAC header: magic + STREAMINFO block (34 bytes,
    spec field packing); frame data is irrelevant to the parser."""
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | total
    )
    body = (
        min_block.to_bytes(2, "big")
        + max_block.to_bytes(2, "big")
        + (0).to_bytes(3, "big")  # min frame size (unknown)
        + (0).to_bytes(3, "big")  # max frame size
        + packed.to_bytes(8, "big")
        + md5
    )
    assert len(body) == 34
    header = bytes([(0x80 if last else 0x00) | 0x00]) + len(body).to_bytes(3, "big")
    return b"fLaC" + header + body + b"\x00\x00"  # token frame bytes


def test_flac_streaminfo_metadata(spark):
    from wnv_etl_lab2_spark.operators.multimodal import (
        flac_metadata,
        parse_flac_metadata,
    )

    good = make_flac()
    meta = parse_flac_metadata(good)
    assert meta == (44100, 2, 16, 441000, 10.0, 4096, 4096, "01" * 16)
    mono = make_flac(sample_rate=8000, channels=1, bits=24, total=4000)
    assert parse_flac_metadata(mono)[:5] == (8000, 1, 24, 4000, 0.5)
    # 36-bit total samples boundary
    big = make_flac(total=(1 << 36) - 1)
    assert parse_flac_metadata(big)[3] == (1 << 36) - 1
    # corrupt family: wrong magic, truncated, zero sample rate,
    # STREAMINFO not first
    assert parse_flac_metadata(b"OggS" + good[4:]) is None
    assert parse_flac_metadata(good[:20]) is None
    assert parse_flac_metadata(make_flac(sample_rate=0)) is None
    not_first = b"fLaC" + bytes([0x04]) + (0).to_bytes(3, "big") + good[4:]
    assert parse_flac_metadata(not_first) is None

    df = spark.createDataFrame(
        [(1, good), (2, mono), (3, b"junk")], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in flac_metadata(df).collect()}
    assert rows[1].duration_sec == 10.0 and rows[1].md5 == "01" * 16
    assert rows[2].channels == 1 and rows[2].bits_per_sample == 24
    assert rows[3].sample_rate is None and rows[3].md5 is None
