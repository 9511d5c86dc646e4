"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (BASELINE.json north star): image/audio/video cells are plain
`binary` columns travelling next to typed metadata columns; decode /
feature-extraction runs as Arrow-batched `mapInPandas` so the Python
boundary is crossed once per batch, not per row. Decode is REAL for
every format pure stdlib+numpy can parse — WAV PCM16 audio (features
incl. rfft dominant frequency) and 24-bit BMP images (true
average-pooled resize), round 9; 8-bit PNG (zlib inflate + the five
scanline filters) and BASELINE JPEG (marker parse, canonical Huffman
entropy decode, dequant + zigzag, matrix IDCT, chroma upsampling,
YCbCr->RGB — `decode_jpeg` below), round 10; GIF87a/89a first frame
(variable-width LSB-first LZW with deferred-clear, 4-pass interlace,
palette expansion — `decode_gif`), round 11 — each tested against an
independent spec-literal encoder. Only genuinely library-bound codecs
remain stubbed (MP4/H.264 video, progressive/arithmetic JPEG).
Everything Spark-side — schema, batching, partitioning, output
contract — is real and tested either way.

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


# ---------------------------------------------------------------------------
# REAL decode for uncompressed container formats (round 9). The stubs
# above remain for compressed formats (JPEG/PNG/MP4 need codec
# libraries this container does not ship), but WAV/PCM and BMP are
# pure byte layouts decodable with struct + numpy alone — so the audio
# feature path and the image resize path below are REAL signal/pixel
# processing, unit-tested against synthesized known-content files.
# ---------------------------------------------------------------------------

WAV_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, duration_s double, "
    "rms double, peak double, zero_crossing_rate double, dominant_freq_hz double"
)


def decode_wav_pcm16(payload: bytes):
    """Parse a RIFF/WAVE container with 16-bit PCM samples into
    (sample_rate, numpy float array in [-1, 1]) — pure struct + numpy,
    no audio library. Returns None for anything that is not a PCM16
    WAV (wrong magic, compressed codec, truncated chunks): malformed
    media is data, not an exception, at corpus scale."""
    import struct

    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, sample_rate, n_channels, bits = 12, None, None, None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            fmt, n_channels, sample_rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1:  # not uncompressed PCM
                return None
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize % 2)  # chunks are word-aligned
    if data is None or sample_rate is None or bits != 16 or not n_channels:
        return None
    samples = np.frombuffer(data[: len(data) - len(data) % (2 * n_channels)], dtype="<i2")
    if n_channels > 1:  # downmix to mono: mean over interleaved channels
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return sample_rate, samples.astype(np.float64) / 32768.0


def wav_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """REAL audio feature extraction over a binary WAV column: RMS,
    peak, zero-crossing rate, and the dominant frequency from an rfft
    periodogram — the features an audio-curation pass filters on
    (silence/clipping detection, tone-vs-speech heuristics). One Arrow
    crossing; non-WAV payloads yield a null feature row (kept, so the
    corrupt-media rate is itself queryable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "sample_rate", "n_samples", "duration_s",
                "rms", "peak", "zero_crossing_rate", "dominant_freq_hz",
            )}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                decoded = decode_wav_pcm16(payload or b"")
                if decoded is None or decoded[1].size == 0:
                    for k in ("sample_rate", "n_samples", "duration_s", "rms",
                              "peak", "zero_crossing_rate", "dominant_freq_hz"):
                        rows[k].append(None)
                    continue
                sr, x = decoded
                spec = np.abs(np.fft.rfft(x))
                spec[0] = 0.0  # ignore DC when picking the dominant bin
                freqs = np.fft.rfftfreq(x.size, d=1.0 / sr)
                rows["sample_rate"].append(int(sr))
                rows["n_samples"].append(int(x.size))
                rows["duration_s"].append(float(x.size / sr))
                rows["rms"].append(float(np.sqrt(np.mean(x * x))))
                rows["peak"].append(float(np.max(np.abs(x))))
                rows["zero_crossing_rate"].append(
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                )
                rows["dominant_freq_hz"].append(float(freqs[int(np.argmax(spec))]))
            yield pd.DataFrame(rows)

    slim = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias(payload_col))
    return slim.mapInPandas(run, schema=WAV_FEATURE_SCHEMA)


BMP_RESIZE_SCHEMA = (
    "doc_id long, src_width int, src_height int, out_width int, out_height int, "
    "mean_r double, mean_g double, mean_b double, thumb binary"
)


def decode_bmp24(payload: bytes):
    """Parse an uncompressed 24-bit BITMAPINFOHEADER BMP into an
    (h, w, 3) uint8 RGB array — pure struct + numpy (BMP rows are
    bottom-up, BGR, padded to 4-byte boundaries). None for anything
    else (compressed/other depths)."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr,) = struct.unpack("<I", payload[14:18])
    if hdr < 40:
        return None
    w, h = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (comp,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = data_off + stride * h
    if len(payload) < need:
        return None
    raw = np.frombuffer(payload[data_off : data_off + stride * h], dtype=np.uint8)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_bmp_images(df: DataFrame, target: int = 8) -> DataFrame:
    """REAL image resize over a binary BMP column: decode, average-pool
    to <= target x target (aspect preserved via integer block means),
    emit per-channel means and the raw RGB thumbnail bytes — the
    downsample an image-dedup / quality pass runs before hashing.
    Non-BMP payloads fall back to the aspect-arithmetic stub dims with
    null channel stats (the corrupt/compressed-media path)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def pool(img, t):
            h, w, _ = img.shape
            scale = max(1, max(h, w) // t)
            th, tw = max(1, h // scale), max(1, w // scale)
            clipped = img[: th * scale, : tw * scale].astype(np.float64)
            return clipped.reshape(th, scale, tw, scale, 3).mean(axis=(1, 3))

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "src_width", "src_height", "out_width", "out_height",
                "mean_r", "mean_g", "mean_b", "thumb",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                img = decode_bmp24(payload or b"")
                if img is None:
                    w, h = resize_stub(payload or b"", target)
                    out["src_width"].append(None)
                    out["src_height"].append(None)
                    out["out_width"].append(w)
                    out["out_height"].append(h)
                    for k in ("mean_r", "mean_g", "mean_b"):
                        out[k].append(None)
                    out["thumb"].append(None)
                    continue
                small = pool(img, target)
                out["src_width"].append(img.shape[1])
                out["src_height"].append(img.shape[0])
                out["out_width"].append(small.shape[1])
                out["out_height"].append(small.shape[0])
                out["mean_r"].append(float(img[:, :, 0].mean()))
                out["mean_g"].append(float(img[:, :, 1].mean()))
                out["mean_b"].append(float(img[:, :, 2].mean()))
                out["thumb"].append(np.round(small).astype(np.uint8).tobytes())
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=BMP_RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL decode for PNG (round 10): PNG is DEFLATE (stdlib zlib) over
# filtered scanlines — no codec library needed, unlike JPEG/MP4 which
# remain honestly stubbed. Supports the 8-bit-depth non-interlaced
# color types (gray / RGB / palette / gray+alpha / RGBA); everything
# else (16-bit, Adam7, truncated, corrupt DEFLATE) returns None —
# malformed media is data, not an exception, at corpus scale.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes):
    """Parse an 8-bit non-interlaced PNG into an (h, w, 3) uint8 RGB
    array: chunk walk, zlib-inflate the IDAT stream, reconstruct the
    five scanline filter types (None/Sub/Up/Average/Paeth — the spec's
    §9 recursion), then expand gray/palette/alpha to RGB (alpha is
    dropped, not composited). Pure struct + zlib + numpy."""
    import struct
    import zlib

    import numpy as np

    if len(payload) < 33 or not payload.startswith(_PNG_SIG):
        return None
    pos = 8
    w = h = depth = ctype = interlace = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos : pos + 4])
        ctag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            return None  # truncated chunk
        if ctag == b"IHDR":
            if clen != 13:
                return None
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if comp != 0 or filt != 0:
                return None
        elif ctag == b"PLTE":
            plte = np.frombuffer(body[: (clen // 3) * 3], dtype=np.uint8).reshape(
                -1, 3
            )
        elif ctag == b"IDAT":
            idat += body
        elif ctag == b"IEND":
            break
        pos += 12 + clen  # length + tag + data + crc
    if w is None or not idat or w == 0 or h == 0:
        return None
    if depth != 8 or interlace != 0:
        return None
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None or (ctype == 3 and plte is None):
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    bpp = channels
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        return None
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    off = 0
    for y in range(h):
        f = raw[off]
        off += 1
        line = bytearray(raw[off : off + stride])
        off += stride
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up (no intra-row recursion: vectorized)
            line = bytearray(
                (np.frombuffer(bytes(line), dtype=np.uint8).astype(np.int16)
                 + prev).astype(np.uint8).tobytes()
            )
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        else:
            return None  # not a spec filter type
        arr = np.frombuffer(bytes(line), dtype=np.uint8)
        out[y] = arr
        prev = arr
    px = out.reshape(h, w, channels)
    if ctype == 0:
        return np.repeat(px, 3, axis=2).copy()
    if ctype == 2:
        return px.copy()
    if ctype == 3:
        if int(px.max()) >= len(plte):
            return None  # palette index out of range
        return plte[px[:, :, 0]].copy()
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2).copy()
    return px[:, :, :3].copy()  # RGBA -> drop alpha


# ---------------------------------------------------------------------------
# MP4/ISO-BMFF container METADATA (round 10): the box tree is plain
# struct parsing — ftyp brand, mvhd timescale/duration, track count —
# so the metadata a video-curation pass filters on (duration buckets,
# track sanity, brand allowlists) is REAL; only the codec payload
# (H.264 et al.) stays honestly stubbed, as with progressive JPEG.
# ---------------------------------------------------------------------------

MP4_META_SCHEMA = (
    "doc_id long, major_brand string, timescale long, duration_sec double, "
    "n_tracks int, top_boxes array<string>"
)


def parse_mp4_metadata(payload: bytes):
    """Walk an ISO-BMFF box tree: (major_brand, timescale,
    duration_sec, n_tracks, top-level box types) or None when the
    payload isn't a sane MP4 (first box must be ftyp; a box overflowing
    its container ends the walk). Handles 64-bit largesize boxes and
    mvhd versions 0/1."""
    import struct

    def boxes(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", buf[pos : pos + 4])
            btype = buf[pos + 4 : pos + 8]
            header = 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    return
                (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
                header = 16
            elif size == 0:  # box extends to end of file
                size = end - pos
            if size < header or pos + size > end:
                return  # overflowing/corrupt box
            yield btype, pos + header, pos + size
            pos += size

    try:
        if len(payload) < 12 or payload[4:8] != b"ftyp":
            return None
        top: list[str] = []
        major = None
        timescale = None
        duration = None
        n_tracks = 0
        for btype, body_start, body_end in boxes(payload, 0, len(payload)):
            top.append(btype.decode("ascii", "replace"))
            if btype == b"ftyp":
                major = payload[body_start : body_start + 4].decode("ascii", "replace")
            elif btype == b"moov":
                for ctype, cstart, cend in boxes(payload, body_start, body_end):
                    if ctype == b"trak":
                        n_tracks += 1
                    elif ctype == b"mvhd":
                        version = payload[cstart]
                        if version == 1:
                            timescale, duration = struct.unpack(
                                ">IQ", payload[cstart + 20 : cstart + 32]
                            )
                        else:
                            timescale, duration = struct.unpack(
                                ">II", payload[cstart + 12 : cstart + 20]
                            )
        if major is None:
            return None
        dur_sec = (
            round(duration / timescale, 6)
            if timescale not in (None, 0) and duration is not None
            else None
        )
        return major, timescale, dur_sec, n_tracks, top
    except (struct.error, IndexError, ValueError):
        return None


def mp4_metadata(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Container metadata for a binary video column — the pre-decode
    curation filter (duration buckets, track sanity, brand allowlist).
    Non-MP4 / corrupt payloads yield null metadata rows. One Arrow
    crossing, (id, payload) only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("doc_id", "major_brand", "timescale", "duration_sec", "n_tracks", "top_boxes")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(doc_id)
                meta = parse_mp4_metadata(bytes(payload) if payload is not None else b"")
                if meta is None:
                    for k in cols[1:]:
                        out[k].append(None)
                else:
                    for k, v in zip(cols[1:], meta):
                        out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=MP4_META_SCHEMA)


# ---------------------------------------------------------------------------
# Image near-dup dedup (round 10): perceptual difference hash over the
# REAL decoders — the image twin of the text pipeline's SimHash path.
# dHash is the standard 64-bit gradient fingerprint (resize to 9x8
# luma, bit = left pixel brighter than right): re-encodes, recompressed
# JPEGs, and small edits land within a few bits, unrelated images ~32.
# Pair generation is pigeonhole-banded: split the 64-bit hash into
# (max_hamming + 1) bands — two hashes within max_hamming MUST agree
# on at least one whole band, so the band-equality self-join has EXACT
# recall while candidates stay bucket-bounded (never all-pairs), the
# same argument as the SimHash/MinHash band joins. Verification is a
# pure bit_count(xor) filter on the candidates.
# ---------------------------------------------------------------------------

IMAGE_DHASH_SCHEMA = "doc_id long, format string, dhash long"


def _area_resize_gray(img, out_h: int, out_w: int):
    """Area-mean resize of an (h, w, 3) uint8 image to (out_h, out_w)
    grayscale via nearly-equal row/column slices — deterministic,
    library-free."""
    import numpy as np

    gray = img.astype(np.float64).mean(axis=2)
    rows = np.array_split(np.arange(gray.shape[0]), out_h)
    cols = np.array_split(np.arange(gray.shape[1]), out_w)
    out = np.empty((out_h, out_w))
    for i, rs in enumerate(rows):
        band = gray[rs]
        for j, cs in enumerate(cols):
            out[i, j] = band[:, cs].mean()
    return out


def dhash64(img) -> int:
    """64-bit difference hash: 9x8 luma, row-major bits of
    'pixel brighter than its right neighbor', returned as a SIGNED
    long (Spark LongType; hamming via bit_count(a ^ b) is
    sign-agnostic)."""
    g = _area_resize_gray(img, 8, 9)
    bits = (g[:, :-1] > g[:, 1:]).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Perceptual fingerprints for a binary raster column: decode
    (BMP/PNG/JPEG by magic), dHash the luma gradients. Undecodable
    payloads yield a null hash (queryable corrupt-media rate). One
    Arrow crossing, only (id, payload) projected in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fmts, hashes = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(doc_id)
                fmt, img = decode_raster(bytes(payload) if payload is not None else b"")
                fmts.append(fmt)
                hashes.append(dhash64(img) if img is not None else None)
            yield pd.DataFrame(
                {"doc_id": ids, "format": fmts, "dhash": pd.array(hashes, dtype="Int64")}
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(run, schema=IMAGE_DHASH_SCHEMA)


def image_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
) -> DataFrame:
    """Image near-dup pairs (id_a < id_b, hamming <= max_hamming) from
    a dHash frame, banded for exact recall: with B = max_hamming + 1
    bands of 64/B bits, any pair within max_hamming bits agrees on a
    whole band (pigeonhole), so candidates come from a band-equality
    groupBy join — bucket-bounded, never a cross join — and the final
    bit_count(xor) filter is exact. distinct() collapses pairs that
    collide in several bands."""
    bands = max_hamming + 1
    width = 64 // bands
    h = hashes.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h")
    )
    # band value: WIDTH bits starting at band*width (shiftright then
    # mask keeps each band comparison a small long)
    mask = (1 << width) - 1
    banded = h.select(
        "id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright("h", b * width).bitwiseAND(F.lit(mask)).alias(
                            "band_val"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "h", "band.band_id", "band.band_val")
    a, bdf = banded.alias("a"), banded.alias("b")
    cand = a.join(
        bdf,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.id") < F.col("b.id")),
    )
    return (
        cand.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# REAL decode for BASELINE JPEG (round 10): sequential-DCT Huffman
# JPEG (SOF0/SOF1) needs no codec library — marker walk (struct),
# canonical Huffman decode of the entropy stream (0xFF00 unstuffing,
# RSTn restart segments), dequantization + zigzag placement, the
# orthonormal 8x8 IDCT as two numpy matrix products, per-component
# plane assembly with H/V chroma upsampling, and JFIF YCbCr->RGB.
# Progressive (SOF2) / arithmetic-coded / 12-bit JPEGs return None —
# the same malformed-media-is-data stance as the other decoders.
# ---------------------------------------------------------------------------


def _zigzag_rc():
    """The spec's zigzag scan as (row, col) pairs: diagonals s = r+c
    in order; odd diagonals walk row-ascending (starting at the top),
    even ones row-descending — pinned in tests against the published
    flat-index sequence 0,1,8,16,9,2,3,10,17,24,..."""
    return sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]),
    )


_ZIGZAG = _zigzag_rc()


def _idct_matrix():
    import math

    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / math.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = (cu / 2) * math.cos((2 * x + 1) * u * math.pi / 16)
    return m  # orthonormal DCT-II matrix: spatial = M.T @ F @ M


class _HuffTable:
    """Canonical JPEG Huffman table from a DHT segment's 16 length
    counts + symbol list: codes assigned in symbol order, ascending
    length, each length's first code = (prev_first + prev_count) << 1."""

    def __init__(self, counts: list[int], symbols: bytes) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over one entropy-coded (restart) segment;
    raises EOFError past the end (truncated stream -> decode fails)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise EOFError  # no code matched within 16 bits: corrupt


def _extend(v: int, t: int) -> int:
    """JPEG F.12 sign extension: a t-bit magnitude with a leading 0
    encodes a negative value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _split_entropy(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded bytes from ``start`` to the next
    real marker, split into restart segments at RST0-7. Returns
    (segments, pos_after)."""
    segs: list[bytearray] = [bytearray()]
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = payload[i + 1]
        if m == 0x00:
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: new segment, byte-aligned
            segs.append(bytearray())
            i += 2
        else:
            break  # a real marker (EOI or next segment) ends the scan
    return [bytes(s) for s in segs], i


def decode_jpeg(payload: bytes):
    """Parse a baseline (sequential DCT, Huffman, 8-bit) JPEG into an
    (h, w, 3) uint8 RGB array. Single interleaved scan; arbitrary
    H/V sampling factors (4:4:4, 4:2:0, 4:2:2...); restart markers
    honored. Anything else — progressive SOF2, arithmetic coding,
    12-bit precision, truncated/corrupt streams — returns None."""
    import struct

    import numpy as np

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    try:
        qt: dict[int, np.ndarray] = {}
        huff_dc: dict[int, _HuffTable] = {}
        huff_ac: dict[int, _HuffTable] = {}
        comps: list[dict] = []  # id, h, v, tq, td, ta
        height = width = None
        restart_interval = 0
        i = 2
        segments = None
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xD9:  # EOI
                break
            (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
            body = payload[i + 4 : i + 2 + seglen]
            if len(body) != seglen - 2:
                return None
            if marker == 0xDB:  # DQT: one or more tables
                p = 0
                while p < len(body):
                    pq, tq = body[p] >> 4, body[p] & 0xF
                    p += 1
                    if pq == 0:
                        vals = np.frombuffer(body[p : p + 64], dtype=np.uint8)
                        p += 64
                    else:
                        vals = np.frombuffer(
                            body[p : p + 128], dtype=">u2"
                        ).astype(np.int64)
                        p += 128
                    if len(vals) != 64:
                        return None
                    qt[tq] = vals.astype(np.int64)
                i += 2 + seglen
            elif marker in (0xC0, 0xC1):  # SOF0/1: baseline-compatible
                prec, height, width, nf = struct.unpack(">BHHB", body[:6])
                if prec != 8 or nf not in (1, 3):
                    return None
                for c in range(nf):
                    cid, hv, tqi = body[6 + 3 * c : 9 + 3 * c]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tqi}
                    )
                i += 2 + seglen
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                            0xCD, 0xCE, 0xCF):
                return None  # progressive / arithmetic / hierarchical
            elif marker == 0xC4:  # DHT: one or more tables
                p = 0
                while p + 17 <= len(body):
                    tc, th = body[p] >> 4, body[p] & 0xF
                    counts = list(body[p + 1 : p + 17])
                    nsym = sum(counts)
                    symbols = body[p + 17 : p + 17 + nsym]
                    if len(symbols) != nsym:
                        return None
                    (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(
                        counts, symbols
                    )
                    p += 17 + nsym
                i += 2 + seglen
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", body[:2])
                i += 2 + seglen
            elif marker == 0xDA:  # SOS: scan header then entropy data
                ns = body[0]
                if ns != len(comps):
                    return None  # only single interleaved scans
                for s in range(ns):
                    cs, tdta = body[1 + 2 * s : 3 + 2 * s]
                    for c in comps:
                        if c["id"] == cs:
                            c["td"], c["ta"] = tdta >> 4, tdta & 0xF
                segments, i = _split_entropy(payload, i + 2 + seglen)
                break
            else:  # APPn / COM / anything skippable
                i += 2 + seglen
        if segments is None or height is None or not comps:
            return None
        for c in comps:
            if c["tq"] not in qt or "td" not in c:
                return None
            if c["td"] not in huff_dc or c["ta"] not in huff_ac:
                return None

        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = -(-width // (8 * hmax))
        mcuy = -(-height // (8 * vmax))
        planes = [
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
            for c in comps
        ]
        m = _idct_matrix()
        zz = _ZIGZAG
        pred = [0] * len(comps)
        reader = _BitReader(segments[0])
        seg_idx = 0
        for mcu in range(mcux * mcuy):
            if restart_interval and mcu and mcu % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    return None
                reader = _BitReader(segments[seg_idx])
                pred = [0] * len(comps)
            my, mx = divmod(mcu, mcux)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros((8, 8), dtype=np.float64)
                        t = reader.read_symbol(huff_dc[c["td"]])
                        diff = _extend(reader.read_bits(t), t)
                        pred[ci] += diff
                        q = qt[c["tq"]]
                        coef[0, 0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.read_symbol(huff_ac[c["ta"]])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if rs == 0xF0:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            coef[zz[k]] = _extend(reader.read_bits(s), s) * q[k]
                            k += 1
                        block = m.T @ coef @ m + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
        # upsample each component to full MCU-grid resolution, crop
        full = []
        for ci, c in enumerate(comps):
            p = planes[ci]
            if c["h"] < hmax:
                p = np.repeat(p, hmax // c["h"], axis=1)
            if c["v"] < vmax:
                p = np.repeat(p, vmax // c["v"], axis=0)
            full.append(p[:height, :width])
        if len(comps) == 1:
            g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
            return np.stack([g, g, g], axis=2)
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    except (EOFError, struct.error, IndexError, ValueError):
        return None


RASTER_RESIZE_SCHEMA = (
    "doc_id long, format string, src_width int, src_height int, "
    "out_width int, out_height int, mean_r double, mean_g double, "
    "mean_b double, thumb binary"
)


def _gif_lzw_decode(data: bytes, min_code: int, max_pixels: int):
    """GIF-variant LZW: variable-width codes packed LSB-first, CLEAR
    resets the table, widths grow 1 bit whenever the next free code
    reaches 2^width (12-bit cap), EOI ends the stream. Returns the
    pixel-index list or None on a malformed stream."""
    clear = 1 << min_code
    end = clear + 1

    def fresh():
        return {i: (i,) for i in range(clear)}, min_code + 1, end + 1

    table, width, next_code = fresh()
    out: list = []
    prev: tuple | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + width <= total_bits:
        byte = bitpos >> 3
        code = (
            int.from_bytes(data[byte : byte + 3], "little") >> (bitpos & 7)
        ) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table, width, next_code = fresh()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)  # the KwKwK special case
            else:
                return None
            if next_code < 4096:  # table full => deferred-clear mode:
                # no new entries until the stream sends CLEAR (real
                # encoders may never send it; decoders must cope)
                table[next_code] = prev + (entry[0],)
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
        out.extend(entry)
        prev = entry
        if len(out) >= max_pixels:
            break
    return out


def decode_gif(payload: bytes):
    """FIRST frame of a GIF87a/89a as an (h, w, 3) uint8 RGB array:
    logical-screen walk, global/local color table, the GIF-variant
    LSB-first variable-width LZW (`_gif_lzw_decode`), and the 4-pass
    interlace row reorder. Transparency is dropped, not composited
    (the PNG decoder's stance); later frames are animation, out of
    scope for a fingerprint/feature decode. Pure struct + numpy —
    malformed payloads return None (corrupt media is data)."""
    import struct

    import numpy as np

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        _sw, _sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 ** ((packed & 7) + 1)
            gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
            if gct.size < 3 * n:
                return None
            gct = gct.reshape(n, 3)
            pos += 3 * n
        while pos < len(payload):
            b = payload[pos]
            pos += 1
            if b == 0x3B:  # trailer before any image
                return None
            if b == 0x21:  # extension: label byte + sub-blocks
                pos += 1
                while payload[pos]:
                    pos += payload[pos] + 1
                pos += 1
                continue
            if b != 0x2C:
                return None
            _l, _t, w, h, ip = struct.unpack("<HHHHB", payload[pos : pos + 9])
            pos += 9
            ct = gct
            if ip & 0x80:
                n = 2 ** ((ip & 7) + 1)
                ct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
                if ct.size < 3 * n:
                    return None
                ct = ct.reshape(n, 3)
                pos += 3 * n
            if ct is None or w == 0 or h == 0:
                return None
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 8:
                return None
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += ln + 1
            idx = _gif_lzw_decode(bytes(data), min_code, w * h)
            if idx is None or len(idx) < w * h:
                return None
            arr = np.asarray(idx[: w * h], dtype=np.int32)
            if (arr >= ct.shape[0]).any():
                return None
            img = ct[arr].reshape(h, w, 3)
            if ip & 0x40:  # interlaced: rows arrive in 4-pass order
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                out = np.empty_like(img)
                out[order] = img
                img = out
            return img
    except (IndexError, struct.error):
        return None
    return None


def decode_raster(payload: bytes):
    """Sniff-and-decode the formats this engine decodes for real:
    (format, (h, w, 3) RGB array) for 24-bit BMP, 8-bit PNG, baseline
    JPEG, or GIF87a/89a first frame, else (None, None)."""
    if payload[:2] == b"BM":
        img = decode_bmp24(payload)
        if img is not None:
            return "bmp", img
    if payload[:8] == _PNG_SIG:
        img = decode_png(payload)
        if img is not None:
            return "png", img
    if payload[:2] == b"\xff\xd8":
        img = decode_jpeg(payload)
        if img is not None:
            return "jpeg", img
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        img = decode_gif(payload)
        if img is not None:
            return "gif", img
    return None, None


def resize_raster_images(df: DataFrame, target: int = 8) -> DataFrame:
    """REAL image resize over a mixed binary raster column (BMP, PNG,
    baseline JPEG, and GIF sniffed by magic via `decode_raster`): decode, average-pool to <= target x target
    (aspect preserved), emit per-channel means and the raw RGB
    thumbnail bytes — the downsample an image-dedup / quality pass
    runs before hashing. Payloads in neither format yield null
    feature rows (the corrupt/compressed-media path — the rate is
    itself queryable). Same mapInPandas shape as the WAV/BMP paths:
    one Arrow crossing, only (doc_id, payload) projected in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def pool(img, t):
            h, w, _ = img.shape
            scale = max(1, max(h, w) // t)
            th, tw = max(1, h // scale), max(1, w // scale)
            clipped = img[: th * scale, : tw * scale].astype(np.float64)
            return clipped.reshape(th, scale, tw, scale, 3).mean(axis=(1, 3))

        cols = (
            "doc_id", "format", "src_width", "src_height", "out_width",
            "out_height", "mean_r", "mean_g", "mean_b", "thumb",
        )
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                fmt, img = decode_raster(payload or b"")
                out["format"].append(fmt)
                if img is None:
                    for k in cols[2:]:
                        out[k].append(None)
                    continue
                small = pool(img, target)
                out["src_width"].append(img.shape[1])
                out["src_height"].append(img.shape[0])
                out["out_width"].append(small.shape[1])
                out["out_height"].append(small.shape[0])
                out["mean_r"].append(float(img[:, :, 0].mean()))
                out["mean_g"].append(float(img[:, :, 1].mean()))
                out["mean_b"].append(float(img[:, :, 2].mean()))
                out["thumb"].append(np.round(small).astype(np.uint8).tobytes())
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=RASTER_RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# MP3 frame-walk METADATA (round 11): the audio twin of the MP4 box
# walk — MPEG-1/2 Layer III frame headers are a plain 4-byte bit
# layout (sync, version, layer, bitrate index, sample-rate index,
# padding), so duration/bitrate estimation is a pure header walk: no
# entropy decode, no codec library. The walk is what a curation pass
# needs (duration buckets, CBR/VBR detection, corrupt-stream rate)
# before committing to a real decode.
# ---------------------------------------------------------------------------

# MPEG-1 Layer III bitrate table (kbps, index 1-14) and sample rates
# per the ISO 11172-3 header layout; MPEG-2 (lower sample rates) uses
# its own bitrate column.
_MP3_BITRATE_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATE_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}

MP3_META_SCHEMA = (
    "doc_id long, version string, n_frames int, sample_rate int, "
    "duration_sec double, bitrate_kbps_avg double, is_cbr boolean"
)


def parse_mp3_metadata(payload: bytes):
    """Walk the MP3 frame headers: skip an ID3v2 tag if present, then
    (version, n_frames, sample_rate, duration_sec, avg_kbps, is_cbr)
    from the per-frame headers alone. Layer III frame length =
    144 * bitrate / sample_rate + padding (72 * for MPEG-2's 576-sample
    granule). Returns None when no valid frame sequence exists
    (malformed media is data). Resyncs are NOT attempted: a broken
    walk ends the stream — conservative, so n_frames under-reports on
    damage instead of hallucinating frames."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        # syncsafe 28-bit size
        size = (
            (payload[6] & 0x7F) << 21
            | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7
            | (payload[9] & 0x7F)
        )
        pos = 10 + size
        if payload[5] & 0x10:
            # ID3v2.4 footer flag: 10 more bytes AFTER the tag body —
            # without the skip the first sync check lands inside the
            # footer and a valid file reads as corrupt (round-12
            # advisory fix)
            pos += 10
    n = 0
    bitrates: list[int] = []
    sample_rate = None
    version = None
    samples_per_frame = None
    while pos + 4 <= len(payload):
        h = int.from_bytes(payload[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            break  # lost sync
        ver = (h >> 19) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
        layer = (h >> 17) & 3  # 1 == Layer III
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        pad = (h >> 9) & 1
        if ver == 1 or layer != 1 or br_idx in (0, 15) or sr_idx == 3:
            break
        sr = _MP3_RATES[ver][sr_idx]
        kbps = (_MP3_BITRATE_V1_L3 if ver == 3 else _MP3_BITRATE_V2_L3)[br_idx]
        spf = 1152 if ver == 3 else 576
        frame_len = (spf // 8) * kbps * 1000 // sr + pad
        if frame_len <= 4 or pos + frame_len > len(payload):
            break
        if sample_rate is not None and sr != sample_rate:
            break  # sample-rate change mid-stream: treat as corrupt
        sample_rate = sr
        version = {3: "mpeg1", 2: "mpeg2", 0: "mpeg2.5"}[ver]
        samples_per_frame = spf
        bitrates.append(kbps)
        n += 1
        pos += frame_len
    if n == 0:
        return None
    duration = n * samples_per_frame / sample_rate
    return (
        version,
        n,
        sample_rate,
        round(duration, 6),
        round(sum(bitrates) / n, 3),
        len(set(bitrates)) == 1,
    )


def mp3_metadata(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Frame-walk metadata for a binary audio column — duration,
    average bitrate, CBR/VBR flag — without decoding a single sample.
    Non-MP3 / corrupt payloads yield null metadata rows. One Arrow
    crossing, (id, payload) only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "doc_id", "version", "n_frames", "sample_rate",
            "duration_sec", "bitrate_kbps_avg", "is_cbr",
        )
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(doc_id)
                meta = parse_mp3_metadata(bytes(payload) if payload is not None else b"")
                if meta is None:
                    for k in cols[1:]:
                        out[k].append(None)
                else:
                    for k, v in zip(cols[1:], meta):
                        out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=MP3_META_SCHEMA)


FLAC_META_SCHEMA = (
    "doc_id long, sample_rate int, channels int, bits_per_sample int, "
    "total_samples long, duration_sec double, min_block int, max_block int, "
    "md5 string"
)


def parse_flac_metadata(payload: bytes):
    """FLAC STREAMINFO from the native container (round 12; the audio
    twin of the MP4 box walk — real struct parsing, no codec library):
    'fLaC' magic, then metadata blocks of (1-bit last flag, 7-bit
    type, 24-bit length); STREAMINFO (type 0, always first per spec)
    packs min/max block size (16+16 bits), min/max frame size (24+24),
    then a 64-bit field of sample rate (20 bits), channels-1 (3),
    bits-per-sample-1 (5), total samples (36), and the 128-bit
    unencoded-audio MD5. Returns (sample_rate, channels,
    bits_per_sample, total_samples, duration_sec, min_block,
    max_block, md5_hex) or None for non-FLAC / truncated / malformed
    payloads — corrupt media is data, not an exception."""
    if len(payload) < 42 or payload[:4] != b"fLaC":
        return None
    pos = 4
    block_type = payload[pos] & 0x7F
    size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
    if block_type != 0 or size != 34 or pos + 4 + size > len(payload):
        return None  # STREAMINFO must be the first block, exactly 34 bytes
    b = payload[pos + 4 : pos + 4 + 34]
    min_block = int.from_bytes(b[0:2], "big")
    max_block = int.from_bytes(b[2:4], "big")
    packed = int.from_bytes(b[10:18], "big")
    sample_rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if sample_rate == 0:  # spec: 0 is invalid
        return None
    md5 = b[18:34].hex()
    duration = round(total / sample_rate, 6)
    return (sample_rate, channels, bits, total, duration, min_block, max_block, md5)


def flac_metadata(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """STREAMINFO metadata for a binary audio column — sample rate,
    channels, bit depth, exact duration, and the spec's unencoded-MD5
    (a content fingerprint usable as an exact-dedup key across
    re-encodes of the same PCM). Non-FLAC / corrupt payloads yield
    null metadata rows. One Arrow crossing, (id, payload) only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "doc_id", "sample_rate", "channels", "bits_per_sample",
            "total_samples", "duration_sec", "min_block", "max_block", "md5",
        )
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(doc_id)
                meta = parse_flac_metadata(bytes(payload) if payload is not None else b"")
                if meta is None:
                    for k in cols[1:]:
                        out[k].append(None)
                else:
                    for k, v in zip(cols[1:], meta):
                        out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=FLAC_META_SCHEMA)
