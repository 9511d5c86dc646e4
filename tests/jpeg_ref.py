"""Spec-literal baseline JPEG ENCODER — test support for
`operators/multimodal.decode_jpeg`, deliberately written as an
INDEPENDENT implementation so round-trip tests don't validate shared
code against itself: the FDCT here is the standard's quadruple-loop
formula (A.3.3) evaluated term by term, while the decoder's IDCT is
two numpy matrix products; the Huffman tables here are constructed
fixed-length canonical tables carried in DHT (any valid canonical
table is legal JPEG), while the decoder rebuilds whatever DHT
declares; only the zigzag order is shared — and that order is pinned
against the published flat-index sequence in test_jpeg.py, so a
deviation from the spec cannot hide in the round trip.

Supports 4:4:4 and 4:2:0 subsampling, grayscale (Nf=1), flat
quantization tables (q=1 gives a near-lossless round trip — the only
loss is DCT float rounding), and restart intervals (DRI + RSTn).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from wnv_etl_lab2_spark.operators.multimodal import _ZIGZAG


def _fdct_ref(block: np.ndarray) -> np.ndarray:
    """JPEG A.3.3 FDCT, literal quadruple loop (block already level
    shifted by -128): F(u,v) = 1/4 C(u)C(v) sum_x sum_y f(x,y)
    cos((2x+1)u pi/16) cos((2y+1)v pi/16)."""
    out = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / math.sqrt(2)) if u == 0 else 1.0
        for v in range(8):
            cv = (1 / math.sqrt(2)) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[u, v] = 0.25 * cu * cv * s
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def align(self) -> None:
        """Pad the current byte with 1-bits (spec F.1.2.3)."""
        while self.nbits:
            self.write(1, 1)


def _category(v: int) -> tuple[int, int]:
    """(bit category, raw bits) for a DC diff / AC coefficient."""
    t = abs(v).bit_length()
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


def _block_symbols(qcoef: np.ndarray, pred: int) -> tuple[list, int]:
    """Entropy symbols for one quantized block: [('dc', cat, bits),
    ('ac', rs, cat, bits)...], plus the new DC predictor."""
    zz = [int(qcoef[rc]) for rc in _ZIGZAG]
    syms: list = []
    t, bits = _category(zz[0] - pred)
    syms.append(("dc", t, bits))
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, 64):
        if k > last_nz:
            syms.append(("ac", 0x00, 0, 0))  # EOB
            break
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            syms.append(("ac", 0xF0, 0, 0))  # ZRL
            run -= 16
        t, bits = _category(zz[k])
        syms.append(("ac", (run << 4) | t, t, bits))
        run = 0
    return syms, zz[0]


def _fixed_table(symbols: set[int]) -> tuple[list[int], bytes]:
    """A valid canonical Huffman table giving every symbol the same
    code length L (chosen so n < 2^L — the all-ones code stays
    unused, as the spec's table-building procedure guarantees)."""
    syms = sorted(symbols)
    n = len(syms)
    length = max(2, (n + 1).bit_length())  # n < 2^L
    counts = [0] * 16
    counts[length - 1] = n
    return counts, bytes(syms)


def _pad_to(arr: np.ndarray, mult: int) -> np.ndarray:
    h, w = arr.shape
    ph = (-h) % mult
    pw = (-w) % mult
    return np.pad(arr, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    img: np.ndarray,
    q_luma: int = 1,
    q_chroma: int = 1,
    subsample: bool = False,
    gray: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (or (h, w) if gray) as a
    baseline JFIF JPEG with flat quantization tables."""
    if gray:
        y = img.astype(np.float64)
        planes = [y]
        hv = [(1, 1)]
        qsel = [0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            cbp = _pad_to(cb, 2)
            crp = _pad_to(cr, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            hv = [(2, 2), (1, 1), (1, 1)]
        else:
            hv = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
    height, width = img.shape[:2]
    hmax = max(h for h, _ in hv)
    vmax = max(v for _, v in hv)
    # each plane padded so the shared MCU grid covers it exactly
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    padded = []
    for p, (h, v) in zip(planes, hv):
        target_h, target_w = mcuy * v * 8, mcux * h * 8
        ph, pw = target_h - p.shape[0], target_w - p.shape[1]
        padded.append(np.pad(p, ((0, max(0, ph)), (0, max(0, pw))), mode="edge"))
    planes = padded
    qtables = [np.full(64, q_luma, dtype=np.int64)]
    if not gray:
        qtables.append(np.full(64, q_chroma, dtype=np.int64))

    # pass 1: quantized blocks in MCU-interleaved order + symbol pools
    mcu_blocks: list[list] = []  # per MCU: list of (comp_index, syms)
    preds = [0] * len(planes)
    dc_pool: dict[int, set[int]] = {0: set(), 1: set()}
    ac_pool: dict[int, set[int]] = {0: set(), 1: set()}
    all_syms: list[list] = []
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            preds = [0] * len(planes)
        my, mx = divmod(mcu, mcux)
        this: list = []
        for ci, (p, (h, v)) in enumerate(zip(planes, hv)):
            tcls = 0 if ci == 0 else 1
            q = qtables[qsel[ci]]
            for by in range(v):
                for bx in range(h):
                    y0 = (my * v + by) * 8
                    x0 = (mx * h + bx) * 8
                    block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    f = _fdct_ref(block)
                    # q is stored in zigzag order per DQT: build the
                    # 8x8 divisor by scattering through the scan
                    qmat = np.zeros((8, 8))
                    for k, rc in enumerate(_ZIGZAG):
                        qmat[rc] = q[k]
                    qc = np.round(f / qmat)
                    syms, preds[ci] = _block_symbols(qc, preds[ci])
                    for s in syms:
                        if s[0] == "dc":
                            dc_pool[tcls].add(s[1])
                        else:
                            ac_pool[tcls].add(s[1])
                    this.append((tcls, syms))
        mcu_blocks.append(this)

    tables = {}
    for tcls in (0, 1):
        if dc_pool[tcls]:
            tables[("dc", tcls)] = _fixed_table(dc_pool[tcls])
            tables[("ac", tcls)] = _fixed_table(ac_pool[tcls])

    def _codes(counts: list[int], syms: bytes) -> dict[int, tuple[int, int]]:
        out = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                out[syms[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1
        return out

    enc = {key: _codes(*tab) for key, tab in tables.items()}

    # pass 2: bitstream
    w = _BitWriter()
    body = bytearray()
    rst = 0
    for mcu, this in enumerate(mcu_blocks):
        if restart_interval and mcu and mcu % restart_interval == 0:
            w.align()
            body += w.out
            w = _BitWriter()
            body += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
        for tcls, syms in this:
            for s in syms:
                if s[0] == "dc":
                    _, t, bits = s
                    code, ln = enc[("dc", tcls)][t]
                    w.write(code, ln)
                    if t:
                        w.write(bits, t)
                else:
                    _, rs, t, bits = s
                    code, ln = enc[("ac", tcls)][rs]
                    w.write(code, ln)
                    if t:
                        w.write(bits, t)
    w.align()
    body += w.out

    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    for tq, q in enumerate(qtables):
        seg = bytes([tq]) + bytes(int(x) for x in q)
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(seg)) + seg
    nf = len(planes)
    sof = struct.pack(">BHHB", 8, height, width, nf)
    for ci in range(nf):
        sof += bytes([ci + 1, (hv[ci][0] << 4) | hv[ci][1], qsel[ci]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for (kind, tcls), (counts, syms) in sorted(tables.items()):
        seg = bytes([((0 if kind == "dc" else 1) << 4) | tcls])
        seg += bytes(counts) + syms
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nf])
    for ci in range(nf):
        tcls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tcls << 4) | tcls])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += body
    out += b"\xff\xd9"  # EOI
    return bytes(out)
