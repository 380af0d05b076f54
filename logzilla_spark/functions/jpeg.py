"""Minimal baseline-JPEG codec (ITU-T T.81 sequential DCT, Annex K
tables) for the multimodal decode path — numpy + stdlib only.

The container has no PIL; PNG gained a real pure codec in r4
(functions/png.py) and this module does the same for JPEG so
``decode_image_features`` / ``resize_images`` exercise a second real
format: baseline sequential (SOF0), 8-bit, grayscale or YCbCr with
sampling factors in {1, 2} (4:4:4, 4:2:2, 4:2:0), restart intervals,
0xFF byte unstuffing, standard + custom Huffman/quant tables read from
the stream. The encoder emits deterministic baseline 4:4:4 JPEGs with
the Annex K tables (libjpeg-style quality scaling) — fixture
generation without PIL.

Scope is deliberately tight, the png.py posture: anything outside the
subset (progressive SOF2, arithmetic coding, 12-bit, sampling factors
> 2) raises ``ValueError`` so callers fall back to the deterministic
byte stub rather than mis-decode. Production deployments swap in PIL
for the full format zoo; the dispatch and batch plumbing in
operators/multimodal.py do not change.

Written against the public JPEG spec (ITU-T T.81 / ISO 10918-1):
marker structure §B.2, Huffman coding §C/F.2, the Annex K example
tables, and the JFIF BT.601 color transform.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["is_jpeg", "encode_jpeg", "decode_jpeg"]

# -- constants (ITU-T T.81 Annex K — the public example tables) --------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

STD_LUMA_Q = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

STD_CHROMA_Q = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8x8 DCT-II basis: M[u, x] = 1/2 C(u) cos((2x+1)uπ/16); orthogonal,
# so FDCT = M B Mᵀ and IDCT = Mᵀ C M with the JPEG normalization
_DCT_M = np.array(
    [
        [
            0.5 * (1 / math.sqrt(2) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def is_jpeg(data: bytes | None) -> bool:
    return data is not None and data[:3] == b"\xff\xd8\xff"


def _quality_tables(quality: int) -> tuple[list[int], list[int]]:
    """libjpeg-style quality scaling of the Annex K tables."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (STD_LUMA_Q, STD_CHROMA_Q):
        out.append([max(1, min(255, (b * scale + 50) // 100)) for b in base])
    return out[0], out[1]


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, n_bits), canonical assignment (T.81 §C.2)."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(n_bits, code) -> value."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """(category, bits) for a DC diff / AC coefficient (T.81 F.1.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (§B.1.1.5)
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self._pad = 0  # zero bytes synthesized after an in-scan marker

    def align(self) -> None:
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                # a real marker inside the scan — treat trailing reads
                # as zero bits (some encoders rely on the final pad),
                # but only the final <8 pad bits are legitimate: a
                # decoder still hungry after one synthesized byte is
                # reading a TRUNCATED entropy stream (e.g. cut scan
                # data with a trailing EOI) and must raise so callers
                # fall back to the deterministic stub instead of
                # fabricating flat blocks.
                if self._pad >= 1:
                    raise ValueError("truncated entropy-coded segment")
                self._pad += 1
                self.pos -= 1
                b = 0
                self._acc = (self._acc << 8) | b
                self._n += 8
                return
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


# -- encoder -----------------------------------------------------------


def _encode_block(
    block: np.ndarray,
    qtab: np.ndarray,
    dc_tab: dict,
    ac_tab: dict,
    pred: int,
    bw: _BitWriter,
) -> int:
    coef = _DCT_M @ (block - 128.0) @ _DCT_M.T
    quant = np.floor(coef / qtab + 0.5).astype(np.int32)  # round half up
    zz = quant.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    s, bits = _magnitude(dc - pred)
    code, length = dc_tab[s]
    bw.write(code, length)
    if s:
        bw.write(bits, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s, bits = _magnitude(v)
        code, length = ac_tab[(run << 4) | s]
        bw.write(code, length)
        bw.write(bits, s)
        run = 0
    if last_nz != 63:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return dc


def encode_jpeg(
    width: int, height: int, pixels: bytes, channels: int = 1, quality: int = 75
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``channels`` in {1: gray,
    3: RGB}) as a baseline sequential 4:4:4 JPEG with the Annex K
    Huffman tables. Deterministic: fixed tables, fixed traversal, no
    ancillary segments beyond JFIF-APP0."""
    if channels not in (1, 3):
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    luma_q, chroma_q = _quality_tables(quality)
    arr = np.frombuffer(pixels, np.uint8).astype(np.float64).reshape(
        height, width, channels
    )
    if channels == 1:
        planes = [arr[:, :, 0]]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    bw_pad = (-width) % 8
    bh_pad = (-height) % 8
    planes = [
        np.pad(p, ((0, bh_pad), (0, bw_pad)), mode="edge") for p in planes
    ]
    qtabs = [
        np.array(luma_q, np.float64).reshape(8, 8),
        np.array(chroma_q, np.float64).reshape(8, 8),
    ]
    dc_enc = [
        _huff_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
        _huff_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_enc = [
        _huff_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
        _huff_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HHBB", 1, 1, 0, 0)  # APP0
    for tid, tab in enumerate((luma_q, chroma_q)[: 1 if channels == 1 else 2]):
        zz = [tab[ZIGZAG[i]] for i in range(64)]
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(zz)
    # SOF0
    ncomp = channels
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, 8, height, width, ncomp
    )
    for ci in range(ncomp):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    # DHT
    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return (
            b"\xff\xc4"
            + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
            + bytes(bits)
            + bytes(vals)
        )

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if channels == 3:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        out += struct.pack("BB", ci + 1, (tid << 4) | tid)
    out += bytes([0, 63, 0])

    bw = _BitWriter()
    preds = [0] * ncomp
    bh8, bw8 = planes[0].shape[0] // 8, planes[0].shape[1] // 8
    for by in range(bh8):
        for bx in range(bw8):
            for ci in range(ncomp):
                tid = 0 if ci == 0 else 1
                block = planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                preds[ci] = _encode_block(
                    block, qtabs[tid], dc_enc[tid], ac_enc[tid], preds[ci], bw
                )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder -----------------------------------------------------------


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline sequential JPEG (SOF0, 8-bit, 1 or 3
    components, sampling factors in {1, 2}).

    Returns (width, height, channels, pixels) row-major. Raises
    ``ValueError`` for anything outside the subset (progressive,
    arithmetic coding, 12-bit, >2x sampling, truncation).
    """
    if not is_jpeg(data):
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    width = height = 0
    comps: list[dict] = []
    restart_interval = 0

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = body[b + 1 : b + 65]
                tab = np.zeros(64, np.float64)
                for i in range(64):
                    tab[ZIGZAG[i]] = zz[i]
                qtabs[tq] = tab.reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                huff[(cls, tid)] = _huff_decode_table(bits, vals)
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            depth, height, width, nc = struct.unpack(">BHHB", body[:6])
            if depth != 8:
                raise ValueError("only 8-bit baseline supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                h, v = hv >> 4, hv & 0x0F
                if h not in (1, 2) or v not in (1, 2):
                    raise ValueError("sampling factors > 2 unsupported")
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/extended)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_sel = []
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                scan_sel.append((cid, tabs >> 4, tabs & 0x0F))
            pos = pos + 2 + seglen
            return _decode_scan(
                data, pos, width, height, comps, scan_sel, qtabs, huff,
                restart_interval,
            )
        # APPn/COM/etc: skipped
        pos += 2 + seglen
    raise ValueError("no scan data (missing SOS)")


def _decode_scan(
    data: bytes,
    pos: int,
    width: int,
    height: int,
    comps: list[dict],
    scan_sel: list[tuple[int, int, int]],
    qtabs: dict[int, np.ndarray],
    huff: dict[tuple[int, int], dict],
    restart_interval: int,
) -> tuple[int, int, int, bytes]:
    if not comps or not width or not height:
        raise ValueError("SOS before SOF")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for cid, dc_id, ac_id in scan_sel:
        c = by_id.get(cid)
        if c is None:
            raise ValueError("scan references unknown component")
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise ValueError("scan references missing Huffman table")
        if c["tq"] not in qtabs:
            raise ValueError("component references missing quant table")
        order.append((c, huff[(0, dc_id)], huff[(1, ac_id)], qtabs[c["tq"]]))

    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), np.float64)
        for c, *_ in order
    ]
    preds = [0] * len(order)
    br = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align()
                p = br.pos
                if p + 2 <= len(data) and data[p] == 0xFF and \
                        0xD0 <= data[p + 1] <= 0xD7:
                    br.pos = p + 2
                    preds = [0] * len(order)
                else:
                    raise ValueError("missing restart marker")
            for oi, (c, dc_tab, ac_tab, qtab) in enumerate(order):
                for v in range(c["v"]):
                    for h in range(c["h"]):
                        zz = np.zeros(64, np.int32)
                        s = br.read_huff(dc_tab)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        preds[oi] += diff
                        zz[0] = preds[oi]
                        i = 1
                        while i < 64:
                            rs = br.read_huff(ac_tab)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:
                                    i += 16  # ZRL
                                    continue
                                break  # EOB
                            i += run
                            if i > 63:
                                raise ValueError("AC run past block end")
                            zz[i] = _extend(br.read_bits(size), size)
                            i += 1
                        coef = np.zeros(64, np.float64)
                        coef[ZIGZAG] = zz
                        block = _DCT_M.T @ (coef.reshape(8, 8) * qtab) @ _DCT_M
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + h) * 8
                        planes[oi][y0 : y0 + 8, x0 : x0 + 8] = block + 128.0
            mcu_count += 1

    chans = len(order)
    full = np.zeros((height, width, chans), np.float64)
    ys = np.arange(height)
    xs = np.arange(width)
    for oi, (c, *_rest) in enumerate(order):
        sy = ys * c["v"] // vmax
        sx = xs * c["h"] // hmax
        full[:, :, oi] = planes[oi][np.ix_(sy, sx)]
    if chans == 1:
        out = full[:, :, 0]
    else:
        y, cb, cr = full[:, :, 0], full[:, :, 1] - 128.0, full[:, :, 2] - 128.0
        out = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=2,
        )
    pixels = np.clip(np.round(out), 0, 255).astype(np.uint8).tobytes()
    return width, height, chans, pixels
