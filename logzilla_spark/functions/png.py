"""Minimal pure-stdlib PNG codec (zlib + struct) for the multimodal
decode path.

The container has no PIL, but PNG itself is simple enough that the
REAL decode branch does not need it: this module decodes (and encodes)
non-interlaced 8-bit grayscale and RGB PNGs — IHDR/IDAT/IEND, all five
scanline filter types (None/Sub/Up/Average/Paeth, RFC 2083 §6) — which
is exactly what the test fixtures and the sandbox pipeline need.
``decode_image_features`` / ``resize_images`` use PIL when it is
importable and fall back to this decoder for PNG payloads, so the
codec branch is real, covered, and deterministic in every environment.

Scope is deliberately tight (the supported subset raises ``ValueError``
on anything else — ancillary chunks are skipped, not mis-parsed):
production deployments swap in PIL for the full format zoo; the
dispatch and batch plumbing in operators/multimodal.py do not change.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3}


def is_png(data: bytes | None) -> bool:
    return data is not None and data[:8] == PNG_MAGIC


def _chunk(kind: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + kind
        + body
        + struct.pack(">I", zlib.crc32(kind + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 1) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``channels`` in {1: gray,
    3: RGB}) as a non-interlaced PNG with filter type 0 on every
    scanline. Deterministic: fixed zlib level, no ancillary chunks."""
    if channels not in (1, 3):
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a non-interlaced 8-bit gray/RGB PNG.

    Returns (width, height, channels, pixels) with pixels row-major
    unfiltered bytes. Raises ``ValueError`` for anything outside the
    supported subset (interlace, palette, alpha, 16-bit, truncation).
    """
    if not is_png(data):
        raise ValueError("not a PNG payload")
    pos, width = 8, None
    height = channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        kind = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        pos += 12 + length  # length + kind + body + crc
        if kind == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _CHANNELS:
                raise ValueError(f"unsupported PNG (depth={depth}, color={color})")
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG (compression/interlace)")
            channels = _CHANNELS[color]
        elif kind == b"IDAT":
            idat.extend(body)
        elif kind == b"IEND":
            break
        # ancillary chunks (tEXt, gAMA, ...) are skipped
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("scanline data does not match dimensions")
    out = bytearray(stride * height)
    prev_row_start = -1
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        row_start = y * stride
        for x in range(stride):
            v = line[x]
            a = out[row_start + x - channels] if x >= channels else 0
            b = out[prev_row_start + x] if y > 0 else 0
            c = (
                out[prev_row_start + x - channels]
                if (y > 0 and x >= channels)
                else 0
            )
            if ftype == 0:
                pass
            elif ftype == 1:
                v = (v + a) & 0xFF
            elif ftype == 2:
                v = (v + b) & 0xFF
            elif ftype == 3:
                v = (v + (a + b) // 2) & 0xFF
            elif ftype == 4:
                v = (v + _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"unknown filter type {ftype}")
            out[row_start + x] = v
        prev_row_start = row_start
    return width, height, channels, bytes(out)


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes, dst_w: int, dst_h: int
) -> bytes:
    """Nearest-neighbor resample of a raw pixel buffer (the classic
    sample-grid mapping: src = floor(dst * src_dim / dst_dim))."""
    stride = width * channels
    out = bytearray(dst_w * dst_h * channels)
    for y in range(dst_h):
        sy = y * height // dst_h
        for x in range(dst_w):
            sx = x * width // dst_w
            s = sy * stride + sx * channels
            d = (y * dst_w + x) * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)
