"""Pure-stdlib PNG codec + the REAL decode branch of the multimodal
operators (round-3 verdict item 7: retire the decode stub for payloads
that are actual images).

The oracle fixtures stay ASCII payloads (stub path, DuckDB-twin
checked elsewhere); these tests feed REAL PNG bytes through the same
mapInPandas operators and assert decoded dimensions, pixel means and
re-encoded resample output.
"""

import struct
import zlib

import pytest

from logzilla_spark.functions import png


def _gradient(w, h, ch):
    return bytes(((x * 7 + y * 13 + c * 29) % 256)
                 for y in range(h) for x in range(w) for c in range(ch))


@pytest.mark.parametrize("w,h,ch", [(1, 1, 1), (5, 3, 1), (4, 4, 3), (7, 2, 3)])
def test_png_roundtrip(w, h, ch):
    px = _gradient(w, h, ch)
    data = png.encode_png(w, h, px, ch)
    assert png.is_png(data)
    dw, dh, dch, dpx = png.decode_png(data)
    assert (dw, dh, dch) == (w, h, ch)
    assert dpx == px


def _encode_with_filters(w, h, px, filters):
    """Hand-encode a grayscale PNG using a given filter type per
    scanline — covers decode paths the (filter-0-only) encoder never
    produces. Filters per RFC 2083 §6."""
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(w)
    for y in range(h):
        line = px[y * w : (y + 1) * w]
        ft = filters[y]
        raw.append(ft)
        for x in range(w):
            v = line[x]
            a = line[x - 1] if x else 0
            b = prev[x]
            c = prev[x - 1] if x else 0
            if ft == 0:
                raw.append(v)
            elif ft == 1:
                raw.append((v - a) & 0xFF)
            elif ft == 2:
                raw.append((v - b) & 0xFF)
            elif ft == 3:
                raw.append((v - (a + b) // 2) & 0xFF)
            elif ft == 4:
                raw.append((v - paeth(a, b, c)) & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        png.PNG_MAGIC
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + png._chunk(b"IEND", b"")
    )


def test_png_decode_all_filter_types():
    w, h = 6, 5
    px = _gradient(w, h, 1)
    data = _encode_with_filters(w, h, px, [0, 1, 2, 3, 4])
    dw, dh, dch, dpx = png.decode_png(data)
    assert (dw, dh, dch) == (w, h, 1)
    assert dpx == px


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        png.decode_png(b"not a png at all")
    # 16-bit depth: rejected, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = (
        png.PNG_MAGIC
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        png.decode_png(bad)


def test_resize_nearest_exact_grid():
    # 4x4 gray -> 2x2: nearest picks src (0,0),(2,0),(0,2),(2,2)
    px = bytes(range(16))
    out = png.resize_nearest(4, 4, 1, px, 2, 2)
    assert list(out) == [0, 2, 8, 10]
    # identity resize is a copy
    assert png.resize_nearest(4, 4, 1, px, 4, 4) == px


def _media_df(spark, payloads):
    rows = [
        (i, "image", p, (w, h, None, None))
        for i, (p, w, h) in enumerate(payloads)
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:int>",
    )


def test_decode_image_features_real_png_branch(spark):
    from logzilla_spark.operators.multimodal import decode_image_features

    w, h = 6, 4
    px = _gradient(w, h, 1)
    real = png.encode_png(w, h, px, 1)
    rgb = png.encode_png(3, 2, _gradient(3, 2, 3), 3)
    out = {
        r.media_id: r
        for r in decode_image_features(
            # meta LIES about the real image's dims (9x9) — the decoded
            # truth must win on the codec branch
            _media_df(spark, [(real, 9, 9), (rgb, 3, 2), (b"ascii-bytes", 5, 5)])
        ).collect()
    }
    assert out[0].decoder == "png-pure"
    assert (out[0].width, out[0].height) == (w, h)  # decoded, not meta
    assert out[0].byte_len == len(real)
    assert out[0].mean_byte_milli == (1000 * sum(px)) // len(px)
    assert out[1].decoder == "png-pure"
    assert (out[1].width, out[1].height) == (3, 2)
    # non-image payload keeps the deterministic stub (oracle parity)
    assert out[2].decoder == "stub-deterministic"
    assert (out[2].width, out[2].height) == (5, 5)
    assert out[2].mean_byte_milli == (1000 * sum(b"ascii-bytes")) // 11


def test_resize_images_real_png_branch(spark):
    from logzilla_spark.operators.multimodal import resize_images

    w, h = 8, 4
    px = _gradient(w, h, 1)
    real = png.encode_png(w, h, px, 1)
    out = {
        r.media_id: r
        for r in resize_images(
            _media_df(spark, [(real, 1, 1), (b"ascii-payload-bytes", 8, 4)]),
            max_dim=4,
        ).collect()
    }
    r0 = out[0]
    assert r0.decoder == "png-pure"
    assert (r0.width, r0.height) == (8, 4)         # decoded dims
    assert (r0.dst_width, r0.dst_height) == (4, 2)  # capped, aspect kept
    expect_px = png.resize_nearest(8, 4, 1, px, 4, 2)
    expect_bytes = png.encode_png(4, 2, expect_px, 1)
    assert r0.resized_len == len(expect_bytes)
    assert r0.resized_checksum == sum(expect_bytes) % (2**31 - 1)
    # and the re-encoded output actually decodes back to the resample
    assert png.decode_png(expect_bytes)[3] == expect_px
    # stub path unchanged for non-image payloads
    assert out[1].decoder == "stub-deterministic"
    assert (out[1].dst_width, out[1].dst_height) == (4, 2)
