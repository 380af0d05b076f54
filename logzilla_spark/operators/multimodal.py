"""Multimodal (image/audio) column plumbing over opaque binary payloads.

Media assets are carried as an opaque ``payload: binary`` column with
typed metadata (``meta struct<width,height,sample_rate,duration_ms>``),
the standard pattern for multimodal training corpora: Spark moves and
partitions the bytes; decode happens in Arrow-batched Python at the
edges.

Real vs stubbed, explicitly:
- REAL: the Spark-side plumbing — schemas, mapInPandas batch shapes,
  Arrow transfer, byte-level stats (length/header/checksum/slices).
  These are tested and oracle-checked (the fixture payloads are
  ASCII-range bytes so DuckDB can recompute checksums via decode()).
- REAL codec branches for the formats a pure stdlib can decode:
  payloads that actually ARE images/audio take a true decode path —
  PIL when importable, else the from-scratch PNG codec
  (``functions/png.py``) or baseline-JPEG codec (``functions/jpeg.py``)
  for images, and the PCM-WAV RIFF codec (``functions/wav.py``) for
  audio. Decoded truth beats metadata on these branches
  (tests/test_png_codec.py, test_jpeg_codec.py, test_wav_codec.py).
- STUBBED: every other codec (MP3, video containers, progressive/
  exotic JPEG — no PIL/libsndfile/ffmpeg in this container):
  clearly-marked deterministic byte math with the UDF signature,
  batch shape and output schema a real decoder would use; the oracle
  fixtures stay on this branch so the DuckDB twins recompute them
  bit-for-bit.

Scale notes: mapInPandas streams Arrow batches — payload bytes never
materialize on the driver and never shuffle (all outputs are narrow
projections). For 100 TB of media, set
``spark.sql.files.maxPartitionBytes`` so a task's batch of payloads
fits executor memory, and push metadata-only filters (kind, meta.*)
BEFORE the decode stage so parquet column pruning skips payload bytes
entirely for filtered-out rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from logzilla_spark.functions import jpeg, png
from logzilla_spark.functions.hashing import P31

MEDIA_STATS_SCHEMA = (
    "media_id long, kind string, header string, byte_len long, "
    "checksum long, body_checksum long"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, byte_len long, "
    "mean_byte_milli long, decoder string"
)

AUDIO_FRAMES_SCHEMA = (
    "media_id long, sample_rate int, duration_ms int, n_frames long, "
    "frame0_checksum long, decoder string"
)

VIDEO_FRAMES_SCHEMA = (
    "media_id long, frame_idx int, ts_ms int, fps int, frame_checksum long"
)

RESIZE_SCHEMA = (
    "media_id long, width int, height int, dst_width int, dst_height int, "
    "resized_len long, resized_checksum long, decoder string"
)

HEADER_LEN = 4
AUDIO_FRAME_MS = 250
VIDEO_SAMPLE_MS = 500
VIDEO_SLICE = 64  # bytes per sampled frame slice (fixture-scale)
RESIZE_MAX_DIM = 256


def _byte_sum(payload: bytes) -> int:
    return int(np.frombuffer(payload, dtype=np.uint8).sum(dtype=np.int64)) % P31


def _byte_sum_safe(payload: bytes | None) -> int | None:
    """None-propagating byte sum: a corrupt row (NULL payload) yields
    NULL stats instead of killing the job — the exact semantics of the
    DuckDB twin, where decode(NULL) folds to NULL."""
    return None if payload is None else _byte_sum(payload)


def media_stats(media: DataFrame) -> DataFrame:
    """Byte-level stats per asset via Arrow-batched mapInPandas.

    header = first 4 bytes (ascii tag), checksum = sum(bytes) mod P31,
    body_checksum = same over payload[4:]. Oracle-checked (DuckDB
    recomputes via ascii() folds over decode(payload)).
    """
    cols = media.select("media_id", "kind", "payload")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # NULL payloads yield NULL stats (nullable Int64, None-safe
        # maps) — one corrupt asset must not fail the corpus pass, and
        # the DuckDB twin keeps the row with NULL-folded values.
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "header": payloads.map(
                        lambda b: None
                        if b is None
                        else b[:HEADER_LEN].decode("ascii", errors="replace")
                    ),
                    "byte_len": payloads.map(
                        lambda b: None if b is None else len(b)
                    ).astype("Int64"),
                    "checksum": payloads.map(_byte_sum_safe).astype("Int64"),
                    "body_checksum": payloads.map(
                        lambda b: _byte_sum_safe(
                            None if b is None else b[HEADER_LEN:]
                        )
                    ).astype("Int64"),
                }
            )

    return cols.mapInPandas(stats, schema=MEDIA_STATS_SCHEMA)


def _decode_pixels(
    payload: bytes,
) -> tuple[int, int, int, bytes, str] | None:
    """Real decode dispatch: PIL when importable (the full-format
    production path), the pure-stdlib PNG and baseline-JPEG codecs
    otherwise. Returns (width, height, channels, raw pixel bytes,
    decoder name) or None when the payload is not a decodable image
    (callers fall back to the deterministic byte stub)."""
    try:  # pragma: no cover - PIL absent in this sandbox
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(payload))
        if img.mode not in ("L", "RGB"):
            img = img.convert("RGB")
        px = img.tobytes()
        return img.width, img.height, (1 if img.mode == "L" else 3), px, "pil"
    except ImportError:
        pass
    except Exception:
        return None
    if png.is_png(payload):
        codec, name = png.decode_png, "png-pure"
    elif jpeg.is_jpeg(payload):
        codec, name = jpeg.decode_jpeg, "jpeg-pure"
    else:
        return None
    try:
        return (*codec(payload), name)
    except ValueError:  # outside the codec's supported subset
        return None


def decode_image_features(media: DataFrame) -> DataFrame:
    """Per-image features with a REAL decode branch.

    Payloads that are decodable images (PIL when installed; the
    pure-stdlib PNG codec in ``functions/png.py`` or the baseline-JPEG
    codec in ``functions/jpeg.py`` otherwise) are actually decoded:
    width/height are the DECODED dimensions and mean_byte_milli =
    floor(1000 * sum(pixel bytes) / n_pixel_bytes) over the raw
    pixels — decoder column 'pil' / 'png-pure' / 'jpeg-pure'. Anything
    else (the ASCII oracle fixtures, corrupt bytes, formats outside
    the codec subsets) keeps the deterministic byte stub: meta
    dimensions, mean over RAW payload bytes, decoder
    'stub-deterministic' — so the DuckDB twin keeps recomputing the
    stub rows bit-for-bit while the codec branches are covered by
    PNG/JPEG fixture tests.
    """
    imgs = media.filter("kind = 'image'").select(
        "media_id", "payload", "meta.width", "meta.height"
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "media_id": [], "width": [], "height": [], "byte_len": [],
                "mean_byte_milli": [], "decoder": [],
            }
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                rows["media_id"].append(mid)
                decoded = None if payload is None else _decode_pixels(payload)
                if decoded is not None:
                    dw, dh, _ch, px, dec = decoded
                    rows["width"].append(dw)
                    rows["height"].append(dh)
                    rows["byte_len"].append(len(payload))
                    rows["mean_byte_milli"].append(
                        None
                        if not px
                        else (1000 * int(np.frombuffer(px, np.uint8).sum(dtype=np.int64)))
                        // len(px)
                    )
                    rows["decoder"].append(dec)
                    continue
                # deterministic byte stub: NULL meta stays NULL (the
                # fixture meta struct is sparse by kind), NULL/empty
                # payloads get NULL mean (the twin's x // 0 is NULL).
                rows["width"].append(None if pd.isna(w) else int(w))
                rows["height"].append(None if pd.isna(h) else int(h))
                blen = None if payload is None else len(payload)
                rows["byte_len"].append(blen)
                rows["mean_byte_milli"].append(
                    None
                    if not blen
                    else (1000 * int(np.frombuffer(payload, np.uint8).sum(dtype=np.int64)))
                    // blen
                )
                rows["decoder"].append("stub-deterministic")
            out = pd.DataFrame(rows)
            for c in ("width", "height"):
                out[c] = out[c].astype("Int32")
            for c in ("byte_len", "mean_byte_milli"):
                out[c] = out[c].astype("Int64")
            yield out

    return imgs.mapInPandas(feats, schema=IMAGE_FEATURES_SCHEMA)


def audio_frame_sample(media: DataFrame, frame_ms: int = AUDIO_FRAME_MS) -> DataFrame:
    """Frame sampling for audio assets, with a REAL PCM-WAV branch.

    Payloads that actually are PCM WAV files (the pure-stdlib RIFF
    codec in ``functions/wav.py``) are decoded: sample_rate comes from
    the file's fmt chunk (decoded truth beats lying metadata, same
    rule as the PNG image branch), duration_ms from the real sample
    count, and frame0_checksum is the byte-sum of the FIRST FRAME'S
    PCM bytes (sample_rate*frame_ms/1000 frames x block_align) —
    decoder 'wav-pcm'. Everything else (the ASCII oracle fixtures,
    corrupt bytes, non-WAV formats) keeps the deterministic byte
    stub: n_frames = meta duration_ms div frame_ms, checksum over the
    first 64 bytes after the header, decoder 'stub-deterministic' —
    the DuckDB twin recomputes the stub rows bit-for-bit while the
    codec branch is covered by WAV fixture tests.
    """
    auds = media.filter("kind = 'audio'").select(
        "media_id", "payload", "meta.sample_rate", "meta.duration_ms"
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # nullable Int dtypes + None-safe slicing: corrupt assets
        # (NULL payload / NULL meta) yield NULL fields, same as the
        # DuckDB twin's NULL folds — never a job-killing exception.
        from ..functions import wav

        slice_len = 64  # stub: bytes per sampled frame slice (fixture-scale)
        for pdf in batches:
            rows: dict[str, list] = {
                "media_id": [], "sample_rate": [], "duration_ms": [],
                "n_frames": [], "frame0_checksum": [], "decoder": [],
            }
            for mid, payload, rate, dur in zip(
                pdf["media_id"], pdf["payload"],
                pdf["sample_rate"], pdf["duration_ms"],
            ):
                rows["media_id"].append(mid)
                info = None
                if payload is not None and wav.is_wav(payload):
                    try:
                        info = wav.decode_wav(payload)
                    except ValueError:  # outside the PCM subset
                        info = None
                if info is not None:
                    dur_ms = info.duration_ms
                    per_frame = info.sample_rate * frame_ms // 1000
                    rows["sample_rate"].append(info.sample_rate)
                    rows["duration_ms"].append(dur_ms)
                    rows["n_frames"].append(dur_ms // frame_ms)
                    rows["frame0_checksum"].append(
                        _byte_sum(info.pcm[: per_frame * info.block_align])
                    )
                    rows["decoder"].append("wav-pcm")
                    continue
                rows["sample_rate"].append(None if pd.isna(rate) else int(rate))
                dur_i = None if pd.isna(dur) else int(dur)
                rows["duration_ms"].append(dur_i)
                rows["n_frames"].append(
                    None if dur_i is None else dur_i // frame_ms
                )
                rows["frame0_checksum"].append(
                    _byte_sum_safe(
                        None
                        if payload is None
                        else payload[HEADER_LEN : HEADER_LEN + slice_len]
                    )
                )
                rows["decoder"].append("stub-deterministic")
            out = pd.DataFrame(rows)
            for c in ("sample_rate", "duration_ms"):
                out[c] = out[c].astype("Int32")
            for c in ("n_frames", "frame0_checksum"):
                out[c] = out[c].astype("Int64")
            yield out

    return auds.mapInPandas(frames, schema=AUDIO_FRAMES_SCHEMA)


def video_frame_sample(
    media: DataFrame, every_ms: int = VIDEO_SAMPLE_MS
) -> DataFrame:
    """Frame-sampling manifest for video assets: ONE OUTPUT ROW PER
    SAMPLED FRAME (timestamps 0, every_ms, ... <= duration_ms), each
    with a checksum over that frame's byte slice — the row-explosion
    batch shape a real video pipeline uses (audio_frame_sample keeps
    one row per asset; this is the other contract). Codec work is
    stubbed per the module doc: slice k is the 64 bytes at
    header + k*64 (clipped; real byte slicing, DuckDB-verifiable);
    a real decoder would seek to ts_ms instead.

    Assets with NULL duration or payload emit NO rows (the twin's
    range(NULL) unnests to nothing). Output rows stay bounded by
    duration/every_ms — at 100 TB the explosion factor is explicit and
    caller-controlled, and payload bytes still never shuffle (the
    explosion happens inside the Arrow batch, emitting only scalars).
    """
    vids = media.filter("kind = 'video'").select(
        "media_id", "payload", "meta.sample_rate", "meta.duration_ms"
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "ts_ms": [],
                "fps": [], "frame_checksum": [],
            }
            for mid, payload, fps, dur in zip(
                pdf["media_id"], pdf["payload"],
                pdf["sample_rate"], pdf["duration_ms"],
            ):
                if payload is None or pd.isna(dur):
                    continue
                for k in range(int(dur) // int(every_ms) + 1):
                    start = HEADER_LEN + k * VIDEO_SLICE
                    out["media_id"].append(mid)
                    out["frame_idx"].append(k)
                    out["ts_ms"].append(k * int(every_ms))
                    out["fps"].append(None if pd.isna(fps) else int(fps))
                    out["frame_checksum"].append(
                        _byte_sum(payload[start : start + VIDEO_SLICE])
                    )
            pdf_out = pd.DataFrame(out)
            pdf_out["frame_idx"] = pdf_out["frame_idx"].astype("Int32")
            pdf_out["ts_ms"] = pdf_out["ts_ms"].astype("Int32")
            pdf_out["fps"] = pdf_out["fps"].astype("Int32")
            pdf_out["frame_checksum"] = pdf_out["frame_checksum"].astype("Int64")
            yield pdf_out

    return vids.mapInPandas(frames, schema=VIDEO_FRAMES_SCHEMA)


def _resize_geometry(w: int, h: int, max_dim: int) -> tuple[int, int]:
    """Longest side capped at ``max_dim``, aspect preserved via exact
    integer division — float scale factors are not oracle-portable."""
    long_side = max(w, h)
    if long_side <= max_dim:
        return w, h
    return max(1, (w * max_dim) // long_side), max(1, (h * max_dim) // long_side)


def resize_images(media: DataFrame, max_dim: int = RESIZE_MAX_DIM) -> DataFrame:
    """Resize for image assets, with a REAL resample branch.

    Decodable payloads (PIL if installed, else the pure-stdlib PNG or
    baseline-JPEG codecs) are actually decoded, nearest-neighbor
    resampled to the capped geometry (computed from the DECODED
    dimensions) and re-encoded as PNG; resized_len/resized_checksum
    are over the real re-encoded bytes (decoder 'pil' / 'png-pure' /
    'jpeg-pure'). Everything else keeps the deterministic byte stub —
    geometry from meta, "resized payload" = body prefix proportional
    to the pixel-count change — so the DuckDB twin's rows stay
    bit-identical (the oracle fixtures are ASCII payloads) while the
    codec branches are covered by PNG/JPEG fixture tests.

    NULL geometry/payload yield NULL outputs (row kept — the twin's
    NULL folds); images already within max_dim pass through at
    identity size.
    """
    imgs = media.filter("kind = 'image'").select(
        "media_id", "payload", "meta.width", "meta.height"
    )

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "media_id": [], "width": [], "height": [], "dst_width": [],
                "dst_height": [], "resized_len": [], "resized_checksum": [],
                "decoder": [],
            }
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                rows["media_id"].append(mid)
                decoded = None if payload is None else _decode_pixels(payload)
                if decoded is not None:
                    dw0, dh0, ch, px, dec = decoded
                    dw, dh = _resize_geometry(dw0, dh0, max_dim)
                    out_px = png.resize_nearest(dw0, dh0, ch, px, dw, dh)
                    # resized output is always PNG (lossless re-encode:
                    # the resample, not a second lossy compression, is
                    # the operation under test) regardless of the
                    # source codec
                    out_bytes = png.encode_png(dw, dh, out_px, ch)
                    rows["width"].append(dw0)
                    rows["height"].append(dh0)
                    rows["dst_width"].append(dw)
                    rows["dst_height"].append(dh)
                    rows["resized_len"].append(len(out_bytes))
                    rows["resized_checksum"].append(_byte_sum(out_bytes))
                    rows["decoder"].append(dec)
                    continue
                rows["decoder"].append("stub-deterministic")
                if payload is None or pd.isna(w) or pd.isna(h):
                    rows["width"].append(None if pd.isna(w) else int(w))
                    rows["height"].append(None if pd.isna(h) else int(h))
                    rows["dst_width"].append(None)
                    rows["dst_height"].append(None)
                    rows["resized_len"].append(None)
                    rows["resized_checksum"].append(None)
                    continue
                w, h = int(w), int(h)
                dw, dh = _resize_geometry(w, h, max_dim)
                body = payload[HEADER_LEN:]
                # zero-area geometry: NULL resample outputs (the twin's
                # x // 0 folds to NULL), identity dst
                rl = (
                    None if w * h == 0
                    else (len(body) * dw * dh) // (w * h)
                )
                rows["width"].append(w)
                rows["height"].append(h)
                rows["dst_width"].append(dw)
                rows["dst_height"].append(dh)
                rows["resized_len"].append(rl)
                rows["resized_checksum"].append(
                    None if rl is None else _byte_sum(body[:rl])
                )
            pdf_out = pd.DataFrame(rows)
            for c in ("width", "height", "dst_width", "dst_height"):
                pdf_out[c] = pdf_out[c].astype("Int32")
            for c in ("resized_len", "resized_checksum"):
                pdf_out[c] = pdf_out[c].astype("Int64")
            yield pdf_out

    return imgs.mapInPandas(rs, schema=RESIZE_SCHEMA)
