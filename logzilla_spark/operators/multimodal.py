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
- STUBBED: actual image/audio codec work. The container has no
  PIL/libsndfile; ``decode_image_features`` tries to import PIL and
  otherwise falls back to a clearly-marked deterministic fake
  (checksum-derived "mean pixel"), keeping the UDF signature, batch
  shape and output schema identical to what a real decoder would use.

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
    "frame0_checksum long"
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


def decode_image_features(media: DataFrame) -> DataFrame:
    """Per-image features. Decode step is STUBBED (see module doc).

    With PIL available the real path would decode payload bytes and
    measure actual pixels; in this container the deterministic fake
    derives mean_byte_milli = floor(1000 * sum(bytes)/len) from the raw
    payload — same schema, same batch shape, marked via ``decoder``.
    """
    imgs = media.filter("kind = 'image'").select(
        "media_id", "payload", "meta.width", "meta.height"
    )

    try:  # pragma: no cover - PIL absent in this environment
        import PIL.Image  # noqa: F401

        decoder = "pil"
    except ImportError:
        decoder = "stub-deterministic"

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "pil":  # pragma: no cover
                # Real path: PIL.Image.open(io.BytesIO(b)) per payload.
                raise NotImplementedError(
                    "real codec path requires fixture payloads that are "
                    "valid image bytes; not exercised in this sandbox"
                )
            payloads = pdf["payload"]
            # nullable Int dtypes: NULL meta stays NULL (the fixture
            # meta struct is sparse by kind), NULL/empty payloads get
            # NULL mean (the twin's x // 0 is NULL) instead of raising.
            lens = payloads.map(lambda b: None if b is None else len(b)).astype(
                "Int64"
            )
            sums = payloads.map(
                lambda b: None
                if b is None
                else int(np.frombuffer(b, dtype=np.uint8).sum(dtype=np.int64))
            ).astype("Int64")
            mean = (sums * 1000).floordiv(lens.where(lens != 0))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"].astype("Int32"),
                    "height": pdf["height"].astype("Int32"),
                    "byte_len": lens,
                    "mean_byte_milli": mean.astype("Int64"),
                    "decoder": decoder,
                }
            )

    return imgs.mapInPandas(feats, schema=IMAGE_FEATURES_SCHEMA)


def audio_frame_sample(media: DataFrame, frame_ms: int = AUDIO_FRAME_MS) -> DataFrame:
    """Frame sampling plumbing for audio assets.

    n_frames = duration_ms div frame_ms (real arithmetic from typed
    metadata); frame0_checksum = byte-sum of the first frame-sized
    slice after the header (real byte slicing — DuckDB-verifiable).
    Actual resampling/codec work would replace the slice math; the
    partitioning, batch shape and schema are what production uses.
    """
    auds = media.filter("kind = 'audio'").select(
        "media_id", "payload", "meta.sample_rate", "meta.duration_ms"
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # nullable Int dtypes + None-safe slicing: corrupt assets
        # (NULL payload / NULL meta) yield NULL fields, same as the
        # DuckDB twin's NULL folds — never a job-killing exception.
        for pdf in batches:
            n_frames = (pdf["duration_ms"].astype("Int64") // frame_ms)
            slice_len = 64  # bytes per sampled frame slice (fixture-scale)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pdf["sample_rate"].astype("Int32"),
                    "duration_ms": pdf["duration_ms"].astype("Int32"),
                    "n_frames": n_frames,
                    "frame0_checksum": pdf["payload"].map(
                        lambda b: _byte_sum_safe(
                            None
                            if b is None
                            else b[HEADER_LEN : HEADER_LEN + slice_len]
                        )
                    ).astype("Int64"),
                }
            )

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


def resize_images(media: DataFrame, max_dim: int = RESIZE_MAX_DIM) -> DataFrame:
    """Resize plumbing for image assets: integer target geometry
    (longest side capped at ``max_dim``, aspect preserved via exact
    integer division — float scale factors are not oracle-portable)
    plus a stubbed byte resample: the "resized payload" is the body
    prefix proportional to the pixel-count change, its length and
    checksum computed from real byte slicing. A real decoder
    (PIL.Image.resize) would replace the prefix math; schema, batch
    shape and NULL semantics are production's.

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
            }
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                rows["media_id"].append(mid)
                if payload is None or pd.isna(w) or pd.isna(h):
                    rows["width"].append(None if pd.isna(w) else int(w))
                    rows["height"].append(None if pd.isna(h) else int(h))
                    rows["dst_width"].append(None)
                    rows["dst_height"].append(None)
                    rows["resized_len"].append(None)
                    rows["resized_checksum"].append(None)
                    continue
                w, h = int(w), int(h)
                long_side = max(w, h)
                if long_side <= max_dim:
                    dw, dh = w, h
                else:
                    dw = max(1, (w * max_dim) // long_side)
                    dh = max(1, (h * max_dim) // long_side)
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
            pdf_out["decoder"] = "stub-deterministic"
            yield pdf_out

    return imgs.mapInPandas(rs, schema=RESIZE_SCHEMA)
