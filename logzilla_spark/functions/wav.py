"""Pure-stdlib PCM WAV codec (RIFF/WAVE, public Microsoft/IBM spec).

The sibling of :mod:`.png`: the container has no soundfile/audioop
libraries, but integer-PCM WAV is a trivial RIFF container — so the
audio operators (operators/multimodal.py) get a REAL decode branch
instead of a byte stub when a payload actually is a WAV file. Only
what the pipeline needs is implemented: uncompressed integer PCM
(format tag 1), 8/16/32-bit, any channel count / sample rate; chunk
walking tolerates extra chunks (LIST/fact/cue) like real encoders
emit. Anything else raises ValueError and callers fall back to the
deterministic stub — fail-closed, never a job-killing exception.
"""

from __future__ import annotations

import struct

__all__ = ["is_wav", "encode_wav", "decode_wav", "WavInfo"]


class WavInfo:
    """Decoded WAV: sample_rate, channels, bits, pcm (raw data bytes).

    ``n_samples`` = frames per channel; ``duration_ms`` floored, the
    arithmetic the frame-sampling operator uses.
    """

    __slots__ = ("sample_rate", "channels", "bits", "pcm")

    def __init__(self, sample_rate: int, channels: int, bits: int, pcm: bytes):
        self.sample_rate = sample_rate
        self.channels = channels
        self.bits = bits
        self.pcm = pcm

    @property
    def block_align(self) -> int:
        return self.channels * (self.bits // 8)

    @property
    def n_samples(self) -> int:
        return len(self.pcm) // self.block_align

    @property
    def duration_ms(self) -> int:
        return self.n_samples * 1000 // self.sample_rate


def is_wav(payload: bytes | None) -> bool:
    return (
        payload is not None
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def encode_wav(
    pcm: bytes, sample_rate: int, channels: int = 1, bits: int = 16
) -> bytes:
    """Raw little-endian interleaved PCM -> a canonical WAV file."""
    if bits not in (8, 16, 32):
        raise ValueError(f"unsupported bits_per_sample {bits}")
    block = channels * (bits // 8)
    if block == 0 or len(pcm) % block:
        raise ValueError("pcm length is not a whole number of frames")
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> WavInfo:
    """Parse a PCM WAV; raises ValueError outside the supported subset."""
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_end = pos + 8 + size
        if body_end > n:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            tag, channels, rate, _brate, block, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8
            )
            if tag != 1:
                raise ValueError(f"unsupported format tag {tag} (PCM only)")
            if bits not in (8, 16, 32):
                raise ValueError(f"unsupported bits_per_sample {bits}")
            if channels == 0 or rate == 0:
                raise ValueError("zero channels or sample rate")
            if block != channels * (bits // 8):
                raise ValueError("block_align inconsistent with channels/bits")
            fmt = (rate, channels, bits, block)
        elif cid == b"data":
            data = payload[pos + 8 : body_end]
        pos = body_end + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    rate, channels, bits, block = fmt
    if len(data) % block:
        data = data[: len(data) - (len(data) % block)]  # trailing partial frame
    return WavInfo(rate, channels, bits, data)
