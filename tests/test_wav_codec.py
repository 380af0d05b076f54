"""Pure-stdlib PCM WAV codec + the REAL decode branch of
audio_frame_sample (the audio sibling of the round-4 PNG work: retire
the byte stub for payloads that actually are WAV files).

The oracle fixtures stay ASCII 'AUD0' payloads (stub path, DuckDB-twin
checked by q_media_audio_frames); these tests feed REAL RIFF/WAVE
bytes through the same mapInPandas operator and assert decoded rate,
sample-count-derived duration, and first-frame PCM checksums.
"""

import struct

import pytest

from logzilla_spark.functions import wav


def _pcm16(samples):
    return struct.pack(f"<{len(samples)}h", *samples)


@pytest.mark.parametrize(
    "rate,channels,bits,n",
    [(8000, 1, 16, 80), (16000, 2, 16, 33), (44100, 1, 8, 441), (22050, 2, 32, 10)],
)
def test_wav_roundtrip(rate, channels, bits, n):
    frame_bytes = channels * bits // 8
    pcm = bytes((i * 37 + 11) % 256 for i in range(n * frame_bytes))
    data = wav.encode_wav(pcm, rate, channels, bits)
    assert wav.is_wav(data)
    info = wav.decode_wav(data)
    assert (info.sample_rate, info.channels, info.bits) == (rate, channels, bits)
    assert info.pcm == pcm
    assert info.n_samples == n
    assert info.duration_ms == n * 1000 // rate


def test_wav_tolerates_extra_chunks_and_word_alignment():
    pcm = _pcm16([0, 1000, -1000, 32767, -32768])
    base = wav.encode_wav(pcm, 8000, 1, 16)
    # splice a LIST chunk with an ODD size (word-aligned with a pad
    # byte, like real encoders emit) between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = base[:fmt_end] + extra + base[fmt_end:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    info = wav.decode_wav(spliced)
    assert info.pcm == pcm and info.sample_rate == 8000


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:20],  # truncated mid-fmt
        lambda b: b.replace(b"WAVE", b"AVI "),  # wrong form type
        lambda b: b[:20] + struct.pack("<H", 3) + b[22:],  # float format tag
        lambda b: b[:34] + struct.pack("<H", 24) + b[36:],  # 24-bit unsupported
        lambda b: b[:12] + b[12 + 24 :],  # fmt chunk removed
    ],
)
def test_wav_rejects_unsupported(mutate):
    good = wav.encode_wav(_pcm16([1, 2, 3, 4]), 8000, 1, 16)
    with pytest.raises(ValueError):
        wav.decode_wav(mutate(good))


def test_wav_trailing_partial_frame_clipped():
    good = wav.encode_wav(_pcm16([1, 2, 3, 4]), 8000, 2, 16)
    # grow the data chunk size by 1 and append a stray byte: the
    # partial frame must be clipped, not crash the frame math
    clipped = bytearray(good)
    clipped[12 + 24 + 4 : 12 + 24 + 8] = struct.pack("<I", 9)
    clipped += b"\xff"
    info = wav.decode_wav(bytes(clipped))
    assert info.n_samples == 2  # 9 bytes // block_align 4 -> 2 whole frames


def _media_df(spark, payloads):
    rows = [
        (i, "audio", p, (None, None, rate, dur))
        for i, (p, rate, dur) in enumerate(payloads)
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:int>",
    )


def test_audio_frame_sample_real_wav_branch(spark):
    from logzilla_spark.operators.multimodal import audio_frame_sample

    rate, frame_ms = 8000, 250
    n = rate // 2 + rate // 8  # 625 ms of audio
    pcm = bytes((i * 13 + 7) % 256 for i in range(n * 2))  # 16-bit mono
    real = wav.encode_wav(pcm, rate, 1, 16)
    out = {
        r.media_id: r
        for r in audio_frame_sample(
            # meta LIES about the real file (99Hz/10ms) — decoded truth wins
            _media_df(
                spark,
                [
                    (real, 99, 10),
                    (b"AUD0" + b"x" * 100, 16000, 1234),  # fixture-style stub
                    (b"RIFF\x04\x00\x00\x00WAVE", 1, 1),  # broken WAV -> stub
                    (None, 8000, 500),  # NULL payload
                ],
            ),
            frame_ms=frame_ms,
        ).collect()
    }
    r0 = out[0]
    assert r0.decoder == "wav-pcm"
    assert r0.sample_rate == rate and r0.duration_ms == 625
    assert r0.n_frames == 625 // frame_ms
    per_frame_bytes = (rate * frame_ms // 1000) * 2
    assert r0.frame0_checksum == sum(pcm[:per_frame_bytes])
    # stub rows: meta-derived, first 64 bytes after the 4-byte header
    r1 = out[1]
    assert r1.decoder == "stub-deterministic"
    assert r1.sample_rate == 16000 and r1.n_frames == 1234 // frame_ms
    assert r1.frame0_checksum == sum((b"x" * 100)[:64])
    assert out[2].decoder == "stub-deterministic"  # fail-closed broken WAV
    r3 = out[3]
    assert r3.decoder == "stub-deterministic" and r3.frame0_checksum is None
