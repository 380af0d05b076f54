"""Round-6 ADVICE fixes (all three low-severity hardenings).

1. extract.py: bounded-but-large {m,n} over a group whose body repeats
   unboundedly is rejected (the (a+){1,1000} backtracking evasion);
   small counts — the (?:\\d+\\.){3} IP shape — stay legal.
2. __spark_entry__._rotation_ordered: CORRECTNESS_rNN.json rounds sort
   NUMERICALLY, so r100 ranks after r99 instead of before r11.
3. jpeg.py _BitReader: more than one synthesized zero-pad byte inside
   the scan raises (truncated entropy stream) instead of decoding
   fabricated flat blocks.
"""

from __future__ import annotations

import json

import pytest

from logzilla_spark.operators.extract import (
    QueryValidationError,
    _validate_portable_regex,
)


def test_counted_repeat_over_unbounded_group_rejected():
    for pat in [r"(a+){1,1000}", r"(a+){11}", r"(?:x*){999}"]:
        with pytest.raises(QueryValidationError):
            _validate_portable_regex(pat)


def test_small_counted_repeat_over_unbounded_group_allowed():
    for pat in [r"(?:\d+\.){3}(\d+)", r"(a+){3}", r"(a+){0,10}"]:
        _validate_portable_regex(pat)


def test_rotation_orders_rounds_numerically(tmp_path, monkeypatch):
    import __spark_entry__ as entry

    # synthesize a repo root where r100 exists: lexicographic sort
    # would rank "r100" before "r11" and mark its entries STALER
    import glob as glob_mod

    paths = []
    for rnd, names in [(9, ["q_a"]), (11, ["q_b"]), (100, ["q_c"])]:
        p = tmp_path / f"CORRECTNESS_r{rnd:02d}.json"
        p.write_text(json.dumps({n: {} for n in names}))
        paths.append(str(p))
    monkeypatch.setattr(glob_mod, "glob", lambda _pat, _ps=paths: list(_ps))
    q = {n: (lambda s, d: None) for n in ["q_a", "q_b", "q_c", "q_new"]}
    ordered = list(entry._rotation_ordered(q))
    # never-checked first, then oldest round first, r100 LAST
    assert ordered == ["q_new", "q_a", "q_b", "q_c"]


def test_jpeg_truncated_entropy_raises():
    from logzilla_spark.functions import jpeg

    w = h = 64
    pixels = bytes((x * 3 + y * 7) % 251 for y in range(h) for x in range(w))
    enc = jpeg.encode_jpeg(w, h, pixels, channels=1)
    # cut the entropy-coded data well short but keep a trailing EOI
    cut = enc[: len(enc) - 200] + b"\xff\xd9"
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(cut)
    # intact stream still round-trips (the final <8 pad bits stay legal)
    dw, dh, dc, _out = jpeg.decode_jpeg(enc)
    assert (dw, dh, dc) == (w, h, 1)
