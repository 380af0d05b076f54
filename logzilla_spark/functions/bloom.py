"""Per-file bloom filters for point-predicate file skipping.

Manifest min/max (catalog.py `_collect_file_stats`) prunes range
queries on CLUSTERED columns, but is useless for equality lookups on
a high-cardinality column the table is not sorted by (every file's
[min, max] spans ~the whole domain, so nothing prunes). Iceberg solves
this with per-file bloom filters carried in Puffin sidecar files;
parquet 2 has the same idea at row-group level. This is that shape:
a deterministic bloom per (data file, column), stored in a sidecar
JSON the manifest references, consulted by point pruning only — a
bloom can prove ABSENCE ("no row in this file has v"), never presence,
so false positives cost a wasted read and false negatives are
impossible by construction.

Determinism: values canonicalize exactly like manifest stats
(catalog._stat_key — datetimes to UTC epoch micros, bools to ints),
then serialize with a type tag so int 1 and string "1" never collide,
and hash with md5 split into two 64-bit halves driving k double-hashed
probes (Kirsch-Mitzenmacher: h_j = h1 + j*h2 mod m, the standard
2-hash construction whose fpp matches k independent hashes). Same
bytes in -> same bits out on any host, so blooms built at write time
answer queries from any reader.
"""

from __future__ import annotations

import base64
import hashlib
import math

# fpp is per-file: at 1% a point lookup over F candidate files reads
# ~0.01*F spurious files — negligible against the unpruned F reads.
DEFAULT_FPP = 0.01
# refuse to bloom a file with more distincts than this: the bloom
# would be ~MB-scale and the column is likely near-unique per row, in
# which case min/max on a clustered layout is the right tool anyway
MAX_DISTINCT = 200_000


def _serialize(v) -> bytes | None:
    """Canonical, type-tagged bytes for hashing (None = unbloomable)."""
    if isinstance(v, bool):  # before int: bool is an int subclass
        v = int(v)
    if isinstance(v, int):
        return b"i:" + str(v).encode()
    if isinstance(v, str):
        return b"s:" + v.encode("utf-8")
    if isinstance(v, float):
        return b"f:" + repr(v).encode()
    if isinstance(v, bytes):
        return b"b:" + v
    return None


def _probes(data: bytes, m: int, k: int):
    d = hashlib.md5(data).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1  # odd -> full-period stride
    return ((h1 + j * h2) % m for j in range(k))


def bloom_params(n: int, fpp: float = DEFAULT_FPP) -> tuple[int, int]:
    """Optimal (m bits, k hashes) for n values at target fpp."""
    n = max(1, n)
    m = max(8, math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / n * math.log(2)))
    return m, k


def build_bloom(values, fpp: float = DEFAULT_FPP) -> dict | None:
    """Bloom over the distinct ``values`` (pre-canonicalized via
    catalog._stat_key). None when any value is unserializable or the
    set exceeds MAX_DISTINCT — absent bloom means "never prune", the
    same degrade-to-correct contract as missing min/max stats."""
    vals = set()
    for v in values:
        b = _serialize(v)
        if b is None:
            return None
        vals.add(b)
        if len(vals) > MAX_DISTINCT:
            return None
    m, k = bloom_params(len(vals), fpp)
    bits = bytearray((m + 7) // 8)
    for b in vals:
        for idx in _probes(b, m, k):
            bits[idx >> 3] |= 1 << (idx & 7)
    return {
        "n": len(vals),
        "m": m,
        "k": k,
        "b64": base64.b64encode(bytes(bits)).decode("ascii"),
    }


def bloom_may_contain(bloom: dict, value) -> bool:
    """False ONLY when the file provably holds no row with ``value``.
    Unserializable query values return True (can't prove absence)."""
    b = _serialize(value)
    if b is None:
        return True
    bits = bloom.get("_bits")
    if bits is None:  # memoized decode: sidecars are immutable and a
        # pruning pass probes the same bloom once per query point
        bits = bloom["_bits"] = base64.b64decode(bloom["b64"])
    for idx in _probes(b, bloom["m"], bloom["k"]):
        if not (bits[idx >> 3] >> (idx & 7)) & 1:
            return False
    return True
