"""Pure-python XXH64 (public spec, Y. Collet) bit-exact with Spark's
`xxhash64` — the independent oracle for the hash-family dedup operators.

Spark semantics reproduced:
  - strings: XXH64 over UTF-8 bytes, default seed 42;
  - int32 literals/columns: the dedicated 4-byte finalize path;
  - multi-argument xxhash64(a, b, ...): each field hashed with the previous
    result as the seed (chained), starting from 42;
  - result reinterpreted as SIGNED 64-bit (Spark returns LongType).
"""

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    seed &= M
    n, i = len(data), 0
    if n >= 32:
        v = [(seed + P1 + P2) & M, (seed + P2) & M, seed, (seed - P1) & M]
        while i + 32 <= n:
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                vj = (v[j] + lane * P2) & M
                v[j] = (_rotl(vj, 31) * P1) & M
            i += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)) & M
        for vj in v:
            h ^= (_rotl((vj * P2) & M, 31) * P1) & M
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        k = (_rotl((k * P2) & M, 31) * P1) & M
        h ^= k
        h = (_rotl(h, 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    return _fmix(h)


def xxh64_int32(value: int, seed: int) -> int:
    """Spark XxHash64.hashInt: the 4-byte finalize path over the int32."""
    h = (seed + P5 + 4) & M
    h ^= ((value & 0xFFFFFFFF) * P1) & M
    h = (_rotl(h, 23) * P2 + P3) & M
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """Spark XxHash64.hashLong: the 8-byte path over the int64."""
    h = (seed + P5 + 8) & M
    k = (_rotl(((value & M) * P2) & M, 31) * P1) & M
    h ^= k
    h = (_rotl(h, 27) * P1 + P4) & M
    return _fmix(h)


def signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def spark_xxhash64_int_str(i: int, s: str) -> int:
    """xxhash64(lit(i), col_str): chained — string hashed with hash(i) seed."""
    return signed(xxh64_bytes(s.encode("utf-8"), xxh64_int32(i, 42)))


def spark_xxhash64_str(s: str) -> int:
    return signed(xxh64_bytes(s.encode("utf-8"), 42))
