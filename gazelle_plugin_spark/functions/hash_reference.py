"""Pure-Python reference implementations of Spark's native hash
functions, the VALUE oracle for expr_hash_native: its DuckDB oracle is a
VALUES list generated from these functions (DuckDB has no
DuckDB analog — DuckDB's hash() is a different algorithm and it ships
no sha1). Both follow public specifications:

- ``murmur3_spark``: MurmurHash3 x86_32 as Spark computes it for
  string input (seed 42) — 4-byte little-endian words, then each TAIL
  byte sign-extended and mixed as its own word (Spark's
  Murmur3_x86_32.hashUnsafeBytes semantics, which deviates from the
  canonical murmur3 tail handling), fmix finalizer, signed int32.
- ``xxhash64_spark``: canonical xxHash64 (seed 42) — 32-byte stripes
  with four accumulators, 8/4/1-byte tail, avalanche finalizer,
  signed int64.

Reference parity: the reference converts these natively
(ColumnarExpressionConverter.scala:484-493 Murmur3Hash case); here
Spark's JVM implementations are the engine path and this module is
the independent cross-check.
"""

M = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF

def _rotl32(x, n): return ((x << n) | (x >> (32 - n))) & M

def _mix_k1(k1):
    k1 = (k1 * 0xCC9E2D51) & M
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & M

def _mix_h1(h1, k1):
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & M

def murmur3_spark(data: bytes, seed: int = 42) -> int:
    h1 = seed & M
    n = len(data)
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        word = int.from_bytes(data[i:i+4], "little")
        h1 = _mix_h1(h1, _mix_k1(word))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128: b -= 256           # signed byte, sign-extended to int
        h1 = _mix_h1(h1, _mix_k1(b & M))
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1

P1 = 0x9E3779B185EBCA87; P2 = 0xC2B2AE3D27D4EB4F; P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63; P5 = 0x27D4EB2F165667C5

def _rotl64(x, n): return ((x << n) | (x >> (64 - n))) & M64

def xxhash64_spark(data: bytes, seed: int = 42) -> int:
    n = len(data); i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64; v2 = (seed + P2) & M64
        v3 = seed & M64; v4 = (seed - P1) & M64
        while i <= n - 32:
            v1 = (_rotl64((v1 + int.from_bytes(data[i:i+8],"little") * P2) & M64, 31) * P1) & M64
            v2 = (_rotl64((v2 + int.from_bytes(data[i+8:i+16],"little") * P2) & M64, 31) * P1) & M64
            v3 = (_rotl64((v3 + int.from_bytes(data[i+16:i+24],"little") * P2) & M64, 31) * P1) & M64
            v4 = (_rotl64((v4 + int.from_bytes(data[i+24:i+32],"little") * P2) & M64, 31) * P1) & M64
            i += 32
        h = (_rotl64(v1,1) + _rotl64(v2,7) + _rotl64(v3,12) + _rotl64(v4,18)) & M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * P2) & M64, 31) * P1) & M64
            h = (h * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i <= n - 8:
        k = (_rotl64((int.from_bytes(data[i:i+8],"little") * P2) & M64, 31) * P1) & M64
        h = ((_rotl64(h ^ k, 27) * P1) + P4) & M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i+4],"little") * P1) & M64
        h = ((_rotl64(h, 23) * P2) + P3) & M64
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M64
        h = (_rotl64(h, 11) * P1) & M64
        i += 1
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h
