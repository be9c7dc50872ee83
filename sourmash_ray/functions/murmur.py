"""MurmurHash3 x64_128 — first 64 bits (h1), default seed 42.

Reproduces the hash semantics of the reference engine
(``/root/reference/src/core/src/lib.rs:57-58``: ``murmurhash3_x64_128(b, 42).0``
and ``/root/reference/src/sourmash/minhash.py:35,88-93``) from the public
MurmurHash3 specification (Austin Appleby, public domain).

Two implementations:

- :func:`murmur64` — scalar pure-Python reference used in tests and for
  arbitrary-length inputs.
- :func:`murmur64_fixedlen` — numpy-vectorized over an ``(n, L)`` uint8
  matrix of equal-length byte strings; this is the hot-path kernel used by
  the shingling stage (every k-shingle of one config has the same byte
  length, so the tail-handling branch is fixed and fully vectorizable).

Both return the low 64 bits (h1 after finalization), matching the Rust
``murmurhash3`` crate's ``.0`` component.
"""

from __future__ import annotations

import numpy as np

MASK64 = 0xFFFFFFFFFFFFFFFF
DEFAULT_SEED = 42

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & MASK64
    k ^= k >> 33
    return k


def murmur64(data: bytes | str, seed: int = DEFAULT_SEED) -> int:
    """Scalar MurmurHash3 x64_128, returning the first (low) 64 bits."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    length = len(data)
    nblocks = length // 16

    h1 = seed & MASK64
    h2 = seed & MASK64

    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")

        k1 = (k1 * _C1) & MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & MASK64
        h1 = (h1 * 5 + 0x52DCE729) & MASK64

        k2 = (k2 * _C2) & MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & MASK64
        h2 = (h2 * 5 + 0x38495AB5) & MASK64

    tail = data[nblocks * 16 :]
    k1 = 0
    k2 = 0
    tl = len(tail)
    if tl > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * _C2) & MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & MASK64
        h2 ^= k2
    if tl > 0:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * _C1) & MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & MASK64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & MASK64
    # h2 = (h2 + h1) & MASK64  # not needed for the low word
    return h1


# ---------------------------------------------------------------------------
# Vectorized fixed-length variant
# ---------------------------------------------------------------------------

_U64 = np.uint64


def _np_rotl64(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _np_rotl64_inplace(x: np.ndarray, r: int, tmp: np.ndarray) -> None:
    np.right_shift(x, _U64(64 - r), out=tmp)
    np.left_shift(x, _U64(r), out=x)
    np.bitwise_or(x, tmp, out=x)


def _np_fmix64_inplace(k: np.ndarray, tmp: np.ndarray) -> None:
    np.right_shift(k, _U64(33), out=tmp)
    np.bitwise_xor(k, tmp, out=k)
    np.multiply(k, _U64(0xFF51AFD7ED558CCD), out=k)
    np.right_shift(k, _U64(33), out=tmp)
    np.bitwise_xor(k, tmp, out=k)
    np.multiply(k, _U64(0xC4CEB9FE1A85EC53), out=k)
    np.right_shift(k, _U64(33), out=tmp)
    np.bitwise_xor(k, tmp, out=k)


def _np_fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _U64(33))
    k = k * _U64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> _U64(33))
    k = k * _U64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> _U64(33))
    return k


def murmur64_fixedlen(mat: np.ndarray, seed: int = DEFAULT_SEED,
                      length: int | None = None) -> np.ndarray:
    """Vectorized MurmurHash3 x64_128 (low 64 bits) over equal-length rows.

    ``mat`` is an ``(n, L)`` uint8 array; each row is one L-byte message.
    Returns an ``(n,)`` uint64 array. Bit-identical to :func:`murmur64`.

    ``length``: logical message length when ``mat`` is already padded to a
    multiple of 8 bytes per row (``mat.shape[1] >= length``, pad bytes
    arbitrary — the tail masking ignores them). Callers on the hot path
    gather pre-padded windows to avoid a full-matrix pad copy here.
    """
    if mat.ndim != 2:
        raise ValueError("mat must be (n, L) uint8")
    n, width = mat.shape
    if length is None:
        length = width
    nblocks = length // 16
    tl = length - nblocks * 16

    C1 = _U64(_C1)
    C2 = _U64(_C2)

    h1 = np.full(n, seed, dtype=_U64)
    h2 = np.full(n, seed, dtype=_U64)

    # Read little-endian u64 lanes. Rows must span a whole number of u64
    # lanes covering `length`; pad here only if the caller didn't.
    need = nblocks * 16 + ((tl + 7) // 8) * 8
    target = max(need, ((width + 7) // 8) * 8)
    if width < target:
        mat = np.concatenate(
            [mat, np.zeros((n, target - width), dtype=np.uint8)], axis=1
        )
    lanes = mat.view("<u8")  # (n, width//8)

    old = np.seterr(over="ignore")
    # scratch buffers reused across blocks — the kernel is memory-bandwidth
    # bound under many concurrent tasks, so every avoided temporary counts
    tmp = np.empty(n, dtype=_U64)
    try:
        for i in range(nblocks):
            k1 = lanes[:, 2 * i].copy()
            k2 = lanes[:, 2 * i + 1].copy()

            np.multiply(k1, C1, out=k1)
            _np_rotl64_inplace(k1, 31, tmp)
            np.multiply(k1, C2, out=k1)
            np.bitwise_xor(h1, k1, out=h1)
            _np_rotl64_inplace(h1, 27, tmp)
            np.add(h1, h2, out=h1)
            np.multiply(h1, _U64(5), out=h1)
            np.add(h1, _U64(0x52DCE729), out=h1)

            np.multiply(k2, C2, out=k2)
            _np_rotl64_inplace(k2, 33, tmp)
            np.multiply(k2, C1, out=k2)
            np.bitwise_xor(h2, k2, out=h2)
            _np_rotl64_inplace(h2, 31, tmp)
            np.add(h2, h1, out=h2)
            np.multiply(h2, _U64(5), out=h2)
            np.add(h2, _U64(0x38495AB5), out=h2)

        if tl > 0:
            # Tail bytes, little-endian — masking off arbitrary pad bytes.
            base = 2 * nblocks
            if tl > 8:
                k2 = lanes[:, base + 1].copy()
                keep = (tl - 8) * 8
                np.bitwise_and(k2, _U64((1 << keep) - 1), out=k2)
                np.multiply(k2, C2, out=k2)
                _np_rotl64_inplace(k2, 33, tmp)
                np.multiply(k2, C1, out=k2)
                np.bitwise_xor(h2, k2, out=h2)
            k1 = lanes[:, base].copy()
            if tl < 8:
                np.bitwise_and(k1, _U64((1 << (tl * 8)) - 1), out=k1)
            np.multiply(k1, C1, out=k1)
            _np_rotl64_inplace(k1, 31, tmp)
            np.multiply(k1, C2, out=k1)
            np.bitwise_xor(h1, k1, out=h1)

        np.bitwise_xor(h1, _U64(length), out=h1)
        np.bitwise_xor(h2, _U64(length), out=h2)
        np.add(h1, h2, out=h1)
        np.add(h2, h1, out=h2)
        _np_fmix64_inplace(h1, tmp)
        _np_fmix64_inplace(h2, tmp)
        np.add(h1, h2, out=h1)
        return h1
    finally:
        np.seterr(**old)
