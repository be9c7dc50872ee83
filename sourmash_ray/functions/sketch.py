"""Sketch kernels: k-shingle hashing + scaled/num MinHash retention.

Pure numpy — no Ray. These reproduce the *semantics* of the reference
engine's ``KmerMinHash`` (``/root/reference/src/core/src/sketch/minhash.rs``)
re-targeted at text: the hashed token is a k-byte shingle of normalized
text instead of a canonical k-mer
(``/root/reference/src/core/src/signature.rs:302-304``).

Invariants kept (SURVEY.md §1.3):

- hash = murmur3 x64_128 low word, seed 42.
- scaled keep-rule ``h <= max_hash_for_scaled(scaled)`` with the Rust
  truncation semantics (``minhash.rs:21-27``: ``(u64::MAX / scaled) as u64``
  via float — we use exact integer division, which matches the float
  truncation for all practical scaled values and is deterministic).
- num-mode keeps the ``num`` smallest distinct hashes (bottom-k,
  ``minhash.rs:346-382``).
- ``mins`` arrays are always sorted ascending (``minhash.rs:159-171``), so
  every binary op is a sorted-merge.
- identity ``md5sum`` = md5 over ``str(ksize)`` then each hash as a decimal
  string (``minhash.rs:290-307``).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

import numpy as np

from .murmur import DEFAULT_SEED, murmur64_fixedlen

MAX_U64 = 0xFFFFFFFFFFFFFFFF


def max_hash_for_scaled(scaled: int) -> int:
    """``minhash.rs:21-27`` — 0 for scaled=0 (num-mode), u64::MAX for 1."""
    if scaled == 0:
        return 0
    if scaled == 1:
        return MAX_U64
    return MAX_U64 // scaled


def scaled_for_max_hash(max_hash: int) -> int:
    if max_hash == 0:
        return 0
    return MAX_U64 // max_hash


@dataclass(frozen=True)
class SketchParams:
    """Mirror of ``ComputeParameters``
    (``/root/reference/src/sourmash/command_sketch.py:25-30,864``).

    Text analogue of the DNA defaults ``k=31,scaled=1000``; for short
    conversation transcripts the default is num-mode bottom-k, which keeps
    sketch size bounded and LSH-friendly regardless of text length.
    """

    ksize: int = 31               # shingle length in bytes of normalized text
    scaled: int = 0               # FracMinHash divisor; 0 => num-mode
    num: int = 256                # bottom-k size; 0 => scaled-mode
    seed: int = DEFAULT_SEED
    track_abundance: bool = False
    normalization: str = "ws"     # text normalization mode (see normalize_text)

    def __post_init__(self):
        if (self.scaled == 0) == (self.num == 0):
            raise ValueError("exactly one of scaled / num must be non-zero "
                             "(minhash.py:228-232 semantics)")

    @property
    def max_hash(self) -> int:
        return max_hash_for_scaled(self.scaled)


# ASCII whitespace class — kept identical across the scalar oracle path
# (python `re`), the vectorized path (pyarrow RE2) and DuckDB oracle SQL
# (RE2), so all three normalize bit-identically.
WS_PATTERN = r"[ \t\n\r\f\v]+"
ALNUM_DROP_PATTERN = r"[^a-z0-9]+"

_WS_RE = re.compile(WS_PATTERN)
_ALNUM_RE = re.compile(ALNUM_DROP_PATTERN)


def normalize_text(text: str, mode: str = "ws") -> bytes:
    """Text normalization — the analogue of the reference's alphabet
    encodings (``encodings.rs:307-368``: aa/dayhoff/hp modes).

    - ``"raw"``: utf-8 bytes as-is.
    - ``"ws"``: lowercase, collapse ASCII-whitespace runs to single spaces,
      strip ends.
    - ``"alnum"``: lowercase, collapse every non-[a-z0-9] run to a single
      space, strip ends.
    """
    if mode == "raw":
        return text.encode("utf-8")
    if mode == "ws":
        return _WS_RE.sub(" ", text.lower()).strip(" ").encode("utf-8")
    if mode == "alnum":
        return _ALNUM_RE.sub(" ", text.lower()).strip(" ").encode("utf-8")
    raise ValueError(f"unknown normalization mode: {mode}")


def shingle_hashes(data: bytes, ksize: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    """All k-byte shingle hashes of ``data`` (with multiplicity), uint64.

    The analogue of ``SeqToHashes`` (``signature.rs:166-399``): slide a
    k-byte window, murmur each window. No canonicalization for text
    (SURVEY.md §1.3 item 3).
    """
    n = len(data) - ksize + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8)
    # (n, ksize) sliding-window view, then one vectorized murmur pass.
    windows = np.lib.stride_tricks.sliding_window_view(buf, ksize)
    return murmur64_fixedlen(np.ascontiguousarray(windows), seed=seed)


def build_sketch(
    hashes: np.ndarray, params: SketchParams
) -> tuple[np.ndarray, np.ndarray | None, int]:
    """Apply the num/scaled retention rule to a raw hash stream.

    Returns ``(mins_sorted, abunds_or_None, n_unique_kmers)`` where
    ``n_unique_kmers`` is the count of distinct input hashes (pre-retention)
    — the analogue of the full k-mer cardinality tracked for gather stats.

    Semantics of ``add_hash`` (``minhash.rs:309-383``) applied in bulk:
    scaled-mode keeps every distinct hash ``<= max_hash``; num-mode keeps
    the ``num`` smallest distinct hashes; abundances count multiplicity.
    """
    if hashes.dtype != np.uint64:
        hashes = hashes.astype(np.uint64)
    uniq, counts = np.unique(hashes, return_counts=True)  # sorted ascending
    n_unique = int(uniq.size)
    if params.scaled:
        mask = uniq <= np.uint64(params.max_hash)
        mins = uniq[mask]
        abunds = counts[mask]
    else:
        mins = uniq[: params.num]
        abunds = counts[: params.num]
    if not params.track_abundance:
        return mins, None, n_unique
    return mins, abunds.astype(np.uint64), n_unique


def sketch_text(text: str, params: SketchParams) -> "Sketch":
    data = normalize_text(text, params.normalization)
    hashes = shingle_hashes(data, params.ksize, params.seed)
    mins, abunds, n_unique = build_sketch(hashes, params)
    return Sketch(mins=mins, abunds=abunds, params=params, n_kmers=n_unique)


def md5_of_mins(mins: np.ndarray, ksize: int) -> str:
    """``minhash.rs:290-307``: md5 over str(ksize) + each min as decimal.

    One join + one update — digest-identical to per-element updates (md5
    streams bytes), ~5× faster on long sketches."""
    payload = str(ksize) + "".join(map(str, mins.tolist()))
    return hashlib.md5(payload.encode("ascii")).hexdigest()


@dataclass
class Sketch:
    """In-memory sketch record — one row of the signatures table
    (FIXTURES.md §2). ``mins`` sorted ascending; ``abunds`` parallel or None.
    """

    mins: np.ndarray
    abunds: np.ndarray | None
    params: SketchParams
    n_kmers: int = 0
    name: str = ""
    _md5: str | None = field(default=None, repr=False)

    @property
    def md5(self) -> str:
        if self._md5 is None:
            self._md5 = md5_of_mins(self.mins, self.params.ksize)
        return self._md5

    def __len__(self) -> int:
        return int(self.mins.size)
