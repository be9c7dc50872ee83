"""Bloom-filter Nodegraph — the reference's SBT internal-node structure.

Semantics ported from ``/root/reference/src/core/src/sketch/nodegraph.rs``
(k tables of bitsets sized to descending odd primes; ``count/get/update/
matches/similarity/containment``; khmer "OXLI" v4 binary save format, see
``nodegraph.rs:178-280`` and the reader in
``/root/reference/src/sourmash/nodegraph.py:104-142``) — re-expressed as
vectorized numpy bit ops over uint32 block arrays, no per-hash Python in
any bulk path.

Scale shape: a Nodegraph is a CONSTANT-SIZE summary (n_tables ×
tablesize/8 bytes regardless of input rows), so the distributed build is
the ideal partial-aggregate: each ``map_batches`` block folds its rows
into a local bitset and emits one fixed-size row; the driver (or a tree
of tasks) OR-reduces the partials. Nothing row-shaped ever shuffles.
"""

from __future__ import annotations

import gzip
import io
import struct
import sys

import numpy as np

__all__ = [
    "Nodegraph", "GraphFactory", "calc_expected_collisions",
    "primes_descending",
]

# 8-bit popcount lookup (numpy 1.26 has no bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint32)

_MR_WITNESSES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)


def _is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin, exact for n < 2^64 (public witness set,
    Sinclair 2011). Stands in for the reference's ``primal_check``
    (``nodegraph.rs:93``)."""
    if n < 2:
        return False
    for p in _MR_WITNESSES:
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in _MR_WITNESSES:
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def primes_descending(tablesize: int, n_tables: int) -> list[int]:
    """``n_tables`` largest odd primes ≤ max(tablesize-1, 2), descending —
    the reference's table sizing (``nodegraph.rs:85-100``)."""
    i = max(tablesize - 1, 2)
    if i % 2 == 0:
        i -= 1
    out: list[int] = []
    while len(out) != n_tables:
        if _is_prime(i):
            out.append(i)
        if i == 1:
            break
        i -= 2
    return out


def _popcount(blocks: np.ndarray) -> int:
    return int(_POP8[blocks.view(np.uint8)].sum())


class Nodegraph:
    """k-table Bloom filter over 64-bit hash values.

    ``blocks[t]`` is a uint32 array of ``ceil(tablesize/32)`` words;
    hash ``h`` maps to bit ``h % tablesize`` of every table. A hash is
    "present" iff its bit is set in ALL tables (``nodegraph.rs:130-138``).
    """

    def __init__(self, ksize: int, starting_size: int, n_tables: int):
        self._init_tables(primes_descending(int(starting_size),
                                            int(n_tables)), int(ksize))

    def _init_tables(self, tablesizes: list[int], ksize: int):
        self.ksize = ksize
        self.tablesizes = np.array(tablesizes, dtype=np.uint64)
        self.blocks = [np.zeros((int(s) + 31) // 32, dtype=np.uint32)
                       for s in tablesizes]
        self.unique_kmers = 0

    @classmethod
    def from_tablesizes(cls, tablesizes: list[int],
                        ksize: int = 1) -> "Nodegraph":
        ng = cls.__new__(cls)
        ng._init_tables([int(s) for s in tablesizes], int(ksize))
        return ng

    # --- update -----------------------------------------------------------

    def update_many(self, hashes: np.ndarray) -> int:
        """Fold an array of uint64 hashes in; returns the number of NEW
        hashes (serial-``count`` equivalence: a hash is new iff at least
        one table bit flips, first occurrence in batch order wins —
        ``nodegraph.rs:107-128``)."""
        h = np.ascontiguousarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return 0
        is_new = np.zeros(h.size, dtype=bool)
        for t, blocks in enumerate(self.blocks):
            bins = h % self.tablesizes[t]
            word = (bins >> np.uint64(5)).astype(np.int64)
            bit = np.uint32(1) << (bins & np.uint64(31)).astype(np.uint32)
            prev_set = (blocks[word] & bit) != 0
            # first occurrence of each bin in batch order (stable sort)
            order = np.argsort(bins, kind="stable")
            sb = bins[order]
            first_sorted = np.empty(h.size, dtype=bool)
            first_sorted[0] = True
            np.not_equal(sb[1:], sb[:-1], out=first_sorted[1:])
            first = np.zeros(h.size, dtype=bool)
            first[order] = first_sorted
            is_new |= first & ~prev_set
            np.bitwise_or.at(blocks, word, bit)
        n_new = int(is_new.sum())
        self.unique_kmers += n_new
        return n_new

    def count(self, h: int) -> bool:
        """Insert one hash; True iff it was new (``nodegraph.rs:107``)."""
        return self.update_many(np.array([h], dtype=np.uint64)) == 1

    def update(self, other: "Nodegraph") -> None:
        """Bitwise-OR union (``nodegraph.rs:32-49``; like the reference,
        does not adjust ``unique_kmers``)."""
        if not np.array_equal(self.tablesizes, other.tablesizes):
            raise ValueError("tablesizes mismatch in Nodegraph.update")
        for mine, theirs in zip(self.blocks, other.blocks):
            np.bitwise_or(mine, theirs, out=mine)

    # --- query ------------------------------------------------------------

    def get_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: bool per hash, AND over tables."""
        h = np.ascontiguousarray(hashes, dtype=np.uint64)
        out = np.ones(h.size, dtype=bool)
        for t, blocks in enumerate(self.blocks):
            bins = h % self.tablesizes[t]
            word = (bins >> np.uint64(5)).astype(np.int64)
            bit = np.uint32(1) << (bins & np.uint64(31)).astype(np.uint32)
            out &= (blocks[word] & bit) != 0
        return out

    def get(self, h: int) -> int:
        return int(self.get_many(np.array([h], dtype=np.uint64))[0])

    def matches(self, mins: np.ndarray) -> int:
        """How many of the sketch's mins are present
        (``nodegraph.rs:161-163``)."""
        return int(self.get_many(mins).sum())

    # --- whole-filter stats ----------------------------------------------

    def n_occupied(self) -> int:
        """Occupied bins of table 0 (``nodegraph.rs:157-159`` — occupancy
        only tracks the first table)."""
        return _popcount(self.blocks[0])

    @property
    def expected_collisions(self) -> float:
        min_size = int(self.tablesizes.min())
        fp_one = self.n_occupied() / min_size
        return fp_one ** len(self.blocks)

    def ntables(self) -> int:
        return len(self.blocks)

    def similarity(self, other: "Nodegraph") -> float:
        """Bit-level Jaccard across all tables (``nodegraph.rs:299-313``)."""
        inter = sum(_popcount(a & b)
                    for a, b in zip(self.blocks, other.blocks))
        union = sum(_popcount(a | b)
                    for a, b in zip(self.blocks, other.blocks))
        return inter / union if union else 0.0

    def containment(self, other: "Nodegraph") -> float:
        """Bit-level containment of self in other
        (``nodegraph.rs:315-327``)."""
        inter = sum(_popcount(a & b)
                    for a, b in zip(self.blocks, other.blocks))
        size = sum(_popcount(a) for a in self.blocks)
        return inter / size if size else 0.0

    def __eq__(self, other) -> bool:
        return (isinstance(other, Nodegraph)
                and self.ksize == other.ksize
                and np.array_equal(self.tablesizes, other.tablesizes)
                and all(np.array_equal(a, b)
                        for a, b in zip(self.blocks, other.blocks)))

    # --- khmer OXLI v4 binary format --------------------------------------

    def save_to_writer(self, wtr) -> None:
        """khmer nodegraph binary: magic ``OXLI``, version 4, ht_type 2,
        u32 ksize, u8 n_tables, u64 occupied, then per table u64 tablesize
        + ``tablesize//8 + 1`` raw bitset bytes (little-endian u32 blocks;
        ``nodegraph.rs:185-242``)."""
        wtr.write(b"OXLI")
        wtr.write(struct.pack("<BBIB", 4, 2, self.ksize, len(self.blocks)))
        wtr.write(struct.pack("<Q", self.n_occupied()))
        for t, blocks in enumerate(self.blocks):
            tablesize = int(self.tablesizes[t])
            byte_size = tablesize // 8 + 1
            wtr.write(struct.pack("<Q", tablesize))
            if sys.byteorder != "little":   # pragma: no cover
                blocks = blocks.byteswap()
            wtr.write(blocks.tobytes()[:byte_size])

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            self.save_to_writer(f)

    def to_bytes(self, compression: int = 1) -> bytes:
        buf = io.BytesIO()
        self.save_to_writer(buf)
        raw = buf.getvalue()
        if compression:
            return gzip.compress(raw, compresslevel=compression)
        return raw

    @classmethod
    def from_reader(cls, rdr) -> "Nodegraph":
        head = rdr.read(2)
        if head == b"\x1f\x8b":         # gzip-compressed (niffler sniff)
            rest = rdr.read()
            rdr = io.BytesIO(gzip.decompress(head + rest))
            head = rdr.read(2)
        magic = head + rdr.read(2)
        if magic != b"OXLI":
            raise ValueError(f"not a nodegraph file (magic {magic!r})")
        version, ht_type, ksize, n_tables = struct.unpack(
            "<BBIB", rdr.read(7))
        if version != 4 or ht_type != 2:
            raise ValueError(
                f"unsupported nodegraph version/type {version}/{ht_type}")
        (_occupied,) = struct.unpack("<Q", rdr.read(8))
        tablesizes, blocks = [], []
        for _ in range(n_tables):
            (tablesize,) = struct.unpack("<Q", rdr.read(8))
            byte_size = tablesize // 8 + 1
            raw = rdr.read(byte_size)
            if len(raw) != byte_size:
                raise ValueError("truncated nodegraph table")
            nwords = (tablesize + 31) // 32
            padded = raw.ljust(nwords * 4, b"\x00")
            arr = np.frombuffer(padded, dtype="<u4").astype(np.uint32,
                                                            copy=True)
            tablesizes.append(tablesize)
            blocks.append(arr)
        ng = cls.from_tablesizes(tablesizes, ksize)
        ng.blocks = blocks
        return ng

    @classmethod
    def from_buffer(cls, buf: bytes) -> "Nodegraph":
        return cls.from_reader(io.BytesIO(bytes(buf)))

    @classmethod
    def load(cls, path: str) -> "Nodegraph":
        with open(path, "rb") as f:
            return cls.from_reader(f)


class GraphFactory:
    """``(ksize, starting_size, n_tables)`` → fresh Nodegraph
    (``sbt.py:43-65``)."""

    def __init__(self, ksize: int, starting_size: int, n_tables: int):
        self.ksize = int(ksize)
        self.starting_size = int(starting_size)
        self.n_tables = int(n_tables)

    def __call__(self) -> Nodegraph:
        return Nodegraph(self.ksize, self.starting_size, self.n_tables)

    def init_args(self) -> tuple[int, int, int]:
        return (self.ksize, self.starting_size, self.n_tables)


def calc_expected_collisions(graph: Nodegraph, force: bool = False,
                             max_false_pos: float = 0.2) -> float:
    """False-positive-rate guard (``nodegraph.py:145-165`` behavior:
    warn to stderr and exit unless forced)."""
    fp_all = graph.expected_collisions
    if fp_all > max_false_pos:
        print("**", file=sys.stderr)
        print("** ERROR: the graph structure is too small for "
              "this data set; increase its size.", file=sys.stderr)
        print(f"** (estimated false positive rate {fp_all:.3f}; "
              f"max recommended {max_false_pos:.3f})", file=sys.stderr)
        print("**", file=sys.stderr)
        if not force:
            raise SystemExit(1)
    return fp_all
