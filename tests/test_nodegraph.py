"""Nodegraph (Bloom filter) parity: table sizing, serial/bulk count
equivalence, khmer OXLI v4 round-trip, set-math agreement at
collision-free sizes (reference semantics:
/root/reference/src/core/src/sketch/nodegraph.rs)."""
from __future__ import annotations

import struct

import numpy as np
import pytest

from sourmash_ray.functions.nodegraph import (
    GraphFactory, Nodegraph, calc_expected_collisions, primes_descending)


def test_primes_descending_matches_reference_sizing():
    # with_tables: largest odd primes <= tablesize-1, descending
    assert primes_descending(100, 4) == [97, 89, 83, 79]
    assert primes_descending(3, 2) == []   # i reaches 1 and breaks (rs:96-98)


def test_count_get_serial_bulk_equivalence():
    rng = np.random.default_rng(7)
    hashes = rng.integers(0, 2**63, 500, dtype=np.uint64)
    hashes = np.concatenate([hashes, hashes[:100]])  # in-batch duplicates

    serial = Nodegraph(31, 10_000, 4)
    n_new_serial = sum(serial.count(int(h)) for h in hashes)

    bulk = Nodegraph(31, 10_000, 4)
    n_new_bulk = bulk.update_many(hashes)

    assert serial == bulk
    assert n_new_serial == n_new_bulk == bulk.unique_kmers
    assert bulk.n_occupied() == serial.n_occupied()
    probe = rng.integers(0, 2**63, 200, dtype=np.uint64)
    assert np.array_equal(serial.get_many(probe), bulk.get_many(probe))
    # every inserted hash is a member (no false negatives, ever)
    assert bulk.get_many(hashes).all()


def test_oxli_roundtrip(tmp_path):
    ng = Nodegraph(21, 5_000, 3)
    ng.update_many(np.arange(1, 400, dtype=np.uint64) * np.uint64(2**40))
    p = str(tmp_path / "ng.oxli")
    ng.save(p)

    # header is khmer-readable (nodegraph.py:126-133 field layout)
    with open(p, "rb") as f:
        magic = f.read(4)
        version, ht_type, ksize, n_tables = struct.unpack("<BBIB", f.read(7))
        (occupied,) = struct.unpack("<Q", f.read(8))
    assert magic == b"OXLI" and (version, ht_type) == (4, 2)
    assert ksize == 21 and n_tables == 3
    assert occupied == ng.n_occupied()

    back = Nodegraph.load(p)
    assert back == ng
    assert back.tablesizes.tolist() == ng.tablesizes.tolist()

    # gzip buffer round-trip (to_bytes(compression=1) path)
    again = Nodegraph.from_buffer(ng.to_bytes(compression=1))
    assert again == ng
    raw = Nodegraph.from_buffer(ng.to_bytes(compression=0))
    assert raw == ng


def test_matches_similarity_containment_set_math():
    # big tables + few hashes => no collisions => bloom math == set math
    rng = np.random.default_rng(1)
    a = rng.choice(10**6, 300, replace=False).astype(np.uint64)
    b = np.concatenate([a[:120], (rng.choice(10**6, 180, replace=False)
                                  + 10**7).astype(np.uint64)])
    nga, ngb = Nodegraph(31, 2_000_003, 4), Nodegraph(31, 2_000_003, 4)
    nga.update_many(a)
    ngb.update_many(b)

    assert nga.matches(b) == len(np.intersect1d(a, b))
    inter = len(np.intersect1d(a, b))
    union = len(np.union1d(a, b))
    assert nga.similarity(ngb) == pytest.approx(inter / union, abs=1e-3)
    assert nga.containment(ngb) == pytest.approx(inter / len(a), abs=1e-3)

    merged = Nodegraph(31, 2_000_003, 4)
    merged.update_many(a)
    merged.update(ngb)
    both = Nodegraph(31, 2_000_003, 4)
    both.update_many(np.concatenate([a, b]))
    assert merged == both


def test_expected_collisions_guard(capsys):
    ng = Nodegraph(31, 100, 2)
    ng.update_many(np.arange(90, dtype=np.uint64))
    assert ng.expected_collisions > 0.2
    with pytest.raises(SystemExit):
        calc_expected_collisions(ng)
    fp = calc_expected_collisions(ng, force=True)
    assert fp == ng.expected_collisions

    roomy = GraphFactory(31, 100_003, 4)()
    roomy.update_many(np.arange(50, dtype=np.uint64))
    assert calc_expected_collisions(roomy) < 0.2
