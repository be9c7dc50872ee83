"""Distributed BPE merge training vs a serial reference implementation."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sourmash_ray.pipelines.bpe import (apply_merge_batch,
                                        bpe_train_merges,
                                        count_pairs_batch)


def _serial_bpe(word_freqs: dict[bytes, int], n_merges: int):
    """Sennrich-style reference: symbol sequences per word, best pair by
    (count desc, pair asc), greedy left-to-right merge."""
    vocab = {w: [w[i:i + 1] for i in range(len(w))]
             for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((l, r, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _write_corpus(tmp_path, docs):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array(["s"] * len(docs), pa.string()),
        "n_chars": pa.array([len(d) for d in docs], pa.int64()),
    }), f"{tmp_path}/documents.parquet")


def test_bpe_matches_serial_reference(ray_session, tmp_path):
    rng = np.random.RandomState(9)
    words = ["banana", "bandana", "ananas", "cabana", "nab", "anna",
             "aaaa", "abab"]
    docs = [" ".join(rng.choice(words, size=12)) for _ in range(60)]
    _write_corpus(tmp_path, docs)

    wf = {}
    for d in docs:
        for w in d.split():
            wf[w.encode()] = wf.get(w.encode(), 0) + 1
    want = _serial_bpe(wf, 12)

    got = [(r["left"], r["right"], r["pair_count"])
           for r in bpe_train_merges(str(tmp_path),
                                     n_merges=12).to_pylist()]
    assert got == want
    assert len(got) == 12


def test_apply_merge_overlap_run_parity():
    """'aaaa' + merge (a,a) must become ['aa','aa'] (greedy scan)."""
    t = pa.table({
        "word": pa.array([b"aaaa", b"aab"], pa.binary()),
        "freq": pa.array([1, 1], pa.int64()),
        "syms": pa.array([[b"a", b"a", b"a", b"a"],
                          [b"a", b"a", b"b"]], pa.list_(pa.binary())),
    })
    out = apply_merge_batch(t, b"a", b"a")
    assert out["syms"].to_pylist() == [[b"aa", b"aa"], [b"aa", b"b"]]


def test_count_pairs_weighted():
    t = pa.table({
        "word": pa.array([b"aba", b"ab"], pa.binary()),
        "freq": pa.array([3, 2], pa.int64()),
        "syms": pa.array([[b"a", b"b", b"a"], [b"a", b"b"]],
                         pa.list_(pa.binary())),
    })
    rows = {(r["left"], r["right"]): r["cnt"]
            for r in count_pairs_batch(t).to_pylist()}
    assert rows == {(b"a", b"b"): 5, (b"b", b"a"): 3}


def test_bpe_encode_counts_match_serial(ray_session, tmp_path):
    from sourmash_ray.pipelines.bpe import bpe_token_counts_trained

    rng = np.random.RandomState(4)
    words = ["banana", "bandana", "ananas", "nab", "abab"]
    docs = [" ".join(rng.choice(words, size=9)) for _ in range(40)]
    _write_corpus(tmp_path, docs)

    wf = {}
    for d in docs:
        for w in d.split():
            wf[w.encode()] = wf.get(w.encode(), 0) + 1
    merges = _serial_bpe(wf, 8)

    def _encode_len(w: bytes) -> int:
        syms = [w[i:i + 1] for i in range(len(w))]
        for l, r, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    want = {i: sum(_encode_len(w.encode()) for w in d.split())
            for i, d in enumerate(docs)}
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_counts_trained(str(tmp_path),
                                             n_merges=8).take_all()}
    assert got == want
