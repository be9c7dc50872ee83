"""Brute-force oracles — the ``compare_serial`` pattern
(``/root/reference/src/sourmash/compare.py:14-64``) for the new engine.

Pure Python/numpy, no Ray: conversation sketches built turn-by-turn with the
scalar normalization path, then O(n²) pairwise Jaccard. Tests assert the
distributed pipeline reproduces these sketches bit-for-bit and recovers
≥ 0.99 of the oracle's dup pairs (BASELINE.md targets).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from .setops import intersection_size_num, intersection_size_scaled
from .sketch import SketchParams, build_sketch, md5_of_mins, normalize_text, shingle_hashes


def sketch_conversation(turn_texts: list[str], params: SketchParams):
    """One conversation's sketch from its turns — per-turn shingling with
    per-turn retention then union, mirroring the pipeline stages exactly
    (and sourmash's per-record ``add_sequence``,
    ``/root/reference/src/sourmash/command_sketch.py:827-833``).

    Returns ``(mins, abunds, n_shingles)``; mins sorted ascending.
    """
    acc: dict[int, int] = defaultdict(int)
    n_shingles = 0
    for text in turn_texts:
        data = normalize_text(text, params.normalization)
        hashes = shingle_hashes(data, params.ksize, params.seed)
        n_shingles += int(hashes.size)
        mins, abunds, _ = build_sketch(
            hashes,
            SketchParams(ksize=params.ksize, scaled=params.scaled,
                         num=params.num, seed=params.seed,
                         track_abundance=True,
                         normalization=params.normalization),
        )
        for h, a in zip(mins.tolist(), abunds.tolist()):
            acc[h] += a
    mins = np.array(sorted(acc), dtype=np.uint64)
    abunds = np.array([acc[h] for h in mins.tolist()], dtype=np.uint64)
    if params.num:
        mins, abunds = mins[: params.num], abunds[: params.num]
    return mins, abunds, n_shingles


def sketch_table(transcripts, params: SketchParams) -> dict[str, dict]:
    """conv_id → sketch dict for a whole transcripts table (pyarrow)."""
    df = transcripts.select(["conv_id", "turn_idx", "text"]).to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"])
    out: dict[str, dict] = {}
    for conv_id, g in df.groupby("conv_id", sort=True):
        mins, abunds, n_sh = sketch_conversation(list(g["text"]), params)
        out[conv_id] = dict(mins=mins, abunds=abunds, n_shingles=n_sh,
                            n_turns=len(g),
                            md5=md5_of_mins(mins, params.ksize))
    return out


def jaccard_mins(a: np.ndarray, b: np.ndarray, params: SketchParams) -> float:
    if params.num:
        common, denom = intersection_size_num(a, b, params.num)
    else:
        common, denom = intersection_size_scaled(a, b)
    return common / max(1, denom)


def oracle_dup_pairs(sketches: dict[str, dict], params: SketchParams,
                     threshold: float) -> set[tuple[str, str]]:
    """All (a, b), a<b with sketch Jaccard ≥ threshold — O(n²)."""
    ids = sorted(sketches)
    pairs = set()
    for i, a in enumerate(ids):
        ma = sketches[a]["mins"]
        for b in ids[i + 1:]:
            if jaccard_mins(ma, sketches[b]["mins"], params) >= threshold:
                pairs.add((a, b))
    return pairs


def oracle_clusters(pairs: set[tuple[str, str]], all_ids: list[str]) -> dict[str, str]:
    """Union-find over oracle pairs → conv_id → min-id cluster label."""
    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    # path-compress fully, then relabel each component by its min member
    comp = defaultdict(list)
    for i in all_ids:
        comp[find(i)].append(i)
    out = {}
    for members in comp.values():
        lbl = min(members)
        for m in members:
            out[m] = lbl
    return out


def oracle_angular_pairs(sketches: dict[str, dict], params: SketchParams,
                         threshold: float) -> set[tuple[str, str]]:
    """All (a, b), a<b with ABUNDANCE angular similarity ≥ threshold —
    O(n²) brute force over :func:`sketch_table` output (the abundance
    twin of :func:`oracle_dup_pairs`; ``minhash.rs:635-680``
    semantics via ``setops.angular_similarity``)."""
    from .setops import angular_similarity
    from .sketch import Sketch

    ids = sorted(sketches)
    sk = {i: Sketch(mins=sketches[i]["mins"],
                    abunds=sketches[i]["abunds"], params=params)
          for i in ids}
    pairs = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if angular_similarity(sk[a], sk[b]) >= threshold:
                pairs.add((a, b))
    return pairs
