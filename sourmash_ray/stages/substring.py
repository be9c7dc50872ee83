"""Exact long-match stage: verified pairs → longest shared byte span.

SURVEY.md §7.2 step 6: the pass that upgrades "sketch-similar" to
"provably shares an exact span of ≥ min_len bytes" — the suffix/rolling
hash substring analogue of the reference's ``sig kmers`` back-mapping.

Conversation documents are assembled with an explicit
``(conv_id, turn_idx)`` sort (the input_hint ordering invariant: any
stable assembly MUST impose this order, never read order), joined with
'\\n' separators. Pair texts are broadcast (only pair-involved
conversations are gathered — bounded by the dup count, not the corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..config import EngineConfig, DEFAULT_CONFIG
from ..functions.sketch import normalize_text
from ..functions.substring import longest_common_substring


def conversation_texts(transcripts_ds, conv_ids: set[str],
                       normalization: str = "ws") -> dict[str, bytes]:
    """Assemble the normalized full text of the given conversations, turns
    sorted by turn_idx (explicit sort — input_hint invariant)."""
    import pyarrow.compute as pc

    wanted = pa.array(sorted(conv_ids), pa.string())

    def _keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["conv_id"], value_set=wanted))

    rows = (transcripts_ds.select_columns(["conv_id", "turn_idx", "text"])
            .map_batches(_keep, batch_format="pyarrow").take_all())
    by_conv: dict[str, list[tuple[int, str]]] = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append((r["turn_idx"], r["text"]))
    out = {}
    for cid, turns in by_conv.items():
        turns.sort()
        out[cid] = b"\n".join(normalize_text(t, normalization)
                              for _, t in turns)
    return out


def exact_substring_pass(pairs_ds, transcripts_ds,
                         cfg: EngineConfig = DEFAULT_CONFIG,
                         min_len: int = 64):
    """(a, b) pairs → (a, b, lcs_len, lcs_a_start, lcs_b_start) for pairs
    whose longest exact common substring is ≥ ``min_len`` bytes."""
    pair_rows = pairs_ds.select_columns(["a", "b"]).take_all()
    if not pair_rows:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "lcs_len": pa.array([], pa.int64()),
                         "lcs_a_start": pa.array([], pa.int64()),
                         "lcs_b_start": pa.array([], pa.int64())})
    import ray.data  # noqa: F401 — before ray.put so `ray` stays global

    ids = {r["a"] for r in pair_rows} | {r["b"] for r in pair_rows}
    texts = conversation_texts(transcripts_ds, ids,
                               cfg.sketch.normalization)
    texts_ref = ray.put(texts)

    def _lcs(batch: pa.Table) -> pa.Table:
        tx = ray.get(texts_ref)
        a_ids = batch["a"].to_pylist()
        b_ids = batch["b"].to_pylist()
        lens = np.zeros(len(a_ids), np.int64)
        sa = np.zeros(len(a_ids), np.int64)
        sb = np.zeros(len(a_ids), np.int64)
        for i, (x, y) in enumerate(zip(a_ids, b_ids)):
            L, pa_, pb_ = longest_common_substring(tx.get(x, b""),
                                                   tx.get(y, b""))
            lens[i], sa[i], sb[i] = L, pa_, pb_
        t = pa.table({
            "a": batch["a"], "b": batch["b"],
            "lcs_len": pa.array(lens, pa.int64()),
            "lcs_a_start": pa.array(sa, pa.int64()),
            "lcs_b_start": pa.array(sb, pa.int64()),
        })
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["lcs_len"], pa.scalar(min_len)))

    # small batches: each pair's LCS costs ~tens of ms, so spread pairs
    # wide across the cluster instead of serializing them in one task
    return ray.data.from_items(
        [{"a": r["a"], "b": r["b"]} for r in pair_rows]
    ).repartition(max(8, len(pair_rows) // 8)).map_batches(
        _lcs, batch_format="pyarrow", batch_size=8)
