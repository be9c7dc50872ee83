"""Turn- and conversation-level operators over the transcripts table.

The flagship pipeline dedups whole conversations; a chat-log curation
run also needs TURN-grain ops (boilerplate greetings, repeated tool
outputs, per-role accounting). These ride the same exchange kernels as
the docs family. The driver's DuckDB oracle views don't include the
transcripts table (it is synthesized per sf under /tmp), so these ship
as rows-only driver queries with exact DuckDB twins in the repo's own
tests (``tests/test_transcriptops.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, EngineConfig


def _read_turns(sf_dir: str, columns):
    import ray.data

    from ..sources.transcripts import transcripts_path

    return ray.data.read_parquet(transcripts_path(sf_dir),
                                 columns=list(columns))


TURN_DEDUP_SCHEMA = pa.schema([
    ("text_md5", pa.string()), ("rep_conv_id", pa.string()),
    ("rep_turn_idx", pa.int64()), ("n_dups", pa.int64()),
])


def turn_dedup_transcripts(sf_dir: str,
                           cfg: EngineConfig = DEFAULT_CONFIG):
    """Exact dedup at TURN grain: one row per distinct normalized turn
    text with its first occurrence (min (conv_id, turn_idx)) and the
    duplicate count — the boilerplate-turn detector (greetings,
    canned tool output) a chat-corpus curation run applies before
    conversation-level near-dup. Same shape as ``exact_dedup_docs``:
    block-local pre-pick, md5-string exchange (co-locates AND decides),
    per-partition resolve."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..pipelines.docops import (_md5_column, _s_fixed_to_string_array)
    from ..stages.exchange import exchange_map_groups
    from ..stages.sketch import normalize_column

    group_parts = cfg.exec.group_parts

    def _partial(batch: pa.Table) -> pa.Table:
        norm = normalize_column(batch["text"], "ws")
        md5 = _md5_column(norm)
        if isinstance(md5, pa.ChunkedArray):
            md5 = md5.combine_chunks()
        mb = _to_bytes_array(md5)
        cid = _to_bytes_array(batch["conv_id"].combine_chunks())
        tix = np.asarray(batch["turn_idx"], np.int64)
        order = np.lexsort((tix, cid, mb))
        mb_s, cid_s, tix_s = mb[order], cid[order], tix[order]
        first = np.r_[True, mb_s[1:] != mb_s[:-1]] if len(mb_s) else \
            np.empty(0, bool)
        starts = np.flatnonzero(first)
        cnt = np.diff(np.r_[starts, len(mb_s)])
        u = mb_s[first]
        if not len(u):
            return pa.schema(
                list(TURN_DEDUP_SCHEMA) +
                [pa.field("md5_part", pa.int64())]).empty_table()
        take = pa.array(order[first], pa.int64())
        return pa.table({
            "text_md5": _s_fixed_to_string_array(u),
            "rep_conv_id": batch["conv_id"].combine_chunks().take(take),
            "rep_turn_idx": pa.array(tix_s[first], pa.int64()),
            "n_dups": pa.array(cnt.astype(np.int64), pa.int64()),
            "md5_part": pa.array(hash_strings64(u) % group_parts,
                                 pa.int64()),
        })

    def _resolve(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return TURN_DEDUP_SCHEMA.empty_table()
        mb = _to_bytes_array(part["text_md5"])
        cid = _to_bytes_array(part["rep_conv_id"].combine_chunks())
        tix = np.asarray(part["rep_turn_idx"], np.int64)
        cnt = np.asarray(part["n_dups"], np.int64)
        order = np.lexsort((tix, cid, mb))
        mb_s = mb[order]
        first = np.r_[True, mb_s[1:] != mb_s[:-1]]
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(cnt[order], starts)
        take = pa.array(order[first], pa.int64())
        return pa.table({
            "text_md5": part["text_md5"].combine_chunks().take(take),
            "rep_conv_id": part["rep_conv_id"].combine_chunks().take(take),
            "rep_turn_idx": pa.array(tix[order][first], pa.int64()),
            "n_dups": pa.array(sums.astype(np.int64), pa.int64()),
        })

    parts = _read_turns(sf_dir, ("conv_id", "turn_idx", "text")
                        ).map_batches(_partial, batch_format="pyarrow")
    return exchange_map_groups(parts, "md5_part",
                               2 * resolve_num_partitions(cfg),
                               _resolve, TURN_DEDUP_SCHEMA)


ROLE_STATS_SCHEMA = pa.schema([
    ("role", pa.string()), ("tool", pa.string()),
    ("n_turns", pa.int64()), ("sum_chars", pa.int64()),
])


def role_stats_transcripts(sf_dir: str):
    """Per (role, tool) turn counts + total chars — the corpus
    accounting a transcript-mix report needs (how much of the corpus is
    assistant text vs tool output). Map-only partials + one tiny cell
    exchange (``grouped_sums``); character counts use ``utf8_length``
    (chars, not bytes — the hypothesis-caught cross-engine rule)."""
    from ..stages.agg import grouped_sums

    def _prep(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        return pa.table({
            "role": batch["role"],
            "tool": pc.fill_null(batch["tool"].combine_chunks(), ""),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        })

    ds = _read_turns(sf_dir, ("role", "tool", "text")).map_batches(
        _prep, batch_format="pyarrow")
    out = grouped_sums(ds, ["role", "tool"], ["n_chars"],
                       count_as="n_turns")
    return out.map_batches(
        lambda t: pa.table({
            "role": t["role"], "tool": t["tool"],
            "n_turns": t["n_turns"],
            "sum_chars": t["sum_n_chars"]}),
        batch_format="pyarrow")


CONV_STATS_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("n_turns", pa.int64()),
    ("sum_chars", pa.int64()), ("n_roles", pa.int64()),
    ("duration_us", pa.int64()),
])


def conversation_stats_transcripts(sf_dir: str):
    """Per-conversation profile: turn count, total chars, distinct
    roles, wall duration — the per-record metadata a transcript
    curation gate filters on. ONE conv-keyed exchange; each partition
    profiles all its conversations in one lexsort + run-length pass
    (counts, char sums, distinct-role runs, min/max ts)."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "role": batch["role"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _profile(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return CONV_STATS_SCHEMA.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        role = _to_bytes_array(part["role"].combine_chunks())
        ts = np.asarray(part["ts_us"], np.int64)
        nch = np.asarray(part["n_chars"], np.int64)
        order = np.lexsort((role, cid))
        cid_s, role_s = cid[order], role[order]
        new_conv = np.r_[True, cid_s[1:] != cid_s[:-1]]
        starts = np.flatnonzero(new_conv)
        lens = np.diff(np.r_[starts, len(cid_s)])
        conv_id_of = np.cumsum(new_conv) - 1
        new_role = new_conv | np.r_[True, role_s[1:] != role_s[:-1]]
        n_roles = np.bincount(conv_id_of[new_role],
                              minlength=len(starts))
        sum_chars = np.bincount(conv_id_of, weights=nch[order],
                                minlength=len(starts)).astype(np.int64)
        ts_o = ts[order]
        tmin = np.minimum.reduceat(ts_o, starts)
        tmax = np.maximum.reduceat(ts_o, starts)
        take = pa.array(order[starts], pa.int64())
        return pa.table({
            "conv_id": part["conv_id"].combine_chunks().take(take),
            "n_turns": pa.array(lens.astype(np.int64), pa.int64()),
            "sum_chars": pa.array(sum_chars, pa.int64()),
            "n_roles": pa.array(n_roles.astype(np.int64), pa.int64()),
            "duration_us": pa.array(tmax - tmin, pa.int64()),
        })

    from ..config import DEFAULT_CONFIG as _cfg

    keyed = _read_turns(sf_dir, ("conv_id", "role", "ts", "text")
                        ).map_batches(_prep, batch_format="pyarrow")
    return exchange_map_groups(keyed, "conv_part",
                               resolve_num_partitions(_cfg),
                               _profile, CONV_STATS_SCHEMA)
