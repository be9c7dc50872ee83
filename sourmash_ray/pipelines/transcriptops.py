"""Turn- and conversation-level operators over the transcripts table.

The flagship pipeline dedups whole conversations; a chat-log curation
run also needs TURN-grain ops (boilerplate greetings, repeated tool
outputs, per-role accounting). These ride the same exchange kernels as
the docs family. The transcripts corpus is synthesized deterministically into an
sf+seed-keyed Parquet cache under /tmp, so oracle SQL can read it
directly with ``read_parquet`` — since round 5 these ops are
SQL-oracle-exact in ``__ray_entry__.oracle_sql()`` (plus the exact
DuckDB twins in ``tests/test_transcriptops.py``).
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
        # reduceat keeps the sum in int64 (bincount weights go through
        # float64, exact only below 2^53)
        sum_chars = np.add.reduceat(nch[order], starts).astype(np.int64)
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


CURATE_CONV_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("n_turns", pa.int64()),
    ("sum_chars", pa.int64()), ("cluster_id", pa.string()),
])


def curate_transcripts_job(sf_dir: str,
                           cfg: EngineConfig = DEFAULT_CONFIG,
                           turns_band=(3, 40),
                           min_chars: int = 200):
    """The transcripts counterpart of ``curate_job_docs`` — what a
    chat-corpus prep run executes end-to-end: per-conversation profile
    gate (turn count in band, total chars above floor) ∘ near-dup
    clustering, keeping ONE representative per surviving cluster (the
    lexicographically-smallest gated conv_id). Returns the kept
    conversations with their profile and cluster.

    Shape: the profile rides one conv exchange
    (:func:`conversation_stats_transcripts`), the clusters come from the
    flagship pipeline (sketch exchange + banded LSH + verify +
    union-find), and the gate∘rep-pick joins the two SMALL per-conv
    tables (profile rows and cluster labels — corpus-sized ÷ turns/conv)
    on a conv-hash exchange; the turn text is read by each side exactly
    once. Composition-tested against the standalone components."""
    import ray.data

    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..pipelines.dedup import dedup_pipeline
    from ..stages.exchange import exchange_map_groups

    lo, hi = turns_band
    stats = conversation_stats_transcripts(sf_dir)
    gated = stats.filter(
        expr=f"n_turns >= {lo} and n_turns <= {hi} "
             f"and sum_chars >= {min_chars}")
    clusters = dedup_pipeline(sf_dir, cfg)["clusters"]

    def _tag_stats(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "n_turns": batch["n_turns"],
            "sum_chars": batch["sum_chars"],
            "cluster_id": pa.nulls(batch.num_rows, pa.string()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _tag_clusters(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "n_turns": pa.nulls(batch.num_rows, pa.int64()),
            "sum_chars": pa.nulls(batch.num_rows, pa.int64()),
            "cluster_id": batch["cluster_id"],
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    unioned = gated.map_batches(_tag_stats, batch_format="pyarrow").union(
        clusters.map_batches(_tag_clusters, batch_format="pyarrow"))

    def _pick(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return CURATE_CONV_SCHEMA.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        has_stats = np.asarray(pc.is_valid(part["n_turns"]))
        order = np.lexsort((~has_stats, cid))  # stats row first per conv
        cid_s = cid[order]
        new = np.r_[True, cid_s[1:] != cid_s[:-1]]
        conv_of = np.cumsum(new) - 1
        # a conv survives the gate iff its stats row is present; its
        # cluster row is always present (clusters covers every conv)
        stats_first = new & has_stats[order]
        n_rows = int(conv_of[-1]) + 1
        gate_ok = np.zeros(n_rows, bool)
        gate_ok[conv_of[stats_first]] = True
        clu = part["cluster_id"].combine_chunks().take(
            pa.array(order, pa.int64()))
        clu_b = _to_bytes_array(pc.fill_null(clu, ""))
        has_clu = np.asarray(pc.is_valid(clu))
        # per conv: its cluster label (from the cluster row)
        label = np.zeros(n_rows, dtype=clu_b.dtype)
        label[conv_of[has_clu]] = clu_b[has_clu]
        nt = np.asarray(pc.fill_null(part["n_turns"], 0), np.int64)[order]
        sc = np.asarray(pc.fill_null(part["sum_chars"], 0),
                        np.int64)[order]
        n_turns = np.zeros(n_rows, np.int64)
        sum_chars = np.zeros(n_rows, np.int64)
        n_turns[conv_of[stats_first]] = nt[stats_first]
        sum_chars[conv_of[stats_first]] = sc[stats_first]
        firsts = np.flatnonzero(new)
        keep = gate_ok
        take = pa.array(order[firsts[keep]], pa.int64())
        return pa.table({
            "conv_id": part["conv_id"].combine_chunks().take(take),
            "n_turns": pa.array(n_turns[keep], pa.int64()),
            "sum_chars": pa.array(sum_chars[keep], pa.int64()),
            "cluster_id": pa.array(
                [x.decode() for x in label[keep].tolist()], pa.string()),
        })

    merged = exchange_map_groups(unioned, "conv_part",
                                 resolve_num_partitions(cfg),
                                 _pick, CURATE_CONV_SCHEMA)

    # representative per surviving cluster: min gated conv_id. Cluster
    # labels are conv-count-bounded strings; one more tiny exchange.
    def _tag_cluster_key(batch: pa.Table) -> pa.Table:
        clu = batch["cluster_id"].combine_chunks()
        return batch.append_column(
            "clu_part", pa.array(hash_strings64(clu) % 1024, pa.int64()))

    def _rep(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return CURATE_CONV_SCHEMA.empty_table()
        clu = _to_bytes_array(part["cluster_id"].combine_chunks())
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        order = np.lexsort((cid, clu))
        clu_s = clu[order]
        first = np.r_[True, clu_s[1:] != clu_s[:-1]]
        take = pa.array(order[first], pa.int64())
        return part.select(
            ["conv_id", "n_turns", "sum_chars", "cluster_id"]).take(take)

    keyed = merged.map_batches(_tag_cluster_key, batch_format="pyarrow")
    return exchange_map_groups(keyed, "clu_part",
                               resolve_num_partitions(cfg),
                               _rep, CURATE_CONV_SCHEMA)


TOOL_USAGE_SCHEMA = pa.schema([
    ("tool", pa.string()), ("n_turns", pa.int64()),
    ("n_convs", pa.int64()), ("sum_chars", pa.int64()),
])


def tool_usage_transcripts(sf_dir: str):
    """Per-tool usage profile: turn count, DISTINCT conversations using
    the tool, total output chars (null tool → '' — the plain-text
    turns). The distinct-conversation count rides the conv-keyed
    exchange: conversations are co-located, so distinct (tool, conv)
    pairs are countable per partition and only per-partition per-tool
    counters reach the final combine."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "tool": pc.fill_null(batch["tool"], ""),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    part_schema = pa.schema([("tool", pa.string()),
                             ("n_turns", pa.int64()),
                             ("n_convs", pa.int64()),
                             ("sum_chars", pa.int64())])

    def _profile(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        tool = _to_bytes_array(part["tool"].combine_chunks())
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        nch = np.asarray(part["n_chars"], np.int64)
        order = np.lexsort((cid, tool))
        tool_s, cid_s = tool[order], cid[order]
        new_tool = np.r_[True, tool_s[1:] != tool_s[:-1]]
        new_pair = new_tool | np.r_[True, cid_s[1:] != cid_s[:-1]]
        starts = np.flatnonzero(new_tool)
        tool_id = np.cumsum(new_tool) - 1
        n_turns = np.diff(np.r_[starts, len(tool_s)])
        n_convs = np.bincount(tool_id[new_pair],
                              minlength=len(starts)).astype(np.int64)
        sum_chars = np.add.reduceat(nch[order], starts).astype(np.int64)
        take = pa.array(order[starts], pa.int64())
        return pa.table({
            "tool": part["tool"].combine_chunks().take(take),
            "n_turns": pa.array(n_turns.astype(np.int64), pa.int64()),
            "n_convs": pa.array(n_convs, pa.int64()),
            "sum_chars": pa.array(sum_chars, pa.int64()),
        })

    from ..config import DEFAULT_CONFIG as _cfg

    keyed = _read_turns(sf_dir, ("conv_id", "tool", "text")).map_batches(
        _prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(_cfg),
                                _profile, part_schema)
    out = grouped_sums(parts, ["tool"],
                       ["n_turns", "n_convs", "sum_chars"])
    return out.map_batches(
        lambda t: pa.table({"tool": t["tool"],
                            "n_turns": t["sum_n_turns"],
                            "n_convs": t["sum_n_convs"],
                            "sum_chars": t["sum_sum_chars"]}),
        batch_format="pyarrow").map_batches(
        lambda t: t.cast(TOOL_USAGE_SCHEMA), batch_format="pyarrow")


BOUNDARY_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("first_role", pa.string()),
    ("last_role", pa.string()), ("n_turns", pa.int64()),
])


def conv_boundary_roles_transcripts(sf_dir: str):
    """Per-conversation boundary roles: who opens (min turn_idx) and who
    closes (max turn_idx) each conversation, plus turn count — the
    opening/closing-pattern profile a dialogue-curation gate inspects
    (e.g. drop conversations not closed by the assistant). One conv
    exchange; boundaries fall out of one lexsort per partition."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _bounds(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return BOUNDARY_SCHEMA.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        order = np.lexsort((tix, cid))
        cid_s = cid[order]
        new = np.r_[True, cid_s[1:] != cid_s[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(cid_s)] - 1
        lens = np.diff(np.r_[starts, len(cid_s)])
        role = part["role"].combine_chunks()
        take_f = pa.array(order[starts], pa.int64())
        take_l = pa.array(order[ends], pa.int64())
        return pa.table({
            "conv_id": part["conv_id"].combine_chunks().take(take_f),
            "first_role": role.take(take_f),
            "last_role": role.take(take_l),
            "n_turns": pa.array(lens.astype(np.int64), pa.int64()),
        })

    from ..config import DEFAULT_CONFIG as _cfg

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "role")
                        ).map_batches(_prep, batch_format="pyarrow")
    return exchange_map_groups(keyed, "conv_part",
                               resolve_num_partitions(_cfg),
                               _bounds, BOUNDARY_SCHEMA)


TRANSITION_SCHEMA = pa.schema([
    ("from_role", pa.string()), ("to_role", pa.string()),
    ("n", pa.int64()),
])


def role_transition_transcripts(sf_dir: str):
    """Corpus-wide role-transition counts: (role of turn i → role of
    turn i+1) within each conversation under turn_idx order — the
    dialogue-structure profile (who answers whom) a conversation-format
    validator checks. One conv exchange; transitions fall out of one
    lexsort per partition (adjacent rows of the same conversation)."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    part_schema = pa.schema([("from_role", pa.string()),
                             ("to_role", pa.string()),
                             ("n", pa.int64())])

    def _trans(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        order = np.lexsort((tix, cid))
        cid_s = cid[order]
        same = cid_s[1:] == cid_s[:-1]      # adjacent rows, same conv
        role = part["role"].combine_chunks()
        src = pa.array(order[:-1][same], pa.int64())
        dst = pa.array(order[1:][same], pa.int64())
        fr = _to_bytes_array(role.take(src))
        to = _to_bytes_array(role.take(dst))
        o2 = np.lexsort((to, fr))
        fr_s, to_s = fr[o2], to[o2]
        new = np.r_[True, (fr_s[1:] != fr_s[:-1])
                    | (to_s[1:] != to_s[:-1])] if len(fr_s) else \
            np.empty(0, bool)
        starts = np.flatnonzero(new)
        cnt = np.diff(np.r_[starts, len(fr_s)])
        take = pa.array(np.asarray(o2[starts]), pa.int64())
        return pa.table({
            "from_role": role.take(src).take(take),
            "to_role": role.take(dst).take(take),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    from ..config import DEFAULT_CONFIG as _cfg

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "role")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(_cfg),
                                _trans, part_schema)
    out = grouped_sums(parts, ["from_role", "to_role"], ["n"])
    return out.map_batches(
        lambda t: pa.table({"from_role": t["from_role"],
                            "to_role": t["to_role"],
                            "n": t["sum_n"]}),
        batch_format="pyarrow")


def conv_duration_quantiles_transcripts(sf_dir: str,
                                        qs=(0.25, 0.5, 0.75, 0.9)):
    """Exact discrete quantiles of conversation wall duration (µs) —
    the derived-table quantile composition: the conv-exchange profile
    feeds the distributed value-histogram quantile machinery."""
    from ..stages.agg import quantiles_disc

    stats = conversation_stats_transcripts(sf_dir)
    return quantiles_disc(stats.select_columns(["duration_us"]),
                          "duration_us", list(qs))


PACK_T_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("shard", pa.int64()),
    ("start_char", pa.int64()), ("start_seq", pa.int64()),
    ("start_offset", pa.int64()), ("end_seq", pa.int64())])


def pack_transcripts_offsets(sf_dir: str, n_shards: int = 8,
                             max_len: int = 8192):
    """Conversation-grain sequence packing — the transcripts twin of
    ``pack_docs_offsets``: concatenate each shard's conversation stream
    (md5(conv_id) shard assignment, (md5, conv_id) order within) and
    cut it into fixed ``max_len``-char training sequences; conversations
    split across sequence boundaries as in standard pretraining packs.
    Per conversation: global char offset in its shard stream, the
    sequence it starts in, the in-sequence offset, and the sequence it
    ends in. Offsets are a pure function of identity + length, so
    reruns and different cluster sizes are byte-identical and a loader
    resumes mid-epoch without scanning. One conv exchange (char totals)
    + one shard exchange (prefix sums over 24-byte rows)."""
    from ..functions.segscore import _to_bytes_array
    from ..stages.exchange import exchange_map_groups
    from .docops import _hex8_to_int, _md5_column

    stats = conversation_stats_transcripts(sf_dir)
    n_shards_u = np.uint64(n_shards)

    def _key(batch: pa.Table) -> pa.Table:
        ids = batch["conv_id"].combine_chunks()
        h = _md5_column(ids)
        shard = (_hex8_to_int(h) % n_shards_u).astype(np.int64)
        return pa.table({
            "conv_id": ids,
            "n_chars": pc.cast(batch["sum_chars"], pa.int64()),
            "shard": pa.array(shard, pa.int64()),
            "h": h,
        })

    def _pack(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return PACK_T_SCHEMA.empty_table()
        ids = part["conv_id"].combine_chunks()
        idb = _to_bytes_array(ids)
        nch = np.asarray(part["n_chars"], np.int64)
        shard = np.asarray(part["shard"], np.int64)
        h = _to_bytes_array(part["h"].combine_chunks())
        order = np.lexsort((idb, h, shard))
        s_s, n_s = shard[order], nch[order]
        cs = np.cumsum(n_s)
        starts = np.flatnonzero(np.r_[True, s_s[1:] != s_s[:-1]])
        lens = np.diff(np.r_[starts, len(s_s)])
        base = np.repeat(cs[starts] - n_s[starts], lens)
        start = cs - n_s - base
        end = start + np.maximum(n_s, 1) - 1
        return pa.table({
            "conv_id": ids.take(pa.array(order, pa.int64())),
            "shard": pa.array(s_s, pa.int64()),
            "start_char": pa.array(start, pa.int64()),
            "start_seq": pa.array(start // max_len, pa.int64()),
            "start_offset": pa.array(start % max_len, pa.int64()),
            "end_seq": pa.array(end // max_len, pa.int64()),
        })

    keyed = stats.map_batches(_key, batch_format="pyarrow")
    return exchange_map_groups(keyed, "shard", n_shards, _pack,
                               PACK_T_SCHEMA)


_HEX15_POW = (np.uint64(16) ** np.arange(14, -1, -1, dtype=np.uint64))


def transcripts_global_ranked(sf_dir: str):
    """Curriculum ordering of the transcripts corpus: every conversation
    with its exact 1-based global rank by (total chars, md5-tiebreak) —
    ``row_number() OVER (ORDER BY sum_chars, hex60(md5(conv_id)))`` on
    the range-partition sample sort, the transcripts twin of
    ``docs_global_ranked``. The tiebreak is the first 15 md5 hex digits
    as an integer (60 bits — string conv_ids can't ride the int64 sort
    key directly, and the md5 fold is reproducible in SQL), so rank is
    a pure function of identity + length: a curriculum loader shards it
    without coordination."""
    from ..functions.segscore import _to_bytes_array
    from ..stages.sort import range_partition_sort
    from .docops import _md5_column

    def _tie(batch: pa.Table) -> pa.Table:
        ids = batch["conv_id"].combine_chunks()
        h = _md5_column(ids)
        s = _to_bytes_array(h)
        m = s.view(np.uint8).reshape(len(s), -1)[:, :15] \
            .astype(np.uint64)
        digits = m - np.uint64(48) - np.uint64(39) * (m >= 97)
        return pa.table({
            "conv_id": ids,
            "sum_chars": pc.cast(batch["sum_chars"], pa.int64()),
            "tie": pa.array((digits @ _HEX15_POW).astype(np.int64),
                            pa.int64()),
        })

    stats = conversation_stats_transcripts(sf_dir).select_columns(
        ["conv_id", "sum_chars"]).map_batches(
        _tie, batch_format="pyarrow")
    ranked = range_partition_sort(
        stats, "sum_chars", "tie",
        schema=pa.schema([("conv_id", pa.string()),
                          ("sum_chars", pa.int64()),
                          ("tie", pa.int64())]))
    return ranked.map_batches(
        lambda t: t.select(["conv_id", "sum_chars", "global_rank"]),
        batch_format="pyarrow")


def hash_split_transcripts(sf_dir: str):
    """Deterministic train/valid/test split at conversation grain — the
    transcripts twin of ``hash_split_docs``, keyed on md5(conv_id)
    (first 8 hex % 100: <80 train, <90 valid, else test). Id-hash
    assignment is a pure function of identity: stable across reruns,
    shards and cluster sizes, and a near-dup leaked across splits is
    auditable by recomputing the hash. Output: per-split conversation
    count, turn count, and char sum (3 rows from one grouped_sums
    exchange over per-conv stats)."""
    from ..stages.agg import grouped_sums
    from .docops import _hex8_to_int, _md5_column

    splits = np.array(["train", "valid", "test"])

    def _assign(batch: pa.Table) -> pa.Table:
        ids = batch["conv_id"].combine_chunks()
        b = _hex8_to_int(_md5_column(ids)) % np.uint64(100)
        si = np.where(b < 80, 0, np.where(b < 90, 1, 2))
        return pa.table({
            "split": pa.array(splits[si], pa.string()),
            "n_convs": pa.array(np.ones(len(ids), np.int64), pa.int64()),
            "n_turns": pc.cast(batch["n_turns"], pa.int64()),
            "sum_chars": pc.cast(batch["sum_chars"], pa.int64()),
        })

    stats = conversation_stats_transcripts(sf_dir).select_columns(
        ["conv_id", "n_turns", "sum_chars"]).map_batches(
        _assign, batch_format="pyarrow")
    t = grouped_sums(stats, ["split"],
                     ["n_convs", "n_turns", "sum_chars"])
    return t.map_batches(
        lambda b: pa.table({"split": b["split"],
                            "n_convs": b["sum_n_convs"],
                            "n_turns": b["sum_n_turns"],
                            "sum_chars": b["sum_sum_chars"]}),
        batch_format="pyarrow")


def turn_length_quantiles_by_role(sf_dir: str,
                                  qs=(0.25, 0.5, 0.75, 0.9)):
    """Per-role turn-length quantiles — the truncation-policy input for
    a chat-training pipeline (how long are assistant vs user vs tool
    turns, exactly). Same discrete-quantile machinery as the docs
    per-language variant: block-local value compression, one role-keyed
    exchange, exact quantile_disc semantics vs DuckDB."""
    from ..sources.transcripts import read_transcripts
    from ..stages.agg import grouped_quantiles_disc

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "role": batch["role"],
            "n_chars": pc.cast(pc.utf8_length(
                pc.fill_null(batch["text"], "")), pa.int64()),
        })

    ds = read_transcripts(sf_dir).select_columns(
        ["role", "text"]).map_batches(_prep, batch_format="pyarrow")
    return grouped_quantiles_disc(ds, "role", "n_chars", list(qs))


def role_by_turn_position(sf_dir: str, cap: int = 10):
    """Conversation-shape profile: per (turn position, role) counts with
    positions capped at ``cap`` (the tail bucket) — who speaks when,
    the sanity check that catches role-alternation corruption in a
    transcript drop. One grouped_sums exchange over (min(turn_idx, cap),
    role) cells."""
    from ..sources.transcripts import read_transcripts
    from ..stages.agg import grouped_sums

    def _prep(batch: pa.Table) -> pa.Table:
        idx = np.minimum(np.asarray(batch["turn_idx"], np.int64), cap)
        return pa.table({
            "position": pa.array(idx, pa.int64()),
            "role": batch["role"],
        })

    ds = read_transcripts(sf_dir).select_columns(
        ["turn_idx", "role"]).map_batches(_prep, batch_format="pyarrow")
    return grouped_sums(ds, ["position", "role"], [], count_as="n_turns")


def tool_call_rate_by_role(sf_dir: str):
    """Per-role tool-call usage: turn count, tool-call count, and the
    rate in exact ppm (floor) — the agent-pipeline metric for how
    tool-heavy each role's turns are. Block partials → one role-keyed
    grouped_sums; the ppm division is a single exact-integer op."""
    from ..sources.transcripts import read_transcripts
    from ..stages.agg import grouped_sums

    def _prep(batch: pa.Table) -> pa.Table:
        tool = pc.fill_null(batch["tool"], "")
        has = pc.cast(pc.not_equal(tool, pa.scalar("")), pa.int64())
        return pa.table({
            "role": batch["role"],
            "n_tool_turns": has,
        })

    ds = read_transcripts(sf_dir).select_columns(
        ["role", "tool"]).map_batches(_prep, batch_format="pyarrow")
    t = grouped_sums(ds, ["role"], ["n_tool_turns"], count_as="n_turns")

    def _rate(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n_turns"], np.int64)
        k = np.asarray(batch["sum_n_tool_turns"], np.int64)
        return pa.table({
            "role": batch["role"],
            "n_turns": pa.array(n, pa.int64()),
            "n_tool_turns": pa.array(k, pa.int64()),
            "tool_rate_ppm": pa.array(
                (k * 1_000_000) // np.maximum(n, 1), pa.int64()),
        })

    return t.map_batches(_rate, batch_format="pyarrow")


def conv_tool_chain_counts(sf_dir: str):
    """Tool-CHAIN frequency: for every conversation, the '>'-joined
    sequence of tool names over its tool-calling turns (turn_idx order),
    counted across the corpus — the agent-behavior profile ("which tool
    sequences do assistants actually run?") that a transcript curation
    pass uses to spot degenerate loops. NULL and '' both mean "no tool
    call"; conversations with no tool turns don't chain (same as SQL's
    WHERE tool IS NOT NULL AND tool <> '' + GROUP BY conv).

    One conv exchange; chains assemble per partition from one lexsort +
    one ``pc.binary_join`` over a ListArray built straight from group
    offsets (no per-conv Python), and only (chain, count) partials reach
    the final combine."""
    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["tool"]),
                       pc.not_equal(batch["tool"], ""))
        t = batch.filter(keep)
        cid = t["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "tool": t["tool"],
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    part_schema = pa.schema([("chain", pa.string()),
                             ("n_convs", pa.int64())])

    def _chains(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        order = np.lexsort((tix, cid))
        cid_s = cid[order]
        starts = np.flatnonzero(np.r_[True, cid_s[1:] != cid_s[:-1]])
        offsets = pa.array(np.r_[starts, len(cid_s)].astype(np.int32))
        tools = part["tool"].combine_chunks().take(
            pa.array(order, pa.int64()))
        chains = pc.binary_join(
            pa.ListArray.from_arrays(offsets, tools), ">")
        ch = _to_bytes_array(chains)
        o2 = np.argsort(ch, kind="stable")
        ch_s = ch[o2]
        new = np.r_[True, ch_s[1:] != ch_s[:-1]]
        st = np.flatnonzero(new)
        cnt = np.diff(np.r_[st, len(ch_s)])
        return pa.table({
            "chain": chains.take(pa.array(o2[st], pa.int64())),
            "n_convs": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "tool")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(_cfg),
                                _chains, part_schema)
    out = grouped_sums(parts, ["chain"], ["n_convs"])
    return out.map_batches(
        lambda t: pa.table({"chain": t["chain"],
                            "n_convs": t["sum_n_convs"]}),
        batch_format="pyarrow")


ROLE_BALANCE_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("user_turns", pa.int64()), ("assistant_turns", pa.int64()),
    ("user_chars", pa.int64()), ("assistant_chars", pa.int64()),
])


def _role_balance_pivot(part: pa.Table) -> pa.Table:
    """Partition kernel for :func:`conv_role_balance` (module-level so
    tests can drive the unknown-role guard directly)."""
    from ..functions.segscore import _to_bytes_array

    if part.num_rows == 0:
        return ROLE_BALANCE_SCHEMA.empty_table()
    role = _to_bytes_array(part["role"].combine_chunks())
    is_user = role == b"user"
    if not (is_user | (role == b"assistant")).all():
        raise ValueError("unknown role in transcripts (expected "
                         "user/assistant)")
    cid = _to_bytes_array(part["conv_id"].combine_chunks())
    nch = np.asarray(part["n_chars"], np.int64)
    order = np.argsort(cid, kind="stable")
    cid_s = cid[order]
    starts = np.flatnonzero(np.r_[True, cid_s[1:] != cid_s[:-1]])
    u = is_user[order].astype(np.int64)
    nch_s = nch[order]
    return pa.table({
        "conv_id": part["conv_id"].combine_chunks().take(
            pa.array(order[starts], pa.int64())),
        "user_turns": pa.array(
            np.add.reduceat(u, starts), pa.int64()),
        "assistant_turns": pa.array(
            np.add.reduceat(1 - u, starts), pa.int64()),
        "user_chars": pa.array(
            np.add.reduceat(nch_s * u, starts), pa.int64()),
        "assistant_chars": pa.array(
            np.add.reduceat(nch_s * (1 - u), starts), pa.int64()),
    })


def conv_role_balance(sf_dir: str):
    """Per-conversation role pivot: user/assistant turn and char counts
    side by side — the balance profile a dialogue-quality gate reads
    (monologues, missing-assistant rows). One conv exchange; the pivot
    is two masked ``np.add.reduceat`` passes per partition. Roles other
    than user/assistant raise (the linestatus discipline: silent
    re-bucketing of an unknown category corrupts counts)."""
    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..functions.segscore import hash_strings64
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "role": batch["role"],
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    keyed = _read_turns(sf_dir, ("conv_id", "role", "text")
                        ).map_batches(_prep, batch_format="pyarrow")
    return exchange_map_groups(keyed, "conv_part",
                               resolve_num_partitions(_cfg),
                               _role_balance_pivot, ROLE_BALANCE_SCHEMA)


def turn_gap_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9)):
    """Exact discrete quantiles of the INTER-TURN gap (µs between
    consecutive turns of a conversation) — the latency profile that
    separates live chats from batch-imported logs. One conv exchange
    emits the gaps (adjacent same-conv rows after one lexsort); the
    shared value-histogram quantile machinery reduces them."""
    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import quantiles_disc
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    gap_schema = pa.schema([("gap_us", pa.int64())])

    def _gaps(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return gap_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        order = np.lexsort((tix, cid))
        cid_s, ts_s = cid[order], ts[order]
        same = cid_s[1:] == cid_s[:-1]
        return pa.table({"gap_us": pa.array(
            (ts_s[1:] - ts_s[:-1])[same], pa.int64())})

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "ts")
                        ).map_batches(_prep, batch_format="pyarrow")
    gaps = exchange_map_groups(keyed, "conv_part",
                               resolve_num_partitions(_cfg),
                               _gaps, gap_schema)
    return quantiles_disc(gaps, "gap_us", list(qs))


def conv_depth_histogram(sf_dir: str):
    """Conversation-length histogram (n_turns → n_convs): the shape
    that sizes every per-conversation kernel's worst case (a fat tail
    here is the skew the flagship's salted band exchange exists for).
    Only (conv_id) combos shuffle — one conv-keyed count exchange, then
    a ≤|depth-domain|-row cell exchange."""
    from ..stages.agg import grouped_sums

    per = grouped_sums(_read_turns(sf_dir, ["conv_id"]),
                       ["conv_id"], [], count_as="n_turns")
    return grouped_sums(
        per.map_batches(lambda t: pa.table({"n_turns": t["n_turns"]}),
                        batch_format="pyarrow"),
        ["n_turns"], [], count_as="n_convs")


LEXDIV_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("n_tokens", pa.int64()),
    ("n_distinct", pa.int64()), ("ttr_ppm", pa.int64()),
])


def conv_lexical_diversity(sf_dir: str):
    """Per-conversation type-token ratio (distinct tokens / tokens, ppm)
    — the transcript-grain twin of `lexical_diversity_docs`: a
    collapsing TTR flags looping agents / template spam, an inflated one
    flags garbled decode. ONE conv-keyed exchange; each partition
    tokenizes and counts all its conversations in one split + lexsort
    pass. Conversations with zero tokens emit nothing (matching the SQL
    twin's ``WHERE t <> ''``)."""
    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "text": pc.fill_null(batch["text"].combine_chunks(), ""),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _ttr(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return LEXDIV_SCHEMA.empty_table()
        cid = part["conv_id"].combine_chunks()
        toks = pc.split_pattern(part["text"].combine_chunks(), " ")
        ntok = np.asarray(pc.list_value_length(toks), np.int64)
        flat = toks.flatten()
        row_cid = _to_bytes_array(cid)[
            np.repeat(np.arange(part.num_rows, dtype=np.int64), ntok)]
        nonempty = np.asarray(pc.binary_length(flat), np.int64) > 0
        if not nonempty.any():
            return LEXDIV_SCHEMA.empty_table()
        tb = _to_bytes_array(flat)[nonempty]
        rc = row_cid[nonempty]
        order = np.lexsort((tb, rc))
        rc_s, tb_s = rc[order], tb[order]
        new_conv = np.r_[True, rc_s[1:] != rc_s[:-1]]
        starts = np.flatnonzero(new_conv)
        n_tok = np.diff(np.r_[starts, len(rc_s)]).astype(np.int64)
        new_tok = new_conv | np.r_[True, tb_s[1:] != tb_s[:-1]]
        n_dis = np.bincount(np.cumsum(new_conv) - 1,
                            weights=new_tok).astype(np.int64)
        # conv_id strings back from the ORIGINAL array: map the first
        # sorted flat position to its source row
        src_rows = np.repeat(np.arange(part.num_rows, dtype=np.int64),
                             ntok)[nonempty][order[starts]]
        return pa.table({
            "conv_id": cid.take(pa.array(src_rows, pa.int64())),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_distinct": pa.array(n_dis, pa.int64()),
            "ttr_ppm": pa.array(1_000_000 * n_dis // n_tok, pa.int64()),
        }).cast(LEXDIV_SCHEMA)

    keyed = _read_turns(sf_dir, ("conv_id", "text")).map_batches(
        _prep, batch_format="pyarrow")
    return exchange_map_groups(keyed, "conv_part",
                               resolve_num_partitions(_cfg),
                               _ttr, LEXDIV_SCHEMA)


SNAPSHOT_DIFF_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("status", pa.string()),
])


def _conv_fingerprints(turns_ds, fp_col: str):
    """(conv_id, md5-of-ordered-turn-texts) per conversation: one
    conv-keyed exchange; each partition orders its conversations' turns
    (turn_idx, then conv) and folds them into ONE `binary_join` +
    one column-wide md5 pass (no per-row Python)."""
    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..pipelines.docops import _md5_column
    from ..stages.exchange import exchange_map_groups

    out_schema = pa.schema([("conv_id", pa.string()),
                            (fp_col, pa.string())])

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "text": pc.fill_null(batch["text"].combine_chunks(), ""),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _fp(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        cid = part["conv_id"].combine_chunks()
        cb = _to_bytes_array(cid)
        ti = np.asarray(part["turn_idx"], np.int64)
        order = np.lexsort((ti, cb))
        cb_s = cb[order]
        new_conv = np.r_[True, cb_s[1:] != cb_s[:-1]]
        starts = np.flatnonzero(new_conv)
        text_s = part["text"].combine_chunks().take(
            pa.array(order, pa.int64()))
        offsets = np.r_[starts, len(cb_s)].astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         text_s)
        joined = pc.binary_join(lists, "\x1f")
        return pa.table({
            "conv_id": cid.take(pa.array(order[starts], pa.int64())),
            fp_col: _md5_column(joined.combine_chunks()
                                if isinstance(joined, pa.ChunkedArray)
                                else joined),
        }).cast(out_schema)

    keyed = turns_ds.map_batches(_prep, batch_format="pyarrow")
    return exchange_map_groups(keyed, "conv_part",
                               resolve_num_partitions(_cfg),
                               _fp, out_schema)


def snapshot_diff_transcripts(sf_dir: str, dir_b: str):
    """Two-snapshot TRANSCRIPTS diff at conversation grain — which
    conversations were ADDED, REMOVED, or CHANGED (same conv_id,
    different ordered-turn-text fingerprint) between snapshot A (the
    sf_dir corpus) and snapshot B (a turns-shaped Parquet directory).
    The third modality of the snapshot-diff family (docs:
    `snapshot_diff_docs`; embeddings: `snapshot_diff_embeddings`): each
    side reduces to per-conv md5 fingerprints on its own conv exchange
    (turn text never crosses twice), one full-outer conv_id exchange
    join, and only the changed surface is emitted."""
    import ray.data

    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..sources.transcripts import transcripts_path
    from ..stages.join import hash_join_exchange

    cols = ["conv_id", "turn_idx", "text"]
    a = _conv_fingerprints(
        ray.data.read_parquet(transcripts_path(sf_dir), columns=cols),
        "fp_a")
    b = _conv_fingerprints(
        ray.data.read_parquet(dir_b, columns=cols), "fp_b")
    j = hash_join_exchange(a, b, key="conv_id", left_cols=["fp_a"],
                           right_cols=["fp_b"],
                           n_parts=resolve_num_partitions(_cfg),
                           join_type="full outer")

    def _status(batch: pa.Table) -> pa.Table:
        fa = batch["fp_a"].combine_chunks()
        fb = batch["fp_b"].combine_chunks()
        a_null = np.asarray(pc.is_null(fa), bool)
        b_null = np.asarray(pc.is_null(fb), bool)
        neq = np.asarray(pc.fill_null(pc.not_equal(fa, fb), False), bool)
        status = np.where(a_null, "added",
                          np.where(b_null, "removed", "changed"))
        keep = a_null | b_null | neq
        return pa.table({
            "conv_id": pc.filter(batch["conv_id"], pa.array(keep)),
            "status": pa.array(status[keep], pa.string()),
        }).cast(SNAPSHOT_DIFF_SCHEMA)

    return j.map_batches(_status, batch_format="pyarrow")


CONV_EXACT_DEDUP_SCHEMA = pa.schema([
    ("fp", pa.string()), ("n_convs", pa.int64()),
    ("rep_conv_id", pa.string()),
])

SPLIT_LEAK_SCHEMA = pa.schema([
    ("fp", pa.string()), ("n_convs", pa.int64()),
    ("n_train", pa.int64()), ("n_heldout", pa.int64()),
    ("rep_conv_id", pa.string()),
])


def _conv_fp_groups(sf_dir: str, merge_fn, out_schema):
    """Shared spine for conversation-fingerprint group ops: per-conv
    md5 fingerprints (one conv exchange, `_conv_fingerprints`), then a
    second exchange on the fingerprint key so each group resolves in
    exactly one partition."""
    import ray.data

    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..functions.segscore import hash_strings64
    from ..sources.transcripts import transcripts_path
    from ..stages.exchange import exchange_map_groups

    n_parts = resolve_num_partitions(_cfg)
    fps = _conv_fingerprints(
        ray.data.read_parquet(transcripts_path(sf_dir),
                              columns=["conv_id", "turn_idx", "text"]),
        "fp")

    def _key(t: pa.Table) -> pa.Table:
        fp = t["fp"].combine_chunks()
        return pa.table({
            "conv_id": t["conv_id"], "fp": fp,
            "fp_part": pa.array(hash_strings64(fp) % n_parts, pa.int64()),
        })

    return exchange_map_groups(fps.map_batches(_key,
                                               batch_format="pyarrow"),
                               "fp_part", n_parts, merge_fn, out_schema)


def _fp_group_stats(part: pa.Table):
    """(sorted-run view of one partition's fingerprint groups):
    returns (fp_bytes_sorted, group starts, group sizes, rep conv_id
    Arrow take indices, sorted original order) for reuse by both
    group ops."""
    from ..functions.segscore import _to_bytes_array

    fpb = _to_bytes_array(part["fp"].combine_chunks())
    cb = _to_bytes_array(part["conv_id"].combine_chunks())
    order = np.lexsort((cb, fpb))
    fp_s = fpb[order]
    new = np.r_[True, fp_s[1:] != fp_s[:-1]]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.r_[starts, len(fp_s)])
    return order, starts, sizes


def exact_dedup_conversations(sf_dir: str):
    """EXACT duplicate-conversation groups: conversations whose ordered
    turn texts are byte-identical (same `_conv_fingerprints` md5),
    with group size and the lexicographically-smallest conv as
    representative — tier 0 of the transcripts cascade made standalone
    and SQL-checkable (the fingerprint is pure SQL: md5 of the ordered
    string_agg). Near-dup variants (the flagship's LSH tiers) do NOT
    appear here; only byte-exact re-logs do."""
    def _groups(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return CONV_EXACT_DEDUP_SCHEMA.empty_table()
        order, starts, sizes = _fp_group_stats(part)
        dup = sizes >= 2
        take = pa.array(order[starts[dup]], pa.int64())
        return pa.table({
            "fp": part["fp"].combine_chunks().take(take),
            "n_convs": pa.array(sizes[dup].astype(np.int64), pa.int64()),
            "rep_conv_id": part["conv_id"].combine_chunks().take(take),
        }).cast(CONV_EXACT_DEDUP_SCHEMA)

    return _conv_fp_groups(sf_dir, _groups, CONV_EXACT_DEDUP_SCHEMA)


def split_leakage_transcripts(sf_dir: str, train_buckets: int = 8,
                              n_buckets: int = 10):
    """Eval-hygiene audit: exact-duplicate conversation groups that SPAN
    an id-hash train/heldout split (bucket = first 8 md5 hex digits of
    conv_id mod ``n_buckets``; train = bucket < ``train_buckets``, the
    `hash_split_docs` idiom) — each leaking group is a heldout example
    whose byte-identical twin is in training. This is the measurement
    behind "dedup BEFORE you split": an id-keyed split cannot see
    content duplicates, and this op counts exactly what slipped
    through. (A digit-run-keyed split would be leak-proof here only by
    accident of the synth ids; the md5 bucket models the realistic
    arbitrary-id split.)"""
    def _leaks(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return SPLIT_LEAK_SCHEMA.empty_table()
        from ..pipelines.docops import _hex8_to_int, _md5_column

        cid = part["conv_id"].combine_chunks()
        b = _hex8_to_int(_md5_column(cid)) % np.uint64(n_buckets)
        is_train = b < train_buckets
        order, starts, sizes = _fp_group_stats(part)
        tr = np.add.reduceat(is_train[order].astype(np.int64), starts)
        n = sizes.astype(np.int64)
        ho = n - tr
        leak = (tr > 0) & (ho > 0)
        take = pa.array(order[starts[leak]], pa.int64())
        return pa.table({
            "fp": part["fp"].combine_chunks().take(take),
            "n_convs": pa.array(n[leak], pa.int64()),
            "n_train": pa.array(tr[leak], pa.int64()),
            "n_heldout": pa.array(ho[leak], pa.int64()),
            "rep_conv_id": cid.take(take),
        }).cast(SPLIT_LEAK_SCHEMA)

    return _conv_fp_groups(sf_dir, _leaks, SPLIT_LEAK_SCHEMA)


def first_tool_position_histogram(sf_dir: str):
    """Histogram of the turn index where a conversation FIRST calls a
    tool (n_convs per position; tool-free conversations are absent,
    matching the SQL twin's WHERE) — the agent-behaviour shape that
    tells a curation run whether tool use is front-loaded (retrieval
    agents) or emergent mid-conversation. Block-local per-conv minima
    combine exactly under the conv-keyed min exchange
    (`grouped_minmax`), then ≤ |position-domain| cells ride the final
    count exchange."""
    from ..stages.agg import grouped_minmax, grouped_sums

    def _prep(batch: pa.Table) -> pa.Table:
        tool = pc.fill_null(batch["tool"].combine_chunks(), "")
        keep = pc.not_equal(tool, "")
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
        }).filter(keep)

    per = grouped_minmax(
        _read_turns(sf_dir, ("conv_id", "turn_idx", "tool")).map_batches(
            _prep, batch_format="pyarrow"),
        ["conv_id"], "turn_idx")
    return grouped_sums(
        per.map_batches(
            lambda t: pa.table({"first_tool": t["min_turn_idx"]}),
            batch_format="pyarrow"),
        ["first_tool"], [], count_as="n_convs")


def response_latency_by_role(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9)):
    """Per-ROLE response-latency quantiles: the inter-turn gap
    (whole seconds) attributed to the role of the RESPONDING turn —
    assistant rows measure model/agent turnaround, user rows measure
    think time; the split that `turn_gap_quantiles` aggregates away.
    One conv exchange emits (role, gap_s) for every adjacent same-conv
    turn pair; the grouped value-histogram quantile exchange reduces
    them (bounded by roles × second domain)."""
    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_quantiles_disc
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "role": batch["role"],
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    gap_schema = pa.schema([("role", pa.string()),
                            ("gap_s", pa.int64())])

    def _gaps(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return gap_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        order = np.lexsort((tix, cid))
        cid_s, ts_s = cid[order], ts[order]
        same = np.r_[False, cid_s[1:] == cid_s[:-1]]
        gap = ts_s - np.r_[np.int64(0), ts_s[:-1]]
        role = part["role"].combine_chunks().take(
            pa.array(order[same], pa.int64()))
        return pa.table({
            "role": role,
            "gap_s": pa.array(gap[same] // 1_000_000, pa.int64()),
        }).cast(gap_schema)

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "ts", "role")
                        ).map_batches(_prep, batch_format="pyarrow")
    gaps = exchange_map_groups(keyed, "conv_part",
                               resolve_num_partitions(_cfg),
                               _gaps, gap_schema)
    return grouped_quantiles_disc(gaps, "role", "gap_s", list(qs))


TOOL_BIGRAM_SCHEMA = pa.schema([
    ("tool_a", pa.string()), ("tool_b", pa.string()),
    ("n_pairs", pa.int64()),
])


def tool_chain_bigrams(sf_dir: str):
    """Tool→tool transition counts (adjacent tool CALLS within a
    conversation, non-tool turns skipped) — the Markov view of
    `conv_tool_chain_counts`' full chains: which tool follows which,
    the statistic an agent-routing policy is audited against. One conv
    exchange; each partition filters to tool turns, orders by
    (conv, turn_idx), and emits adjacent same-conv pairs; ≤ tools²
    cells ride the final exchange."""
    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        tool = pc.fill_null(batch["tool"].combine_chunks(), "")
        keep = pc.not_equal(tool, "")
        cid = batch["conv_id"].combine_chunks()
        t = pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "tool": tool,
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        }).filter(keep)
        return t

    pair_schema = pa.schema([("tool_a", pa.string()),
                             ("tool_b", pa.string())])

    def _pairs(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return pair_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        order = np.lexsort((tix, cid))
        cid_s = cid[order]
        same = np.r_[False, cid_s[1:] == cid_s[:-1]]
        tool = part["tool"].combine_chunks()
        return pa.table({
            "tool_a": tool.take(pa.array(order[:-1][same[1:]],
                                         pa.int64())),
            "tool_b": tool.take(pa.array(order[same], pa.int64())),
        }).cast(pair_schema)

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "tool")
                        ).map_batches(_prep, batch_format="pyarrow")
    pairs = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(_cfg),
                                _pairs, pair_schema)
    g = grouped_sums(pairs, ["tool_a", "tool_b"], [], count_as="n_pairs")
    return g.map_batches(lambda t: t.cast(TOOL_BIGRAM_SCHEMA),
                         batch_format="pyarrow")


TOOL_RUN_SCHEMA = pa.schema([
    ("tool", pa.string()),
    ("run_len", pa.int64()),
    ("n_runs", pa.int64()),
])


def conv_tool_run_lengths(sf_dir: str):
    """Run-length profile of repeated tool calls: over a conversation's
    tool-calling turns only (tool <> '', turn_idx order), every maximal
    stretch of consecutive calls to the SAME tool is one run; output
    counts runs per (tool, run_len) — the retry-loop detector ("the
    agent hammered `search` 4 times in a row") a transcript curation
    pass uses to flag degenerate agent behavior.

    The classic SQL double-row_number gaps-and-islands collapses to one
    lexsort per partition: runs break where the conversation OR the tool
    changes between adjacent tool-turns; run lengths are one ``np.diff``
    over the break positions. Only (tool, run_len, partial-count) rows
    cross the wire after the conv exchange."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["tool"]),
                       pc.not_equal(batch["tool"], ""))
        t = batch.filter(keep)
        cid = t["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "tool": t["tool"],
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    part_schema = TOOL_RUN_SCHEMA

    def _runs(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        tool = part["tool"].combine_chunks()
        tb = _to_bytes_array(tool)
        order = np.lexsort((tix, cid))
        cid_s, tb_s = cid[order], tb[order]
        new_run = np.r_[True, (cid_s[1:] != cid_s[:-1])
                        | (tb_s[1:] != tb_s[:-1])]
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.r_[starts, len(cid_s)])
        run_tool = tb_s[starts]
        o2 = np.lexsort((lens, run_tool))
        rt_s, ln_s = run_tool[o2], lens[o2]
        first = np.r_[True, (rt_s[1:] != rt_s[:-1])
                      | (ln_s[1:] != ln_s[:-1])]
        st = np.flatnonzero(first)
        cnt = np.diff(np.r_[st, len(rt_s)])
        pick = pa.array(order[starts[o2[st]]], pa.int64())
        return pa.table({
            "tool": tool.take(pick),
            "run_len": pa.array(ln_s[st].astype(np.int64), pa.int64()),
            "n_runs": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "tool")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _runs, part_schema)
    g = grouped_sums(parts, ["tool", "run_len"], ["n_runs"])
    return g.map_batches(
        lambda t: pa.table({"tool": t["tool"],
                            "run_len": t["run_len"],
                            "n_runs": t["sum_n_runs"]}
                           ).cast(TOOL_RUN_SCHEMA),
        batch_format="pyarrow")


TOOL_SET_SCHEMA = pa.schema([
    ("tool_set", pa.string()),
    ("n_convs", pa.int64()),
])


def conv_tool_set_counts(sf_dir: str):
    """Tool-SET frequency: the sorted set of distinct tools each
    conversation ever called (vs :func:`conv_tool_chain_counts`'s
    ordered chain), '>'-joined, counted across the corpus — "which tool
    *combinations* co-occur" for capability bucketing. NULL/'' mean no
    tool call; conversations with no tool turns don't appear (same rows
    as SQL's WHERE tool <> '' GROUP BY conv_id).

    One conv exchange; per partition a single lexsort on (conv, tool
    bytes) dedups AND orders the set members, ``pc.binary_join`` over
    group offsets assembles the signatures, and only (tool_set, count)
    partials reach the final combine."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["tool"]),
                       pc.not_equal(batch["tool"], ""))
        t = batch.filter(keep)
        cid = t["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "tool": t["tool"],
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    part_schema = TOOL_SET_SCHEMA

    def _sets(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tools = part["tool"].combine_chunks()
        tb = _to_bytes_array(tools)
        order = np.lexsort((tb, cid))
        cid_s, tb_s = cid[order], tb[order]
        keep = np.r_[True, (cid_s[1:] != cid_s[:-1])
                     | (tb_s[1:] != tb_s[:-1])]
        kept = order[keep]
        cid_k = cid_s[keep]
        starts = np.flatnonzero(np.r_[True, cid_k[1:] != cid_k[:-1]])
        offsets = pa.array(np.r_[starts, len(cid_k)].astype(np.int32))
        sets = pc.binary_join(
            pa.ListArray.from_arrays(
                offsets, tools.take(pa.array(kept, pa.int64()))), ">")
        sb = _to_bytes_array(sets)
        o2 = np.argsort(sb, kind="stable")
        sb_s = sb[o2]
        new = np.r_[True, sb_s[1:] != sb_s[:-1]]
        st = np.flatnonzero(new)
        cnt = np.diff(np.r_[st, len(sb_s)])
        return pa.table({
            "tool_set": sets.take(pa.array(o2[st], pa.int64())),
            "n_convs": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    keyed = _read_turns(sf_dir, ("conv_id", "tool")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _sets, part_schema)
    g = grouped_sums(parts, ["tool_set"], ["n_convs"])
    return g.map_batches(
        lambda t: pa.table({"tool_set": t["tool_set"],
                            "n_convs": t["sum_n_convs"]}
                           ).cast(TOOL_SET_SCHEMA),
        batch_format="pyarrow")


TOOL_ADOPTION_SCHEMA = pa.schema([
    ("n_turns", pa.int64()),
    ("n_convs", pa.int64()),
    ("n_with_tool", pa.int64()),
])


def tool_adoption_by_conv_length(sf_dir: str):
    """Does tool use scale with conversation depth? Per exact
    conversation length (turn count): how many conversations exist, and
    how many call at least one tool — the adoption curve a capability
    dashboard plots. One conv exchange; each partition folds its convs
    with a lexsort + reduceat (length = run length, adoption = max of
    the tool flag per run) and only (n_turns, count, count) partials
    reach the final combine."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        has_tool = pc.and_(pc.is_valid(batch["tool"]),
                           pc.not_equal(batch["tool"], ""))
        return pa.table({
            "conv_id": cid,
            "has_tool": pc.cast(has_tool, pa.int64()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    part_schema = TOOL_ADOPTION_SCHEMA

    def _fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        ht = np.asarray(part["has_tool"], np.int64)
        order = np.argsort(cid, kind="stable")
        cid_s, ht_s = cid[order], ht[order]
        starts = np.flatnonzero(np.r_[True, cid_s[1:] != cid_s[:-1]])
        lens = np.diff(np.r_[starts, len(cid_s)])
        adopted = np.maximum.reduceat(ht_s, starts)
        o2 = np.lexsort((adopted, lens))
        ln_s, ad_s = lens[o2], adopted[o2]
        first = np.r_[True, (ln_s[1:] != ln_s[:-1])
                      | (ad_s[1:] != ad_s[:-1])]
        st = np.flatnonzero(first)
        cnt = np.diff(np.r_[st, len(ln_s)])
        return pa.table({
            "n_turns": pa.array(ln_s[st].astype(np.int64), pa.int64()),
            "n_convs": pa.array(cnt.astype(np.int64), pa.int64()),
            "n_with_tool": pa.array((cnt * ad_s[st]).astype(np.int64),
                                    pa.int64()),
        })

    keyed = _read_turns(sf_dir, ("conv_id", "tool")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _fold, part_schema)
    g = grouped_sums(parts, ["n_turns"], ["n_convs", "n_with_tool"])
    return g.map_batches(
        lambda t: pa.table({"n_turns": t["n_turns"],
                            "n_convs": t["sum_n_convs"],
                            "n_with_tool": t["sum_n_with_tool"]}
                           ).cast(TOOL_ADOPTION_SCHEMA),
        batch_format="pyarrow")


VERBOSITY_SCHEMA = pa.schema([
    ("ratio_bucket_e2", pa.int64()),
    ("n_convs", pa.int64()),
])


def conv_verbosity_histogram(sf_dir: str, cap: int = 500):
    """Assistant-verbosity histogram: per conversation the exact floor
    ratio ``assistant_chars·100 // max(user_chars, 1)`` clamped to
    ``cap`` (5× and beyond folds into one tail bucket), counted per
    bucket. Composes :func:`conv_role_balance` (one conv exchange);
    the bucket fold is dim-bounded."""
    import numpy as np

    from ..stages.agg import grouped_sums

    bal = conv_role_balance(sf_dir)

    def _bucket(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["assistant_chars"], np.int64)
        u = np.maximum(np.asarray(batch["user_chars"], np.int64), 1)
        b = np.minimum(a * 100 // u, cap)
        return pa.table({
            "ratio_bucket_e2": pa.array(b, pa.int64()),
        })

    g = grouped_sums(bal.map_batches(_bucket, batch_format="pyarrow"),
                     ["ratio_bucket_e2"], [], count_as="n_convs")
    return g.map_batches(lambda t: t.cast(VERBOSITY_SCHEMA),
                         batch_format="pyarrow")


TOOL_PAIR_SCHEMA = pa.schema([
    ("tool_a", pa.string()),
    ("tool_b", pa.string()),
    ("n_convs", pa.int64()),
])


def tool_copresence_pairs(sf_dir: str):
    """Which tools appear TOGETHER in a conversation: canonical
    (tool_a < tool_b) pair counts over each conversation's distinct
    tool set — the market-basket shape with conversations as baskets
    (≤ a handful of tools each, so the per-basket pair explosion is
    constant-bounded). One conv exchange groups the distinct
    (conv, tool) fold; pairs emit per size class (reshape + triu)."""
    import numpy as np

    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        tool = pc.fill_null(batch["tool"].combine_chunks(), "")
        cid = batch["conv_id"].combine_chunks()
        t = pa.table({"conv_id": cid, "tool": tool})
        t = t.filter(pc.greater(pc.binary_length(t["tool"]), 0))
        cid2 = t["conv_id"].combine_chunks()
        return t.append_column(
            "conv_part", pa.array(hash_strings64(cid2) % 1024,
                                  pa.int64()))

    pairs_schema = pa.schema([("tool_a", pa.string()),
                              ("tool_b", pa.string())])

    def _pairs(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pairs_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tool = part["tool"].combine_chunks()
        tb = _to_bytes_array(tool)
        order = np.lexsort((tb, cid))
        cid_s, tb_s = cid[order], tb[order]
        # distinct (conv, tool)
        keep = np.r_[True, (cid_s[1:] != cid_s[:-1])
                     | (tb_s[1:] != tb_s[:-1])]
        idx = order[keep]
        cid_k, tb_k = cid_s[keep], tb_s[keep]
        first = np.flatnonzero(np.r_[True, cid_k[1:] != cid_k[:-1]])
        lens = np.diff(np.r_[first, len(cid_k)])
        out_a, out_b = [], []
        for l in np.unique(lens):
            if l < 2:
                continue
            sel = first[lens == l]
            mat = (sel[:, None] + np.arange(l)[None, :]).reshape(-1, l)
            ii, jj = np.triu_indices(l, 1)
            out_a.append(mat[:, ii].ravel())
            out_b.append(mat[:, jj].ravel())
        if not out_a:
            return pairs_schema.empty_table()
        ia = idx[np.concatenate(out_a)]
        ib = idx[np.concatenate(out_b)]
        return pa.table({
            "tool_a": tool.take(pa.array(ia, pa.int64())),
            "tool_b": tool.take(pa.array(ib, pa.int64())),
        })

    keyed = _read_turns(sf_dir, ("conv_id", "tool")).map_batches(
        _prep, batch_format="pyarrow")
    pairs = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(_cfg),
                                _pairs, pairs_schema)
    g = grouped_sums(pairs, ["tool_a", "tool_b"], [],
                     count_as="n_convs")
    return g.map_batches(lambda t: t.cast(TOOL_PAIR_SCHEMA),
                         batch_format="pyarrow")


def _distinct_turn_tokens(text):
    """(row_idx, token_bytes) of the DISTINCT whitespace tokens of each
    row, under the engine's standard tokenizer convention (WS-normalize,
    trim, split on ' ', drop empties — ``docops._token_stats_batch``).
    Shared kernel behind the adjacent-turn echo and first-vs-last
    topic-drift audits; one lexsort dedups (row, token)."""
    from ..functions.segscore import _to_bytes_array
    from ..functions.sketch import WS_PATTERN

    filled = pc.fill_null(text, "")
    trimmed = pc.utf8_trim(
        pc.replace_substring_regex(filled, WS_PATTERN, " "), " ")
    splits = pc.split_pattern(trimmed, " ")
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    lens = np.asarray(pc.list_value_length(splits), np.int64)
    flat = pc.list_flatten(splits)
    tokb = _to_bytes_array(flat)
    rix = np.repeat(np.arange(len(filled), dtype=np.int64), lens)
    keep = tokb != b""
    rix, tokb = rix[keep], tokb[keep]
    if rix.size == 0:
        return rix, tokb
    o = np.lexsort((tokb, rix))
    rix, tokb = rix[o], tokb[o]
    uniq = np.r_[True, (rix[1:] != rix[:-1]) | (tokb[1:] != tokb[:-1])]
    return rix[uniq], tokb[uniq]


ECHO_SCHEMA = pa.schema([
    ("role_a", pa.string()), ("role_b", pa.string()),
    ("n_pairs", pa.int64()), ("n_echo", pa.int64()),
    ("sum_inter", pa.int64()), ("sum_union", pa.int64()),
])


def echo_rate_transcripts(sf_dir: str):
    """Adjacent-turn echo audit: for every consecutive turn pair
    (turn_idx difference exactly 1) within a conversation, the
    distinct-token intersection and union, aggregated per (role_a,
    role_b) cell — n_pairs, n_echo (token-Jaccard ≥ 0.25 by the
    integer cross-multiply 4·inter ≥ union, union > 0), and the exact
    Σinter / Σunion so the consumer derives the corpus echo ratio.
    This is the turn-grain repetition signal a transcript curation
    pass uses to spot agents parroting the user (and vice versa).

    One conv exchange; per partition the pair inventory is one sort on
    the composite (conv, turn) key (adjacent composite keys differing
    by 1 ⟺ adjacent turns of the SAME conversation), intersections are
    one lexsort of the deduped (token, composite-key) rows — a token
    present in turns t and t+1 shows up as an adjacent equal-token run
    — and only ≤ roles² cells leave the partition."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
            "text": batch["text"],
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _echo(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return ECHO_SCHEMA.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        _, codes = np.unique(cid, return_inverse=True)
        turn = np.asarray(part["turn_idx"], np.int64)
        rcol = part["role"].combine_chunks()
        mt = int(turn.max())
        if (int(codes.max()) + 1) >= 2 ** 62 // (mt + 2):
            raise ValueError("echo_rate: conv × turn composite key "
                             "overflows int64; re-partition finer")
        ck = codes.astype(np.int64) * (mt + 2) + turn
        rix, tokb = _distinct_turn_tokens(part["text"].combine_chunks())
        na = np.bincount(rix, minlength=part.num_rows)
        to = np.argsort(ck, kind="stable")
        ck_s = ck[to]
        adj = ck_s[1:] - ck_s[:-1] == 1
        if not adj.any():
            return ECHO_SCHEMA.empty_table()
        pair_ck = ck_s[:-1][adj]
        ra_idx, rb_idx = to[:-1][adj], to[1:][adj]
        inter = np.zeros(len(pair_ck), np.int64)
        if rix.size:
            ckr = ck[rix]
            o2 = np.lexsort((ckr, tokb))
            tb2, ck2 = tokb[o2], ckr[o2]
            hit = (tb2[1:] == tb2[:-1]) & (ck2[1:] - ck2[:-1] == 1)
            if hit.any():
                uk, cnts = np.unique(ck2[:-1][hit], return_counts=True)
                pos = np.searchsorted(pair_ck, uk)
                inter[pos] = cnts
        union = na[ra_idx] + na[rb_idx] - inter
        echo = ((union > 0) & (4 * inter >= union)).astype(np.int64)
        rb = _to_bytes_array(rcol)
        ra_b, rb_b = rb[ra_idx], rb[rb_idx]
        po = np.lexsort((rb_b, ra_b))
        ra_s, rb_s = ra_b[po], rb_b[po]
        first = np.r_[True,
                      (ra_s[1:] != ra_s[:-1]) | (rb_s[1:] != rb_s[:-1])]
        st = np.flatnonzero(first)
        n_pairs = np.diff(np.r_[st, len(po)])

        def _seg(x):
            return pa.array(np.add.reduceat(x[po], st), pa.int64())

        return pa.table({
            "role_a": rcol.take(pa.array(ra_idx[po[st]], pa.int64())),
            "role_b": rcol.take(pa.array(rb_idx[po[st]], pa.int64())),
            "n_pairs": pa.array(n_pairs.astype(np.int64), pa.int64()),
            "n_echo": _seg(echo),
            "sum_inter": _seg(inter),
            "sum_union": _seg(union),
        }).cast(ECHO_SCHEMA)

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "role", "text")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _echo, ECHO_SCHEMA)
    g = grouped_sums(parts, ["role_a", "role_b"],
                     ["n_pairs", "n_echo", "sum_inter", "sum_union"])
    return g.map_batches(
        lambda t: pa.table({"role_a": t["role_a"],
                            "role_b": t["role_b"],
                            "n_pairs": t["sum_n_pairs"],
                            "n_echo": t["sum_n_echo"],
                            "sum_inter": t["sum_sum_inter"],
                            "sum_union": t["sum_sum_union"]}
                           ).cast(ECHO_SCHEMA),
        batch_format="pyarrow")


DRIFT_SCHEMA = pa.schema([
    ("drift_decile", pa.int64()),
    ("n_convs", pa.int64()),
])


def conv_topic_drift_histogram(sf_dir: str):
    """Topic-drift histogram at CONVERSATION grain: distinct-token
    Jaccard between each conversation's FIRST and LAST turn, bucketed
    into integer deciles (⌊10·inter/union⌋) — how far conversations
    wander from where they start; decile 10 is verbatim-identical
    endpoints (single-turn conversations land there by definition).
    Conversations whose two endpoint turns are both empty are dropped
    (union 0, matching the SQL ``WHERE u > 0``). One conv exchange;
    endpoint rows come from one (conv, turn) lexsort, intersections
    from a slot-composite ``intersect1d`` over only the endpoint
    tokens, and ≤ 11 decile cells leave each partition."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([("drift_decile", pa.int64()),
                             ("n", pa.int64())])

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "text": batch["text"],
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _drift(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        turn = np.asarray(part["turn_idx"], np.int64)
        rix, tokb = _distinct_turn_tokens(part["text"].combine_chunks())
        na = np.bincount(rix, minlength=part.num_rows)
        to = np.lexsort((turn, cid))
        cs = cid[to]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        ends = np.r_[starts[1:], len(cs)] - 1
        fi, li = to[starts], to[ends]
        slot_f = np.full(part.num_rows, -1, np.int64)
        slot_f[fi] = np.arange(len(fi))
        slot_l = np.full(part.num_rows, -1, np.int64)
        slot_l[li] = np.arange(len(li))
        m1, m2 = slot_f[rix] >= 0, slot_l[rix] >= 0
        inter = np.zeros(len(fi), np.int64)
        alltok = np.concatenate([tokb[m1], tokb[m2]])
        if alltok.size:
            _, inv = np.unique(alltok, return_inverse=True)
            width = int(inv.max()) + 2
            if len(fi) >= 2 ** 62 // width:
                raise ValueError("topic_drift: conv × token composite "
                                 "key overflows int64")
            n1 = int(m1.sum())
            k1 = slot_f[rix[m1]] * width + inv[:n1]
            k2 = slot_l[rix[m2]] * width + inv[n1:]
            common = np.intersect1d(k1, k2)
            if common.size:
                uk, cn = np.unique(common // width, return_counts=True)
                inter[uk] = cn
        single = fi == li
        u = np.where(single, na[fi], na[fi] + na[li] - inter)
        i_ = np.where(single, na[fi], inter)
        mask = u > 0
        dec = i_[mask] * 10 // u[mask]
        if dec.size == 0:
            return part_schema.empty_table()
        uk, cn = np.unique(dec, return_counts=True)
        return pa.table({
            "drift_decile": pa.array(uk.astype(np.int64), pa.int64()),
            "n": pa.array(cn.astype(np.int64), pa.int64()),
        })

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "text")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _drift, part_schema)
    g = grouped_sums(parts, ["drift_decile"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"drift_decile": t["drift_decile"],
                            "n_convs": t["sum_n"]}).cast(DRIFT_SCHEMA),
        batch_format="pyarrow")


LONGEST_POS_SCHEMA = pa.schema([
    ("position_decile", pa.int64()),
    ("n_convs", pa.int64()),
])


def longest_turn_position_histogram(sf_dir: str):
    """Where does a conversation's bulk land: per conv, the RELATIVE
    position decile (⌊turn_idx·10 / n_turns⌋, 0 = opening, 9 = close)
    of its LONGEST turn (char count, earliest-turn tiebreak — exactly
    SQL ``row_number() OVER (ORDER BY length DESC, turn_idx) = 1``),
    histogrammed. Front-loaded mass = info-dump openings; back-loaded
    = escalating answers. One conv exchange; the winner per conv falls
    out of a single (conv, −chars, turn) lexsort and ≤ 10 cells leave
    each partition."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([("position_decile", pa.int64()),
                             ("n", pa.int64())])

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(
                pc.fill_null(batch["text"].combine_chunks(), "")),
                pa.int64()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _winner(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        nch = np.asarray(part["n_chars"], np.int64)
        order = np.lexsort((tix, -nch, cid))
        cs = cid[order]
        new = np.r_[True, cs[1:] != cs[:-1]]
        win = order[np.flatnonzero(new)]
        # turns per conv, aligned to the winner rows
        _, inv = np.unique(cid, return_inverse=True)
        ntab = np.bincount(inv)
        dec = tix[win] * 10 // ntab[inv[win]]
        uk, cn = np.unique(dec, return_counts=True)
        return pa.table({
            "position_decile": pa.array(uk.astype(np.int64), pa.int64()),
            "n": pa.array(cn.astype(np.int64), pa.int64()),
        })

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "text")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _winner, part_schema)
    g = grouped_sums(parts, ["position_decile"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"position_decile": t["position_decile"],
                            "n_convs": t["sum_n"]}).cast(
            LONGEST_POS_SCHEMA),
        batch_format="pyarrow")


AMPLIFY_SCHEMA = pa.schema([
    ("bucket", pa.int64()),
    ("n_pairs", pa.int64()),
])


def response_amplification_histogram(sf_dir: str):
    """Verbosity-amplification histogram: for every user turn whose
    NEXT turn (turn_idx + 1, same conv) is an assistant turn, the char
    ratio assistant·100 // max(user, 1), bucketed by //25 and capped
    at 40 (≥ 10× amplification saturates the last bucket) — does the
    assistant answer in proportion to the prompt. Same composite-key
    adjacency as the echo audit; ≤ 41 cells leave each partition."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([("bucket", pa.int64()),
                             ("n", pa.int64())])

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
            "n_chars": pc.cast(pc.utf8_length(
                pc.fill_null(batch["text"].combine_chunks(), "")),
                pa.int64()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _amp(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        _, codes = np.unique(cid, return_inverse=True)
        tix = np.asarray(part["turn_idx"], np.int64)
        role = _to_bytes_array(part["role"].combine_chunks())
        nch = np.asarray(part["n_chars"], np.int64)
        mt = int(tix.max())
        if (int(codes.max()) + 1) >= 2 ** 62 // (mt + 2):
            raise ValueError("amplification: composite key overflow; "
                             "re-partition finer")
        ck = codes.astype(np.int64) * (mt + 2) + tix
        o = np.argsort(ck, kind="stable")
        ck_s = ck[o]
        adj = ck_s[1:] - ck_s[:-1] == 1
        ai, bi = o[:-1][adj], o[1:][adj]
        m = (role[ai] == b"user") & (role[bi] == b"assistant")
        if not m.any():
            return part_schema.empty_table()
        ratio = nch[bi[m]] * 100 // np.maximum(nch[ai[m]], 1)
        bucket = np.minimum(ratio // 25, 40)
        uk, cn = np.unique(bucket, return_counts=True)
        return pa.table({
            "bucket": pa.array(uk.astype(np.int64), pa.int64()),
            "n": pa.array(cn.astype(np.int64), pa.int64()),
        })

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "role", "text")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _amp, part_schema)
    g = grouped_sums(parts, ["bucket"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"bucket": t["bucket"],
                            "n_pairs": t["sum_n"]}).cast(
            AMPLIFY_SCHEMA),
        batch_format="pyarrow")


TOOL_TRIGRAM_SCHEMA = pa.schema([
    ("tool_1", pa.string()),
    ("tool_2", pa.string()),
    ("tool_3", pa.string()),
    ("n_trigrams", pa.int64()),
])


def tool_chain_trigrams(sf_dir: str):
    """Second-order tool-sequence motifs: over a conversation's
    tool-calling turns ONLY (tool <> '', turn order), count every
    (tool, next, next²) triple — the 3-step agent loop detector
    (search→fetch→search …), extending ``tool_chain_bigrams`` one
    step. One conv exchange; triples form from two shifted same-conv
    masks and counting is one lexsort over three S-dtype views; ≤
    tools³ cells leave each partition."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["tool"]),
                       pc.not_equal(batch["tool"], ""))
        t = batch.filter(keep)
        cid = t["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "tool": t["tool"],
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _tri(part: pa.Table) -> pa.Table:
        if part.num_rows < 3:
            return TOOL_TRIGRAM_SCHEMA.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        tool = part["tool"].combine_chunks()
        tb = _to_bytes_array(tool)
        order = np.lexsort((tix, cid))
        c_s, t_s = cid[order], tb[order]
        same = c_s[1:] == c_s[:-1]
        tri = same[:-1] & same[1:]
        if not tri.any():
            return TOOL_TRIGRAM_SCHEMA.empty_table()
        a, b, c = t_s[:-2][tri], t_s[1:-1][tri], t_s[2:][tri]
        porder = np.lexsort((c, b, a))
        a_s, b_s, c_s2 = a[porder], b[porder], c[porder]
        new_run = np.r_[True, (a_s[1:] != a_s[:-1])
                        | (b_s[1:] != b_s[:-1]) | (c_s2[1:] != c_s2[:-1])]
        n = np.bincount(np.cumsum(new_run) - 1)
        first = porder[new_run]
        src1 = order[:-2][tri][first]
        src2 = order[1:-1][tri][first]
        src3 = order[2:][tri][first]
        return pa.table({
            "tool_1": tool.take(pa.array(src1, pa.int64())),
            "tool_2": tool.take(pa.array(src2, pa.int64())),
            "tool_3": tool.take(pa.array(src3, pa.int64())),
            "n_trigrams": pa.array(n.astype(np.int64), pa.int64()),
        }).cast(TOOL_TRIGRAM_SCHEMA)

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "tool")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _tri, TOOL_TRIGRAM_SCHEMA)
    g = grouped_sums(parts, ["tool_1", "tool_2", "tool_3"],
                     ["n_trigrams"])
    return g.map_batches(
        lambda t: pa.table({"tool_1": t["tool_1"],
                            "tool_2": t["tool_2"],
                            "tool_3": t["tool_3"],
                            "n_trigrams": t["sum_n_trigrams"]}).cast(
            TOOL_TRIGRAM_SCHEMA),
        batch_format="pyarrow")


DUP_DEPTH_SCHEMA = pa.schema([
    ("is_dup", pa.bool_()),
    ("n_turns", pa.int64()),
    ("n_convs", pa.int64()),
])


def conv_dup_depth_matrix(sf_dir: str):
    """Dedup × structure interaction: conversations cell-counted by
    (is exact re-log — fingerprint shared with ≥ 2 convs — × turn
    count) — do duplicated conversations skew short (template
    greetings) or long (bulk re-ingests)? The ordered-turn-text md5
    fingerprint rides the same conv exchange as
    ``exact_dedup_conversations`` (one binary_join + one md5 column
    pass, here also emitting the turn count); fingerprint group sizes
    come from one fp-keyed `grouped_sums` and attach on the fp
    exchange join; ≤ 2 × depth-domain cells leave."""
    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..pipelines.docops import _md5_column
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups
    from ..stages.join import hash_join_exchange

    fp_schema = pa.schema([("fp", pa.string()),
                           ("n_turns", pa.int64())])

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "text": pc.fill_null(batch["text"].combine_chunks(), ""),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _fp(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return fp_schema.empty_table()
        cid = part["conv_id"].combine_chunks()
        cb = _to_bytes_array(cid)
        ti = np.asarray(part["turn_idx"], np.int64)
        order = np.lexsort((ti, cb))
        cb_s = cb[order]
        starts = np.flatnonzero(np.r_[True, cb_s[1:] != cb_s[:-1]])
        text_s = part["text"].combine_chunks().take(
            pa.array(order, pa.int64()))
        offsets = np.r_[starts, len(cb_s)].astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         text_s)
        joined = pc.binary_join(lists, "\x1f")
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        return pa.table({
            "fp": _md5_column(joined),
            "n_turns": pa.array(np.diff(offsets).astype(np.int64),
                                pa.int64()),
        }).cast(fp_schema)

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "text")
                        ).map_batches(_prep, batch_format="pyarrow")
    fps = exchange_map_groups(keyed, "conv_part",
                              resolve_num_partitions(_cfg), _fp,
                              fp_schema)
    sizes = grouped_sums(fps.select_columns(["fp"]), ["fp"], [],
                         count_as="k")
    joined = hash_join_exchange(
        fps, sizes, key="fp", left_cols=["n_turns"], right_cols=["k"],
        n_parts=resolve_num_partitions(_cfg))

    def _cells(batch: pa.Table) -> pa.Table:
        return pa.table({
            "is_dup": pc.greater_equal(batch["k"],
                                       pa.scalar(2, pa.int64())),
            "n_turns": batch["n_turns"],
        })

    g = grouped_sums(joined.map_batches(_cells, batch_format="pyarrow"),
                     ["is_dup", "n_turns"], [], count_as="n_convs")
    return g.map_batches(lambda t: t.cast(DUP_DEPTH_SCHEMA),
                         batch_format="pyarrow")


TOOL_RESP_SCHEMA = pa.schema([
    ("tool", pa.string()),
    ("n", pa.int64()),
    ("sum_c", pa.int64()),
    ("sum_c2", pa.int64()),
])


def tool_response_length_suffstats(sf_dir: str):
    """Tool verbosity profile: exact-integer (n, Σchars, Σchars²) of
    the turn IMMEDIATELY AFTER each tool-calling turn, per tool —
    which tools produce walls of output (token-budget planning for
    agent loops). Same composite-key adjacency as the echo /
    amplification audits; per-tool folds are one bytes-sort + reduceat
    and ≤ |tools| rows leave each partition."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "tool": pc.fill_null(batch["tool"].combine_chunks(), ""),
            "n_chars": pc.cast(pc.utf8_length(
                pc.fill_null(batch["text"].combine_chunks(), "")),
                pa.int64()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _resp(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return TOOL_RESP_SCHEMA.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        _, codes = np.unique(cid, return_inverse=True)
        tix = np.asarray(part["turn_idx"], np.int64)
        tcol = part["tool"].combine_chunks()
        tb = _to_bytes_array(tcol)
        nch = np.asarray(part["n_chars"], np.int64)
        mt = int(tix.max())
        if (int(codes.max()) + 1) >= 2 ** 62 // (mt + 2):
            raise ValueError("tool_response: composite key overflow")
        ck = codes.astype(np.int64) * (mt + 2) + tix
        o = np.argsort(ck, kind="stable")
        ck_s = ck[o]
        adj = ck_s[1:] - ck_s[:-1] == 1
        ai, bi = o[:-1][adj], o[1:][adj]
        m = tb[ai] != b""
        if not m.any():
            return TOOL_RESP_SCHEMA.empty_table()
        ai, c = ai[m], nch[bi[m]]
        tbm = tb[ai]
        po = np.argsort(tbm, kind="stable")
        tb_s, c_s = tbm[po], c[po]
        st = np.flatnonzero(np.r_[True, tb_s[1:] != tb_s[:-1]])
        n = np.diff(np.r_[st, len(tb_s)])
        return pa.table({
            "tool": tcol.take(pa.array(ai[po[st]], pa.int64())),
            "n": pa.array(n.astype(np.int64), pa.int64()),
            "sum_c": pa.array(np.add.reduceat(c_s, st), pa.int64()),
            "sum_c2": pa.array(np.add.reduceat(c_s * c_s, st),
                               pa.int64()),
        }).cast(TOOL_RESP_SCHEMA)

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "tool", "text")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _resp, TOOL_RESP_SCHEMA)
    g = grouped_sums(parts, ["tool"], ["n", "sum_c", "sum_c2"])
    return g.map_batches(
        lambda t: pa.table({"tool": t["tool"], "n": t["sum_n"],
                            "sum_c": t["sum_sum_c"],
                            "sum_c2": t["sum_sum_c2"]}).cast(
            TOOL_RESP_SCHEMA),
        batch_format="pyarrow")


TOOL_DENSITY_SCHEMA = pa.schema([
    ("density_decile", pa.int64()),
    ("n_convs", pa.int64()),
])


def conv_tool_density_histogram(sf_dir: str):
    """Agenticness histogram at conversation grain: the decile of
    turns that are tool calls (⌊10·tool-turns/turns⌋) per conv,
    histogrammed — what share of the corpus is chat vs agent loop.
    One conv exchange folds each conversation to its two counts; ≤ 11
    cells leave each partition."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([("density_decile", pa.int64()),
                             ("n", pa.int64())])

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        tool = pc.fill_null(batch["tool"].combine_chunks(), "")
        return pa.table({
            "conv_id": cid,
            "is_tool": pc.cast(pc.not_equal(tool, ""), pa.int64()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _density(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        it = np.asarray(part["is_tool"], np.int64)
        order = np.argsort(cid, kind="stable")
        c_s, it_s = cid[order], it[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        n = np.diff(np.r_[starts, len(c_s)])
        nt = np.add.reduceat(it_s, starts)
        dec = nt * 10 // n
        uk, cn = np.unique(dec, return_counts=True)
        return pa.table({
            "density_decile": pa.array(uk.astype(np.int64), pa.int64()),
            "n": pa.array(cn.astype(np.int64), pa.int64()),
        })

    keyed = _read_turns(sf_dir, ("conv_id", "tool")).map_batches(
        _prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _density, part_schema)
    g = grouped_sums(parts, ["density_decile"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"density_decile": t["density_decile"],
                            "n_convs": t["sum_n"]}).cast(
            TOOL_DENSITY_SCHEMA),
        batch_format="pyarrow")


FIRST_TOOL_SCHEMA = pa.schema([
    ("tool", pa.string()),
    ("n_convs", pa.int64()),
])


def conv_first_tool_counts(sf_dir: str):
    """Tool-adoption entry point: WHICH tool a conversation reaches for
    first (earliest tool-calling turn), counted per tool — the
    positional histogram's identity twin (which door agents enter
    through). One conv exchange over the tool turns only; each conv
    leaves as one row."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([("tool", pa.string()),
                             ("n", pa.int64())])

    def _prep(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["tool"]),
                       pc.not_equal(batch["tool"], ""))
        t = batch.filter(keep)
        cid = t["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "tool": t["tool"],
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _first(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        tcol = part["tool"].combine_chunks()
        order = np.lexsort((tix, cid))
        c_s = cid[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        first = order[starts]
        tb = _to_bytes_array(tcol)[first]
        po = np.argsort(tb, kind="stable")
        tb_s = tb[po]
        st = np.flatnonzero(np.r_[True, tb_s[1:] != tb_s[:-1]])
        n = np.diff(np.r_[st, len(tb_s)])
        return pa.table({
            "tool": tcol.take(pa.array(first[po[st]], pa.int64())),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        })

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "tool")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _first, part_schema)
    g = grouped_sums(parts, ["tool"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"tool": t["tool"],
                            "n_convs": t["sum_n"]}).cast(
            FIRST_TOOL_SCHEMA),
        batch_format="pyarrow")


TURN_INTEGRITY_SCHEMA = pa.schema([
    ("n_turns", pa.int64()),
    ("is_contiguous", pa.int64()),
    ("n_convs", pa.int64()),
])


def turn_index_integrity(sf_dir: str):
    """Referential-quality audit of ``turn_idx`` — the transcripts twin
    of ``order_linenumber_integrity``: per conversation, test whether
    its turn indexes are exactly the permutation 0..n-1 via the moment
    fingerprint (count = n, Σidx = n(n-1)/2, Σidx² = n(n-1)(2n-1)/6 —
    exact for permutations; the SQL twin shares the same fingerprint by
    construction), then histogram conversations by
    (n_turns, is_contiguous). The flagship's per-conv kernels assume a
    dense 0-based turn order; this is the cheap gate that proves it.
    Shape: one grouped_sums folds turns to per-conv moment rows (block
    partials pre-combine before the conv exchange), a map classifies,
    and a depth-domain-bounded cell fold finishes."""
    from ..stages.agg import grouped_sums

    def _mom(batch: pa.Table) -> pa.Table:
        ix = np.asarray(pc.cast(batch["turn_idx"], pa.int64()), np.int64)
        return pa.table({
            "conv_id": batch["conv_id"],
            "ix": pa.array(ix, pa.int64()),
            "ix2": pa.array(ix * ix, pa.int64()),
        })

    per_conv = grouped_sums(
        _read_turns(sf_dir, ("conv_id", "turn_idx")).map_batches(
            _mom, batch_format="pyarrow"),
        ["conv_id"], ["ix", "ix2"], count_as="n")

    def _classify(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n"], np.int64)
        s = np.asarray(batch["sum_ix"], np.int64)
        s2 = np.asarray(batch["sum_ix2"], np.int64)
        ok = (2 * s == n * (n - 1)) & \
            (6 * s2 == n * (n - 1) * (2 * n - 1))
        return pa.table({
            "n_turns": pa.array(n, pa.int64()),
            "is_contiguous": pa.array(ok.astype(np.int64), pa.int64()),
        })

    g = grouped_sums(per_conv.map_batches(_classify,
                                          batch_format="pyarrow"),
                     ["n_turns", "is_contiguous"], [],
                     count_as="n_convs")
    return g.map_batches(lambda t: t.cast(TURN_INTEGRITY_SCHEMA),
                         batch_format="pyarrow")


ROLE_RUN_SCHEMA = pa.schema([
    ("role", pa.string()),
    ("run_len", pa.int64()),
    ("n_runs", pa.int64()),
])


def role_run_length_histogram(sf_dir: str):
    """Run-length profile of consecutive same-role turns (turn_idx
    order): every maximal same-role stretch inside a conversation is
    one run; output counts runs per (role, run_len). The alternation
    detector a dialogue curation pass uses — healthy chat is mostly
    run_len 1, a fat assistant tail flags monologuing / self-replying
    agents, a fat user tail flags merged or re-sent messages. Same
    collapsed gaps-and-islands kernel as ``conv_tool_run_lengths``
    (one lexsort per partition; runs break where the conversation OR
    the role changes), minus the tool filter: every turn belongs to
    exactly one run, so Σ run_len·n_runs == total turns. Only
    (role, run_len, partial-count) cells cross the wire after the conv
    exchange."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _runs(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return ROLE_RUN_SCHEMA.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        role = part["role"].combine_chunks()
        rb = _to_bytes_array(role)
        order = np.lexsort((tix, cid))
        cid_s, rb_s = cid[order], rb[order]
        new_run = np.r_[True, (cid_s[1:] != cid_s[:-1])
                        | (rb_s[1:] != rb_s[:-1])]
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.r_[starts, len(cid_s)])
        run_role = rb_s[starts]
        o2 = np.lexsort((lens, run_role))
        rr_s, ln_s = run_role[o2], lens[o2]
        first = np.r_[True, (rr_s[1:] != rr_s[:-1])
                      | (ln_s[1:] != ln_s[:-1])]
        st = np.flatnonzero(first)
        cnt = np.diff(np.r_[st, len(rr_s)])
        pick = pa.array(order[starts[o2[st]]], pa.int64())
        return pa.table({
            "role": role.take(pick),
            "run_len": pa.array(ln_s[st].astype(np.int64), pa.int64()),
            "n_runs": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "role")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _runs, ROLE_RUN_SCHEMA)
    g = grouped_sums(parts, ["role", "run_len"], ["n_runs"])
    return g.map_batches(
        lambda t: pa.table({"role": t["role"],
                            "run_len": t["run_len"],
                            "n_runs": t["sum_n_runs"]}
                           ).cast(ROLE_RUN_SCHEMA),
        batch_format="pyarrow")


HOUR_ROLE_SCHEMA = pa.schema([
    ("hour", pa.int64()),
    ("role", pa.string()),
    ("n_turns", pa.int64()),
])


def turn_hour_role_matrix(sf_dir: str):
    """Hour-of-day × role traffic matrix over turns — the transcripts
    twin of ``events_weekday_hour_heatmap``: when do users write vs
    when do assistants answer (a skewed assistant share off-hours
    flags batch/replay traffic in a live-chat corpus). Map-only hour
    extraction off the int64 epoch view; ≤ 24 × |roles| cells
    shuffle."""
    from ..stages.agg import grouped_sums

    US_PER_HOUR = 3_600_000_000

    def _prep(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch["ts"], "datetime64[us]").astype(np.int64)
        if ts.size and ts.min() < 0:
            raise ValueError("pre-epoch timestamp: floor-div hour "
                             "extraction assumes ts >= 1970")
        return pa.table({
            "hour": pa.array((ts // US_PER_HOUR) % 24, pa.int64()),
            "role": batch["role"],
        })

    g = grouped_sums(
        _read_turns(sf_dir, ("ts", "role")).map_batches(
            _prep, batch_format="pyarrow"),
        ["hour", "role"], [], count_as="n_turns")
    return g.map_batches(lambda t: t.cast(HOUR_ROLE_SCHEMA),
                         batch_format="pyarrow")


CONV_SUFFSTATS_SCHEMA = pa.schema([
    ("n_convs", pa.int64()),
    ("sum_t", pa.int64()), ("sum_c", pa.int64()),
    ("sum_tc", pa.int64()), ("sum_t2", pa.int64()),
    ("sum_c2", pa.int64()),
])


def conv_chars_turns_suffstats(sf_dir: str):
    """Depth/verbosity covariance sufficient statistics across
    conversations: (n, Σt, Σc, Σtc, Σt², Σc²) with t = turn count and
    c = total chars per conversation — 'does conversation depth predict
    verbosity' as exact integers, so Pearson/OLS derive on the driver
    and partial/merge order can't perturb anything (the conversation
    twin of ``doc_length_token_suffstats``). Per-conv (t, c) rows fold
    on the conv exchange, products are guarded at 2³¹ so squares stay
    below 2⁶², then ONE global cell crosses the wire."""
    from ..stages.agg import grouped_sums

    def _chars(batch: pa.Table) -> pa.Table:
        c = np.asarray(pc.cast(pc.utf8_length(
            pc.fill_null(batch["text"].combine_chunks(), "")),
            pa.int64()), np.int64)
        return pa.table({
            "conv_id": batch["conv_id"],
            "c": pa.array(c, pa.int64()),
        })

    per_conv = grouped_sums(
        _read_turns(sf_dir, ("conv_id", "text")).map_batches(
            _chars, batch_format="pyarrow"),
        ["conv_id"], ["c"], count_as="t")

    def _prod(batch: pa.Table) -> pa.Table:
        t = np.asarray(batch["t"], np.int64)
        c = np.asarray(batch["sum_c"], np.int64)
        hi = max(int(t.max(initial=0)), int(c.max(initial=0)))
        if hi >= 2 ** 31:
            raise ValueError("conv_chars_turns_suffstats: per-conv "
                             "magnitude overflows the exact-int "
                             "square envelope")
        return pa.table({
            "all": pa.array(np.zeros(len(t), np.int64)),
            "t": pa.array(t, pa.int64()),
            "c": pa.array(c, pa.int64()),
            "tc": pa.array(t * c, pa.int64()),
            "t2": pa.array(t * t, pa.int64()),
            "c2": pa.array(c * c, pa.int64()),
        })

    g = grouped_sums(per_conv.map_batches(_prod, batch_format="pyarrow"),
                     ["all"], ["t", "c", "tc", "t2", "c2"],
                     count_as="n_convs")
    return g.map_batches(
        lambda t: pa.table({
            "n_convs": t["n_convs"],
            "sum_t": t["sum_t"], "sum_c": t["sum_c"],
            "sum_tc": t["sum_tc"], "sum_t2": t["sum_t2"],
            "sum_c2": t["sum_c2"],
        }).cast(CONV_SUFFSTATS_SCHEMA), batch_format="pyarrow")


TS_MONO_SCHEMA = pa.schema([
    ("is_monotonic", pa.int64()),
    ("n_convs", pa.int64()),
])


def conv_ts_monotonicity_audit(sf_dir: str):
    """Timestamp-order integrity: per conversation, is ``ts``
    non-decreasing when turns are replayed in ``turn_idx`` order? The
    sibling gate to ``turn_index_integrity`` — every windowed /
    latency / adjacency kernel in this module assumes replay order is
    wall-clock order; this is the two-row audit that proves it (a
    non-monotonic conversation flags clock skew between logging hosts
    or a re-logged merge). One conv exchange; inside a partition one
    lexsort + one vectorized adjacent-diff pass classifies every
    conversation."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "ts_us": pa.array(
                np.asarray(batch["ts"], "datetime64[us]").astype(
                    np.int64), pa.int64()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _mono(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return TS_MONO_SCHEMA.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        order = np.lexsort((tix, cid))
        cid_s, ts_s = cid[order], ts[order]
        same_conv = cid_s[1:] == cid_s[:-1]
        backwards = same_conv & (np.diff(ts_s) < 0)
        new_conv = np.r_[True, ~same_conv]
        conv_of = np.cumsum(new_conv) - 1
        n_convs = int(conv_of[-1]) + 1
        bad = np.zeros(n_convs, bool)
        bad[conv_of[1:][backwards]] = True
        ok = (~bad).astype(np.int64)
        si = np.argsort(ok, kind="stable")
        st = np.flatnonzero(np.r_[True, ok[si][1:] != ok[si][:-1]])
        cnt = np.diff(np.r_[st, n_convs])
        return pa.table({
            "is_monotonic": pa.array(ok[si][st], pa.int64()),
            "n_convs": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "ts")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _mono, TS_MONO_SCHEMA)
    g = grouped_sums(parts, ["is_monotonic"], ["n_convs"])
    return g.map_batches(
        lambda t: pa.table({"is_monotonic": t["is_monotonic"],
                            "n_convs": t["sum_n_convs"]}
                           ).cast(TS_MONO_SCHEMA),
        batch_format="pyarrow")


EMPTY_RATE_SCHEMA = pa.schema([
    ("role", pa.string()),
    ("n_turns", pa.int64()),
    ("n_empty", pa.int64()),
    ("empty_permille", pa.int64()),
])


def turn_empty_rate_by_role(sf_dir: str):
    """Empty-turn rate per role (exact integer permille): a turn is
    empty when its text is null or whitespace-only — the logging-bug
    detector a transcript ingest runs first (an assistant-side spike
    means tool results swallowed the reply; a user-side spike means
    multipart messages split wrong). Map-only trim + flag; ≤ |roles|
    cells shuffle, the permille divides on the cell."""
    from ..stages.agg import grouped_sums

    def _prep(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        # explicit charset, mirrored by the SQL twin's trim(..., chars):
        # Arrow's utf8_trim_whitespace strips Unicode spaces, DuckDB's
        # bare trim() strips only ' ' — pin both to {space, \t, \n, \r}
        empty = pc.equal(pc.utf8_trim(text, " \t\n\r"), "")
        return pa.table({
            "role": batch["role"],
            "e": pc.cast(empty, pa.int64()),
        })

    g = grouped_sums(
        _read_turns(sf_dir, ("role", "text")).map_batches(
            _prep, batch_format="pyarrow"),
        ["role"], ["e"], count_as="n_turns")

    def _share(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_turns"], np.int64)
        e = np.asarray(t["sum_e"], np.int64)
        return pa.table({
            "role": t["role"],
            "n_turns": pa.array(n, pa.int64()),
            "n_empty": pa.array(e, pa.int64()),
            "empty_permille": pa.array(1000 * e // n, pa.int64()),
        }).cast(EMPTY_RATE_SCHEMA)

    return g.map_batches(_share, batch_format="pyarrow")


def conv_last_tool_counts(sf_dir: str):
    """Tool-adoption EXIT point: which tool a conversation touches LAST
    (latest tool-calling turn), counted per tool — the closing-door twin
    of `conv_first_tool_counts`. Workflows that end on a verifier tool
    vs an editor tool have very different completion semantics, and the
    first/last pair bounds every tool-chain analysis between them. Same
    conv exchange over the tool turns only; each conv leaves as one
    row."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([("tool", pa.string()),
                             ("n", pa.int64())])

    def _prep(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["tool"]),
                       pc.not_equal(batch["tool"], ""))
        t = batch.filter(keep)
        cid = t["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "tool": t["tool"],
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _last(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        tcol = part["tool"].combine_chunks()
        order = np.lexsort((tix, cid))
        c_s = cid[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        ends = np.r_[starts[1:], len(c_s)] - 1
        last = order[ends]
        tb = _to_bytes_array(tcol)[last]
        po = np.argsort(tb, kind="stable")
        tb_s = tb[po]
        st = np.flatnonzero(np.r_[True, tb_s[1:] != tb_s[:-1]])
        n = np.diff(np.r_[st, len(tb_s)])
        return pa.table({
            "tool": tcol.take(pa.array(last[po[st]], pa.int64())),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        })

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "tool")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _last, part_schema)
    g = grouped_sums(parts, ["tool"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"tool": t["tool"],
                            "n_convs": t["sum_n"]}).cast(
            FIRST_TOOL_SCHEMA),
        batch_format="pyarrow")


TURN_CHAR_CLASS_SCHEMA = pa.schema([
    ("role", pa.string()), ("n_chars", pa.int64()),
    ("n_alpha", pa.int64()), ("n_digit", pa.int64()),
    ("n_space", pa.int64()), ("n_other", pa.int64()),
])


def turn_char_class_profile_by_role(sf_dir: str):
    """Character-class census per ROLE (alpha / digit / space / other,
    in characters): the transcripts twin of `char_class_profile_docs`
    — tool output whose digit mass spikes flags table dumps riding the
    context window; a user role whose alpha share collapses flags
    paste-bombs. Map-only Arrow kernels (`utf8_length`,
    `count_substring_regex`) with per-role partial sums inside each
    block, then one |roles|-row fold. All-integer output."""
    from ..stages.agg import grouped_sums

    part_schema = pa.schema([
        ("role", pa.string()), ("n_chars", pa.int64()),
        ("n_alpha", pa.int64()), ("n_digit", pa.int64()),
        ("n_space", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        role = batch["role"]
        if isinstance(role, pa.ChunkedArray):
            role = role.combine_chunks()
        enc = pc.fill_null(role, "").dictionary_encode()
        codes = np.asarray(enc.indices, np.int64)
        n_r = len(enc.dictionary)
        tot = np.asarray(pc.utf8_length(text), np.int64)
        al = np.asarray(pc.count_substring_regex(text, "[a-zA-Z]"),
                        np.int64)
        dg = np.asarray(pc.count_substring_regex(text, "[0-9]"),
                        np.int64)
        sp = np.asarray(pc.count_substring(text, " "), np.int64)

        def _fold(w):
            return pa.array(np.bincount(codes, weights=w,
                                        minlength=n_r).astype(np.int64),
                            pa.int64())

        return pa.table({
            "role": enc.dictionary,
            "n_chars": _fold(tot), "n_alpha": _fold(al),
            "n_digit": _fold(dg), "n_space": _fold(sp),
        }).cast(part_schema)

    agg = grouped_sums(
        _read_turns(sf_dir, ("role", "text")).map_batches(
            _partial, batch_format="pyarrow"),
        ["role"], ["n_chars", "n_alpha", "n_digit", "n_space"])

    def _final(t: pa.Table) -> pa.Table:
        tot = np.asarray(t["sum_n_chars"], np.int64)
        al = np.asarray(t["sum_n_alpha"], np.int64)
        dg = np.asarray(t["sum_n_digit"], np.int64)
        sp = np.asarray(t["sum_n_space"], np.int64)
        return pa.table({
            "role": t["role"],
            "n_chars": pa.array(tot, pa.int64()),
            "n_alpha": pa.array(al, pa.int64()),
            "n_digit": pa.array(dg, pa.int64()),
            "n_space": pa.array(sp, pa.int64()),
            "n_other": pa.array(tot - al - dg - sp, pa.int64()),
        }).cast(TURN_CHAR_CLASS_SCHEMA)

    return agg.map_batches(_final, batch_format="pyarrow")


TOOL_ENTRY_EXIT_SCHEMA = pa.schema([
    ("tool_first", pa.string()),
    ("tool_last", pa.string()),
    ("n_convs", pa.int64()),
])


def conv_tool_entry_exit_matrix(sf_dir: str):
    """(entry tool → exit tool) flow matrix: for every conversation
    that calls tools, the FIRST and LAST tool it touches, counted per
    (first, last) cell — the workflow-shape census that
    `conv_first_tool_counts` / `conv_last_tool_counts` only show as
    marginals (a heavy search→edit diagonal vs a search→search loop
    are different products). Both endpoints come out of ONE lexsort
    per conv partition; ≤ |tools|² cells fold."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([("tool_first", pa.string()),
                             ("tool_last", pa.string()),
                             ("n", pa.int64())])

    def _prep(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["tool"]),
                       pc.not_equal(batch["tool"], ""))
        t = batch.filter(keep)
        cid = t["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "tool": t["tool"],
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _pairs(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        tcol = part["tool"].combine_chunks()
        enc = tcol.dictionary_encode()
        code = np.asarray(enc.indices, np.int64)
        n_tools = len(enc.dictionary)
        order = np.lexsort((tix, cid))
        c_s = cid[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        ends = np.r_[starts[1:], len(c_s)] - 1
        first_c = code[order[starts]]
        last_c = code[order[ends]]
        key = first_c * n_tools + last_c
        uniq, n = np.unique(key, return_counts=True)
        d = enc.dictionary
        return pa.table({
            "tool_first": d.take(pa.array(uniq // n_tools, pa.int64())),
            "tool_last": d.take(pa.array(uniq % n_tools, pa.int64())),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        }).cast(part_schema)

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "tool")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _pairs, part_schema)
    g = grouped_sums(parts, ["tool_first", "tool_last"], ["n"])
    return g.map_batches(
        lambda t: pa.table({
            "tool_first": t["tool_first"], "tool_last": t["tool_last"],
            "n_convs": t["sum_n"],
        }).cast(TOOL_ENTRY_EXIT_SCHEMA), batch_format="pyarrow")


VERBOSITY_TREND_SCHEMA = pa.schema([
    ("trend", pa.string()),
    ("n_convs", pa.int64()),
])


def conv_verbosity_trend_census(sf_dir: str):
    """Within-conversation verbosity TREND census: per conversation the
    exact sign of cov(turn_idx, turn chars) — rising (turns get longer
    as the conversation deepens: context accretion), falling (opening
    dump then terse follow-ups), or flat — counted across the corpus.
    The covariance numerator n·Σxy − Σx·Σy is computed in exact int64
    per conversation on the conv exchange (inputs guarded at 2³¹ so
    products stay below 2⁶²); single-turn conversations are flat by
    identity. 3 cells leave."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([("trend", pa.string()),
                             ("n", pa.int64())])
    trends = np.array(["falling", "flat", "rising"], dtype=object)

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        c = np.asarray(pc.cast(pc.utf8_length(
            pc.fill_null(batch["text"].combine_chunks(), "")),
            pa.int64()), np.int64)
        x = np.asarray(pc.cast(batch["turn_idx"], pa.int64()), np.int64)
        if c.size and (c.max() >= 2**31 or x.max() >= 2**31):
            raise ValueError("turn chars/idx >= 2^31: exact int64 "
                             "covariance would overflow")
        return pa.table({
            "conv_id": cid,
            "x": pa.array(x, pa.int64()),
            "c": pa.array(c, pa.int64()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _trend(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        x = np.asarray(part["x"], np.int64)
        c = np.asarray(part["c"], np.int64)
        order = np.argsort(cid, kind="stable")
        c_s = cid[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        bounds = np.r_[starts, len(c_s)]
        n = np.diff(bounds)
        xs, cs, xc = x[order], c[order], x[order] * c[order]
        sx = np.add.reduceat(xs, starts)
        sc = np.add.reduceat(cs, starts)
        sxc = np.add.reduceat(xc, starts)
        num = n * sxc - sx * sc
        t = np.sign(num).astype(np.int64) + 1
        vals, cnt = np.unique(t, return_counts=True)
        return pa.table({
            "trend": pa.array(trends[vals], pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        }).cast(part_schema)

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "text")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _trend, part_schema)
    g = grouped_sums(parts, ["trend"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"trend": t["trend"],
                            "n_convs": t["sum_n"]}).cast(
            VERBOSITY_TREND_SCHEMA), batch_format="pyarrow")


TOOL_DECILE_SCHEMA = pa.schema([
    ("decile", pa.int64()),
    ("n_turns", pa.int64()),
    ("n_tool_turns", pa.int64()),
    ("tool_permille", pa.int64()),
])


def tool_share_by_position_decile(sf_dir: str):
    """WHERE in a conversation tools fire: every turn lands in a
    relative-position decile (10·turn_idx // conv_turns, exact integer
    division so both engines bucket identically) and each decile
    reports its tool-call permille — front-loaded tool use (retrieval
    then prose) vs tail-loaded (write-up then verification) is the
    product-level shape single-position histograms can't show. Conv
    sizes come from one conv exchange; the decile fold is ≤ 10
    cells."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([
        ("decile", pa.int64()), ("n", pa.int64()),
        ("n_tool", pa.int64())])

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        tool = pc.and_(pc.is_valid(batch["tool"]),
                       pc.not_equal(pc.fill_null(batch["tool"], ""),
                                    ""))
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "is_tool": pc.cast(tool, pa.int64()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _deciles(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        tl = np.asarray(part["is_tool"], np.int64)
        order = np.argsort(cid, kind="stable")
        c_s = cid[order]
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        sizes = np.diff(np.r_[starts, len(c_s)])
        n_per_row = np.repeat(sizes, sizes)
        dec = 10 * tix[order] // n_per_row
        key = dec * 2 + tl[order]
        cnt = np.bincount(key, minlength=20)
        n = cnt[0::2] + cnt[1::2]
        keep = n > 0
        return pa.table({
            "decile": pa.array(np.arange(10, dtype=np.int64)[keep]),
            "n": pa.array(n[keep].astype(np.int64), pa.int64()),
            "n_tool": pa.array(cnt[1::2][keep].astype(np.int64),
                               pa.int64()),
        }).cast(part_schema)

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "tool")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _deciles, part_schema)
    g = grouped_sums(parts, ["decile"], ["n", "n_tool"])

    def _share(t: pa.Table) -> pa.Table:
        n = np.asarray(t["sum_n"], np.int64)
        tn = np.asarray(t["sum_n_tool"], np.int64)
        return pa.table({
            "decile": t["decile"],
            "n_turns": pa.array(n, pa.int64()),
            "n_tool_turns": pa.array(tn, pa.int64()),
            "tool_permille": pa.array(1000 * tn // n, pa.int64()),
        }).cast(TOOL_DECILE_SCHEMA)

    return g.map_batches(_share, batch_format="pyarrow")


TOOL_INTERVAL_SCHEMA = pa.schema([
    ("interval", pa.int64()),
    ("n_pairs", pa.int64()),
])


def tool_interval_histogram(sf_dir: str):
    """Cadence BETWEEN tool calls: for consecutive tool-calling turns
    within a conversation, the turn-index gap (1 = back-to-back,
    k = k−1 prose turns between), contracted to an (interval →
    n_pairs) census — run-length ops see only the 1-gaps; this is the
    full inter-arrival spectrum of tool use. One lexsort per conv
    partition, adjacent diff within conv; ≤ max-depth cells fold."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([("interval", pa.int64()),
                             ("n", pa.int64())])

    def _prep(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch["tool"]),
                       pc.not_equal(batch["tool"], ""))
        t = batch.filter(keep)
        cid = t["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _intervals(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        tix = np.asarray(part["turn_idx"], np.int64)
        order = np.lexsort((tix, cid))
        c_s, t_s = cid[order], tix[order]
        same = np.r_[False, c_s[1:] == c_s[:-1]]
        gap = t_s - np.r_[np.int64(0), t_s[:-1]]
        iv = gap[same]
        vals, n = np.unique(iv, return_counts=True)
        return pa.table({
            "interval": pa.array(vals.astype(np.int64), pa.int64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        }).cast(part_schema)

    keyed = _read_turns(sf_dir, ("conv_id", "turn_idx", "tool")
                        ).map_batches(_prep, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "conv_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _intervals, part_schema)
    g = grouped_sums(parts, ["interval"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"interval": t["interval"],
                            "n_pairs": t["sum_n"]}).cast(
            TOOL_INTERVAL_SCHEMA), batch_format="pyarrow")
