"""Deterministic synthetic transcripts corpus (the north-rule input table).

Schema per BASELINE.json input_hint / FIXTURES.md §1:
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]``.

This plays the role of the reference's checked-in known-answer corpora
(``/root/reference/tests/test-data/47.fa.sig`` etc., used by
``/root/reference/tests/test_compare.py:29-60``): a seeded generator plants
exact duplicates, near duplicates at several edit rates, prefix-containment
pairs, a boilerplate hot-key case, and unrelated negatives, so recall can be
measured against a brute-force oracle with the same sketch config.

Everything is a pure function of (n_base, seed); no wall clock, no
external data. Tables are cached as hash-bucketed Parquet directories under
/tmp so Ray reads them with normal file parallelism.
"""

from __future__ import annotations

import os
import string

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
ROLES = ("user", "assistant")
TOOLS = ("", "", "", "search", "python", "browser")
BOILERPLATE = (
    "hello thank you for contacting support today how can i help you "
    "with your account or order please provide your details"
)

CACHE_ROOT = "/tmp/sourmash_ray_cache"


def _vocab(rng: np.random.Generator, n: int = 2000) -> list[str]:
    letters = np.array(list(string.ascii_lowercase))
    words = []
    for _ in range(n):
        ln = int(rng.integers(3, 10))
        words.append("".join(rng.choice(letters, size=ln)))
    return words


def _turn_text(rng: np.random.Generator, vocab: list[str]) -> str:
    n_words = int(rng.integers(8, 60))
    # zipf-ish skew toward the head of the vocab
    idx = (rng.pareto(1.3, size=n_words) * 40).astype(int) % len(vocab)
    return " ".join(vocab[i] for i in idx)


def _edit_text(rng: np.random.Generator, text: str, p: float,
               vocab: list[str]) -> str:
    words = text.split()
    n_edit = max(1, int(len(words) * p))
    pos = rng.choice(len(words), size=min(n_edit, len(words)), replace=False)
    for j in pos:
        words[j] = vocab[int(rng.integers(0, len(vocab)))]
    return " ".join(words)


def synth_transcripts(n_base: int, seed: int = SEED) -> pa.Table:
    """Build the corpus: ``n_base`` base conversations plus planted clones
    (~35% extra rows of conv). Deterministic for (n_base, seed)."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []

    def emit(conv_id: str, turns: list[tuple[str, str, str]], t0: int):
        for i, (role, text, tool) in enumerate(turns):
            conv_ids.append(conv_id)
            turn_idxs.append(i)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(t0 + i * 1_000_000)

    base_turns: dict[str, list[tuple[str, str, str]]] = {}
    for b in range(n_base):
        cid = f"c{b:07d}"
        n_turns = int(rng.integers(3, 17))
        turns = []
        boiler = rng.random() < 0.20
        for i in range(n_turns):
            role = ROLES[i % 2]
            tool = TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "assistant" else ""
            if i == 0 and boiler:
                text = BOILERPLATE
            else:
                text = _turn_text(rng, vocab)
            turns.append((role, text, tool))
        base_turns[cid] = turns
        emit(cid, turns, b * 100_000_000)

    # planted relationships (deterministic choice of bases)
    base_ids = sorted(base_turns)
    n_exact = max(1, n_base // 10)
    n_near = max(1, n_base // 10)
    n_prefix = max(1, n_base // 20)

    for j in range(n_exact):
        src = base_ids[int(rng.integers(0, n_base))]
        emit(f"{src}_xd{j}", base_turns[src], (n_base + j) * 100_000_000)

    edit_ps = (0.01, 0.05, 0.10)
    for j in range(n_near):
        src = base_ids[int(rng.integers(0, n_base))]
        p = edit_ps[j % 3]
        turns = [(r, _edit_text(rng, t, p, vocab), tl)
                 for (r, t, tl) in base_turns[src]]
        emit(f"{src}_nd{j}", turns, (2 * n_base + j) * 100_000_000)

    for j in range(n_prefix):
        src = base_ids[int(rng.integers(0, n_base))]
        turns = base_turns[src]
        if len(turns) > 3:
            emit(f"{src}_pf{j}", turns[: max(2, len(turns) * 2 // 3)],
                 (3 * n_base + j) * 100_000_000)

    return pa.table({
        "conv_id": pa.array(conv_ids, pa.string()),
        "turn_idx": pa.array(turn_idxs, pa.int32()),
        "role": pa.array(roles, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tools, pa.string()),
        "ts": pa.array(tss, pa.timestamp("us")),
    })


# ---------------------------------------------------------------------------
# sf-keyed cache
# ---------------------------------------------------------------------------

_SF_TO_NBASE = {"0.001": 100, "0.01": 1000, "0.1": 10000}


def sf_of_dir(sf_dir: str) -> str:
    """Extract '0.01' from '/root/testdata/sf0.01'."""
    name = os.path.basename(os.path.normpath(sf_dir))
    if name.startswith("sf"):
        return name[2:]
    raise ValueError(f"cannot parse scale factor from {sf_dir!r}")


def n_base_for_sf(sf: str) -> int:
    if sf in _SF_TO_NBASE:
        return _SF_TO_NBASE[sf]
    return max(10, int(float(sf) * 100_000))


def transcripts_path(sf_dir: str, seed: int = SEED) -> str:
    """Materialize (once) and return the cached Parquet directory for the
    transcripts table at this scale. Written hash-bucketed into 8 files so
    `ray.data.read_parquet` gets natural read parallelism; idempotent via
    an atomic rename, so concurrent callers are safe."""
    sf = sf_of_dir(sf_dir)
    out = os.path.join(CACHE_ROOT, f"transcripts_sf{sf}_seed{seed}")
    if os.path.isdir(out):
        return out
    tbl = synth_transcripts(n_base_for_sf(sf), seed)
    tmp = out + f".tmp{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    # bucket by conv_id hash so conversations never straddle files
    import zlib
    buckets = np.array(
        [zlib.crc32(c.encode()) % 8 for c in tbl["conv_id"].to_pylist()],
        dtype=np.int64,
    )
    for b in range(8):
        sub = tbl.filter(pa.array(buckets == b))
        pq.write_table(sub, os.path.join(tmp, f"part-{b:02d}.parquet"))
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)  # another writer won
    return out


def read_transcripts(sf_dir: str, seed: int = SEED,
                     override_num_blocks: int | None = None):
    """The engine's source stage: transcripts table as a Ray Dataset.

    Block count defaults to 2× the cluster CPUs: every downstream sort
    shuffles blocks×partitions objects, so hundreds of small blocks turn
    the all-to-all into tens of thousands of tiny object transfers."""
    import ray
    import ray.data

    if override_num_blocks is None:
        try:
            override_num_blocks = max(8, 2 * int(
                ray.cluster_resources().get("CPU", 8)))
        except Exception:
            override_num_blocks = 16
    from .tables import read_parquet_clean

    return read_parquet_clean(transcripts_path(sf_dir, seed),
                              override_num_blocks=override_num_blocks)
