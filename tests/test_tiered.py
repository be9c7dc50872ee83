"""Tiered dedup cascade — pipeline output vs an independent serial
cascade oracle (hashlib md5 + brute-force pairwise fingerprint compare +
driver union-find), plus structural invariants."""
from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data

from sourmash_ray.config import DEFAULT_CONFIG
from sourmash_ray.pipelines.docops import DocSketcher, SimHasher
from sourmash_ray.pipelines.tiered import (TIER_SCHEMA, tier_report_docs,
                                           tiered_dedup_docs)

_WS = re.compile(r"[ \t\n\r\f\v]+")


def _mk_docs(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def _uf_min(members, edges):
    """Union-find; label = min member id of each component."""
    parent = {m: m for m in members}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {m: find(m) for m in members}


def _popcount(x: int) -> int:
    return bin(x).count("1")


def _serial_cascade(ids, texts, cfg=DEFAULT_CONFIG, max_hamming=3):
    """The oracle: run the same three tiers serially on the driver with
    independent/primitive implementations (md5 via hashlib; simhash and
    sketches via the engine's pure per-batch kernels but BRUTE-FORCE
    all-pairs candidates instead of banding/LSH; union-find per tier)."""
    label = {}
    rep = {}
    # tier 0: exact md5 of ws-normalized text (independent normalization)
    seen: dict[str, int] = {}
    surv = []
    for i in sorted(range(len(ids)), key=lambda j: ids[j]):
        norm = _WS.sub(" ", texts[i].lower()).strip()
        m = hashlib.md5(norm.encode()).hexdigest()
        if m in seen:
            label[ids[i]] = "exact"
            rep[ids[i]] = seen[m]
        else:
            seen[m] = ids[i]
            surv.append(i)
    # tier 1: brute-force simhash hamming <= max_hamming over survivors
    batch = pa.table({"doc_id": pa.array([ids[i] for i in surv], pa.int64()),
                      "text": pa.array([texts[i] for i in surv])})
    sh = np.asarray(SimHasher(cfg)(batch)["simhash"], np.uint64)
    sids = [ids[i] for i in surv]
    edges = [(min(sids[x], sids[y]), max(sids[x], sids[y]))
             for x in range(len(sids)) for y in range(x + 1, len(sids))
             if _popcount(int(sh[x]) ^ int(sh[y])) <= max_hamming]
    comp = _uf_min(sids, edges)
    surv2 = []
    for i in surv:
        if comp[ids[i]] != ids[i]:
            label[ids[i]] = "simhash"
            rep[ids[i]] = comp[ids[i]]
        else:
            surv2.append(i)
    # tier 2: brute-force verified-jaccard pairs over simhash survivors
    batch2 = pa.table({"doc_id": pa.array([ids[i] for i in surv2],
                                          pa.int64()),
                       "text": pa.array([texts[i] for i in surv2])})
    sk = DocSketcher(cfg)(batch2)
    mins = [set(np.asarray(m, np.uint64).tolist())
            for m in sk["mins"].to_pylist()]
    sids2 = [ids[i] for i in surv2]
    thr = cfg.verify_threshold
    edges2 = []
    for x in range(len(sids2)):
        for y in range(x + 1, len(sids2)):
            u = len(mins[x] | mins[y])
            if u and len(mins[x] & mins[y]) / u >= thr:
                edges2.append((min(sids2[x], sids2[y]),
                               max(sids2[x], sids2[y])))
    comp2 = _uf_min(sids2, edges2)
    for i in surv2:
        if comp2[ids[i]] != ids[i]:
            label[ids[i]] = "minhash"
            rep[ids[i]] = comp2[ids[i]]
        else:
            label[ids[i]] = "kept"
            rep[ids[i]] = ids[i]
    return {i: (label[i], rep[i]) for i in ids}


_BASE = ("the quick brown fox jumps over the lazy dog while the rain in "
         "spain falls mainly on the plain and stays there quietly all "
         "through the long afternoon until the sun finally sets behind "
         "the western hills")
_OTHER = ("import numpy as np and compute the singular value "
          "decomposition of the design matrix before fitting the ridge "
          "regression model with cross validated regularization strength")


def test_tiered_cascade_hand_corpus(ray_session):
    """Hand-built corpus covering all four labels; pipeline == serial
    oracle exactly (labels and reps)."""
    texts = [
        _BASE,                                   # 0 kept (rep of exacts)
        _BASE.replace(" ", "  "),                # 1 exact dup of 0
        "  " + _BASE + "\n",                     # 2 exact dup of 0
        _BASE + " with one small trailing change here",  # 3 near dup
        _BASE.replace("quietly", "loudly"),      # 4 near dup
        _OTHER,                                  # 5 kept
        _OTHER,                                  # 6 exact dup of 5
        "completely different tiny text unlike anything else with "
        "enough length to clear the shingle window threshold easily",  # 7
    ]
    docs = _mk_docs(texts)
    got = {r["doc_id"]: (r["tier"], r["rep_doc_id"])
           for r in tiered_dedup_docs(docs).take_all()}
    want = _serial_cascade(list(range(len(texts))), texts)
    assert got == want
    # the constructed exact dups really land in tier 'exact'
    assert got[1] == ("exact", 0) and got[2] == ("exact", 0)
    assert got[6] == ("exact", 5)
    assert got[0] == ("kept", 0) and got[7][0] == "kept"
    # near dups were eliminated by a NEAR tier (simhash or minhash)
    assert got[3][0] in ("simhash", "minhash") and got[3][1] == 0
    assert got[4][0] in ("simhash", "minhash") and got[4][1] == 0


def test_tiered_cascade_testdata_sf0001(ray_session):
    """Composition equality on the sf0.001 documents table: the
    distributed cascade (exchanges, banding, LSH) matches the serial
    brute-force cascade doc for doc."""
    import pyarrow.parquet as pq

    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
    ids = tbl["doc_id"].to_pylist()
    texts = tbl["text"].to_pylist()
    want = _serial_cascade(ids, [t or "" for t in texts])
    got = {r["doc_id"]: (r["tier"], r["rep_doc_id"])
           for r in tiered_dedup_docs(
               "/root/testdata/sf0.001").take_all()}
    assert got == want


def test_tiered_invariants_and_report(ray_session):
    """One row per doc; kept rows self-rep; eliminated reps strictly
    smaller; report counts match the label rows."""
    texts = [_BASE, _BASE, _BASE + " x", _OTHER, _OTHER + " changed a bit",
             "short but long enough unique filler text about gardens and "
             "rivers flowing gently to the sea under a pale morning sky"]
    ids = [10, 3, 7, 20, 15, 4]
    docs = _mk_docs(texts, ids)
    rows = tiered_dedup_docs(docs).take_all()
    assert sorted(r["doc_id"] for r in rows) == sorted(ids)
    for r in rows:
        if r["tier"] == "kept":
            assert r["rep_doc_id"] == r["doc_id"]
        else:
            assert r["rep_doc_id"] < r["doc_id"]
    rep = {r["tier"]: r["n_docs"]
           for r in tier_report_docs(docs).take_all()}
    from collections import Counter

    assert rep == dict(Counter(r["tier"] for r in rows))


def test_tiered_empty_input(ray_session):
    docs = ray.data.from_arrow(TIER_SCHEMA.empty_table().select([])
                               .add_column(0, "doc_id",
                                           pa.array([], pa.int64()))
                               .add_column(1, "text",
                                           pa.array([], pa.string())))
    out = tiered_dedup_docs(docs)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "tier", "rep_doc_id"}


def _serial_transcript_cascade(sigs_rows, jthr, cthr):
    """Serial oracle over the engine's signature table: md5 grouping for
    tier 'exact', brute-force all-pairs set math over the retained mins
    for 'jaccard' and 'containment', union-find per tier."""
    ids = [r["conv_id"] for r in sigs_rows]
    md5 = {r["conv_id"]: r["md5"] for r in sigs_rows}
    mins = {r["conv_id"]: set(np.asarray(r["mins"], np.uint64).tolist())
            for r in sigs_rows}
    label, rep = {}, {}
    seen: dict[str, str] = {}
    surv = []
    for c in sorted(ids):
        if md5[c] in seen:
            label[c], rep[c] = "exact", seen[md5[c]]
        else:
            seen[md5[c]] = c
            surv.append(c)

    def _near(pool, score_fn, thr):
        edges = []
        for i in range(len(pool)):
            for j in range(i + 1, len(pool)):
                a, b = pool[i], pool[j]
                if score_fn(mins[a], mins[b]) >= thr:
                    edges.append((min(a, b), max(a, b)))
        return _uf_min(pool, edges)

    def _jac(x, y):
        u = len(x | y)
        return len(x & y) / u if u else 0.0

    def _maxc(x, y):
        c = len(x & y)
        return max(c / len(x) if x else 0.0, c / len(y) if y else 0.0)

    comp = _near(surv, _jac, jthr)
    surv2 = []
    for c in surv:
        if comp[c] != c:
            label[c], rep[c] = "jaccard", comp[c]
        else:
            surv2.append(c)
    comp2 = _near(surv2, _maxc, cthr)
    for c in surv2:
        if comp2[c] != c:
            label[c], rep[c] = "containment", comp2[c]
        else:
            label[c], rep[c] = "kept", c
    return {c: (label[c], rep[c]) for c in ids}


def test_tiered_transcripts_vs_serial_oracle(ray_session):
    """Distributed transcripts cascade == serial cascade over the same
    signature table (exchange/banding/survivor-filter composition)."""
    from sourmash_ray.pipelines.tiered import tiered_dedup_transcripts
    from sourmash_ray.sources.transcripts import read_transcripts
    from sourmash_ray.stages.sketch import sketch_transcripts

    sf = "/root/testdata/sf0.001"
    sigs_rows = sketch_transcripts(read_transcripts(sf),
                                   DEFAULT_CONFIG).take_all()
    want = _serial_transcript_cascade(
        sigs_rows, DEFAULT_CONFIG.verify_threshold, 0.9)
    got = {r["conv_id"]: (r["tier"], r["rep_conv_id"])
           for r in tiered_dedup_transcripts(sf).take_all()}
    assert got == want
    assert set(v[0] for v in got.values()) >= {"exact", "jaccard", "kept"}


def test_tiered_transcripts_report_and_invariants(ray_session):
    from sourmash_ray.pipelines.tiered import (tier_report_transcripts,
                                               tiered_dedup_transcripts)

    sf = "/root/testdata/sf0.001"
    rows = tiered_dedup_transcripts(sf).take_all()
    assert len(rows) == len({r["conv_id"] for r in rows})
    for r in rows:
        if r["tier"] == "kept":
            assert r["rep_conv_id"] == r["conv_id"]
        else:
            assert r["rep_conv_id"] < r["conv_id"]
    from collections import Counter

    rep = {r["tier"]: r["n_convs"]
           for r in tier_report_transcripts(sf).take_all()}
    assert rep == dict(Counter(r["tier"] for r in rows))


def test_residual_dup_rate(ray_session):
    """Auditor reports 0 residual near-dups among the cascade's kept
    docs at the cascade's own threshold, and DOES find the planted
    below-threshold pair when audited at a looser threshold (positive
    control: the sample path and the pair kernel actually fire)."""
    from sourmash_ray.pipelines.tiered import residual_dup_rate

    row = residual_dup_rate("/root/testdata/sf0.001",
                            n_sample=64).take_all()[0]
    assert row["n_dup_pairs"] == 0 and row["dup_rate_ppm"] == 0
    assert row["n_sampled"] == 64
    assert row["n_pairs_checked"] == 64 * 63 // 2

    # planted pair: ~half-shared text → sketch jaccard in (0.2, 0.5):
    # survives the 0.5-threshold cascade, caught by a 0.2 audit
    half = ("the shared first half of this document talks at length "
            "about rivers and mountains and the slow turning of the "
            "seasons across the wide northern valley floor")
    t_a = half + " while the unique tail of document a describes a "
    t_a += "completely different topic namely the maintenance of old "
    t_a += "sailing boats in brackish harbor water"
    t_b = half + " whereas document b instead wanders into a long "
    t_b += "discussion of sourdough baking hydration ratios and the "
    t_b += "care of a decades old starter culture"
    sk = DocSketcher(DEFAULT_CONFIG)(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([t_a, t_b])}))
    m = [set(np.asarray(x, np.uint64).tolist())
         for x in sk["mins"].to_pylist()]
    j = len(m[0] & m[1]) / len(m[0] | m[1])
    assert 0.2 < j < DEFAULT_CONFIG.verify_threshold, j
    docs = _mk_docs([t_a, t_b])
    strict = residual_dup_rate(docs, n_sample=8).take_all()[0]
    assert strict["n_dup_pairs"] == 0      # cascade kept both, rightly
    loose = residual_dup_rate(docs, n_sample=8,
                              threshold=0.2).take_all()[0]
    assert loose["n_dup_pairs"] == 1
    assert loose["dup_rate_ppm"] == 1_000_000


def test_fused_cascade_sketcher_equals_separate_kernels(ray_session):
    """_CascadeDocSketcher's one-pass columns are exactly what the three
    standalone kernels produce (md5 of ws-norm text, SimHasher, and
    DocSketcher mins/md5/perms) — the fusion must never drift from the
    kernels it amortizes."""
    import pyarrow as pa

    from sourmash_ray.config import DEFAULT_CONFIG
    from sourmash_ray.pipelines.docops import (DocSketcher, SimHasher,
                                               _normalize_md5_batch)
    from sourmash_ray.pipelines.tiered import _CascadeDocSketcher

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["hello world hello", "HELLO  world hello",
                          None, "short"], pa.string()),
    })
    fused = _CascadeDocSketcher(DEFAULT_CONFIG)(batch)
    assert fused["text_md5"].to_pylist() == \
        _normalize_md5_batch(batch)["text_md5"].to_pylist()
    assert fused["simhash"].to_pylist() == \
        SimHasher(DEFAULT_CONFIG)(batch)["simhash"].to_pylist()
    sig = DocSketcher(DEFAULT_CONFIG)(batch)
    for col in ("conv_id", "mins", "md5", "perms"):
        assert fused[col].to_pylist() == sig[col].to_pylist(), col


def _serial_embedding_cascade(ids, mat, hi=0.45, lo=0.35):
    """Serial oracle for the embeddings cascade: quantize → exact-bytes
    groups → brute-force exact-integer cosine → hi-tier components →
    lo-tier components among hi survivors (same arithmetic as the
    engine's CosineScorer: exact int dots, sqrt of exact int norms)."""
    q = np.round(np.asarray(mat, np.float64) * 1e4)
    label, rep = {}, {}
    seen: dict[bytes, int] = {}
    surv = []
    for j in sorted(range(len(ids)), key=lambda j: ids[j]):
        key = q[j].astype(np.int64).tobytes()
        if key in seen:
            label[ids[j]] = "exact"
            rep[ids[j]] = seen[key]
        else:
            seen[key] = ids[j]
            surv.append(j)
    qs = q[surv]
    sids = [ids[j] for j in surv]
    norms = np.linalg.norm(qs, axis=1)
    norms[norms == 0] = 1.0
    cos = (qs @ qs.T) / (norms[:, None] * norms[None, :])
    iu, ju = np.triu_indices(len(sids), k=1)
    keep = cos[iu, ju] >= lo                   # the scorer's raw filter
    pair_cos = np.round(cos[iu, ju][keep], 6)  # the emitted column
    pe = list(zip(iu[keep], ju[keep], pair_cos))
    hi_edges = [(min(sids[x], sids[y]), max(sids[x], sids[y]))
                for x, y, c in pe if c >= hi]
    comp = _uf_min(sids, hi_edges)
    surv2 = [i for i in sids if comp[i] == i]
    for i in sids:
        if comp[i] != i:
            label[i] = "cosine_hi"
            rep[i] = comp[i]
    s2 = set(surv2)
    lo_edges = [(min(sids[x], sids[y]), max(sids[x], sids[y]))
                for x, y, c in pe
                if c < hi and sids[x] in s2 and sids[y] in s2]
    comp2 = _uf_min(surv2, lo_edges)
    for i in surv2:
        if comp2[i] != i:
            label[i] = "cosine_lo"
            rep[i] = comp2[i]
        else:
            label[i] = "kept"
            rep[i] = i
    return {i: (label[i], rep[i]) for i in ids}


def test_tiered_embeddings_hand_corpus(ray_session):
    """All four labels on a constructed vector set; pipeline == serial
    oracle exactly."""
    from sourmash_ray.pipelines.tiered import tiered_dedup_embeddings

    rng = np.random.default_rng(7)
    base = rng.standard_normal(64)
    v2 = rng.standard_normal(64)
    v4 = rng.standard_normal(64)
    u = rng.standard_normal(64)
    u -= (u @ v4) / (v4 @ v4) * v4
    v5 = (0.40 * v4 / np.linalg.norm(v4)
          + np.sqrt(1 - 0.16) * u / np.linalg.norm(u))
    vecs = [base, base.copy(),                        # exact pair
            v2, v2 + 0.02 * rng.standard_normal(64),  # cosine_hi pair
            v4, v5,                                    # cosine_lo pair
            rng.standard_normal(64)]                   # isolated
    f32 = np.asarray(vecs, np.float32)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in f32],
                              pa.list_(pa.float32())),
    }))
    got = {r["vec_id"]: (r["tier"], r["rep_vec_id"])
           for r in tiered_dedup_embeddings(
               ds, n_bits=2, n_tables=32).take_all()}
    want = _serial_embedding_cascade(list(range(len(vecs))),
                                     np.asarray(f32, np.float64))
    assert got == want
    assert got[1] == ("exact", 0) and got[3] == ("cosine_hi", 2)
    assert got[5] == ("cosine_lo", 4) and got[6] == ("kept", 6)


def test_tiered_embeddings_testdata_sf0001(ray_session):
    """Distributed cascade == serial brute-force cascade on the real
    sf0.001 embeddings table (banding at n_bits=2/n_tables=32, where
    per-pair recall at cos 0.35 is ~1-3e-7 — deterministic given the
    seed; a miss would fail loudly here)."""
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.tiered import (tier_report_embeddings,
                                               tiered_dedup_embeddings)

    tbl = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_pylist()
    mat = np.asarray(tbl["embedding"].combine_chunks().flatten(),
                     np.float64).reshape(len(ids), -1)
    want = _serial_embedding_cascade(ids, mat)
    tiers = tiered_dedup_embeddings("/root/testdata/sf0.001",
                                    n_bits=2, n_tables=32).materialize()
    got = {r["vec_id"]: (r["tier"], r["rep_vec_id"])
           for r in tiers.take_all()}
    assert got == want
    # report counts match the label rows
    rep = {r["tier"]: r["n_vecs"]
           for r in tier_report_embeddings(
               "/root/testdata/sf0.001", tiers=tiers).take_all()}
    from collections import Counter

    assert rep == dict(Counter(v[0] for v in want.values()))


def test_tier_agreement_and_residual_cosine(ray_session):
    """Cross-modal agreement matrix is a true contingency table of the
    two cascades (cells == brute-force pandas crosstab; total == corpus
    size) and the residual-cosine audit of the cascade's kept set is
    clean at its own threshold when sampling covers every kept vector."""
    from sourmash_ray.pipelines.tiered import (residual_cosine_rate,
                                               tier_agreement_matrix,
                                               tiered_dedup_docs,
                                               tiered_dedup_embeddings)

    SF = "/root/testdata/sf0.001"
    dt = tiered_dedup_docs(SF).materialize()
    et = tiered_dedup_embeddings(SF).materialize()
    got = {(r["doc_tier"], r["emb_tier"]): r["n_items"]
           for r in tier_agreement_matrix(
               SF, doc_tiers=dt, emb_tiers=et).take_all()}
    dmap = {r["doc_id"]: r["tier"] for r in dt.take_all()}
    emap = {r["vec_id"]: r["tier"] for r in et.take_all()}
    from collections import Counter

    want = Counter((dmap[i], emap[i]) for i in dmap if i in emap)
    assert got == dict(want)
    assert sum(got.values()) == len(emap)

    audit = residual_cosine_rate(SF, n_sample=10 ** 9,
                                 tiers=et).take_all()[0]
    assert audit["n_sampled"] == audit["n_kept"]
    # the audit's dup count == an independent brute-force count over the
    # kept set (default-banding cascades CAN leave residuals — finding
    # them is the audit's job, so assert agreement, not zero)
    import pyarrow.parquet as pq

    kept_ids = sorted(r["vec_id"] for r in et.take_all()
                      if r["tier"] == "kept")
    tbl = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    emap2 = {v: e for v, e in zip(tbl["vec_id"].to_pylist(),
                                  tbl["embedding"].to_pylist())}
    q = np.round(np.array([emap2[i] for i in kept_ids], np.float64)
                 * 1e4)
    norms = np.linalg.norm(q, axis=1)
    norms[norms == 0] = 1.0
    cos = (q @ q.T) / (norms[:, None] * norms[None, :])
    iu, ju = np.triu_indices(len(kept_ids), k=1)
    want_dup = int((cos[iu, ju] >= 0.35).sum())
    assert audit["n_dup_pairs"] == want_dup
    assert audit["n_pairs_checked"] == len(iu)
    # and with recall-saturating banding the cascade leaves NO residual
    et2 = tiered_dedup_embeddings(SF, n_bits=2, n_tables=32).materialize()
    audit2 = residual_cosine_rate(SF, n_sample=10 ** 9,
                                  tiers=et2).take_all()[0]
    assert audit2["n_dup_pairs"] == 0 and audit2["dup_rate_ppm"] == 0


def test_keyed_from_blob_honors_array_offset(ray_session):
    """Band keys from a SLICED blob column equal keys from the same rows
    in an offset-0 column (the Arrow data buffer of a slice does not
    start at byte 0 — regression for the offsets-buffer handling)."""
    from sourmash_ray.pipelines.tiered import (_emb_sketch_batch,
                                               _keyed_from_blob)

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((10, 16))
    tbl = pa.table({
        "vec_id": pa.array(range(10), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    sk = _emb_sketch_batch(tbl)
    proj = rng.standard_normal((16, 8))
    fn = _keyed_from_blob(proj, 4, 2, 64)
    whole = fn(sk).to_pydict()
    sliced = fn(sk.slice(4, 5)).to_pydict()
    base = {(c, k): b for c, k, b in zip(whole["conv_id"],
                                         whole["band_key"],
                                         whole["band_part"])}
    for c, k, b in zip(sliced["conv_id"], sliced["band_key"],
                       sliced["band_part"]):
        assert (c, k) in base and base[(c, k)] == b
    assert len(sliced["conv_id"]) == 10  # 5 rows × 2 tables
