"""search / prefetch / gather / compare / sig-ops vs pure-Python oracles —
the protocol-conformance idea of the reference's test_index_protocol.py
(same answers from every backend)."""

from __future__ import annotations

import numpy as np
import pytest

from sourmash_ray.config import EngineConfig, LSHParams
from sourmash_ray.functions.oracle import jaccard_mins, sketch_table
from sourmash_ray.functions.sketch import SketchParams
from sourmash_ray.sources.transcripts import synth_transcripts

PARAMS = SketchParams(ksize=12, scaled=4, num=0, track_abundance=True)
CFG = EngineConfig(sketch=PARAMS, lsh=LSHParams(num_perm=12, bands=4, rows=3))


@pytest.fixture(scope="module")
def corpus():
    return synth_transcripts(25, seed=17)


@pytest.fixture(scope="module")
def sigs(ray_session, corpus):
    import ray.data

    from sourmash_ray.stages.sketch import sketch_transcripts

    return sketch_transcripts(ray.data.from_arrow(corpus), CFG).materialize()


@pytest.fixture(scope="module")
def oracle_sketches(corpus):
    return sketch_table(corpus, PARAMS)


def test_search_matches_oracle(sigs, oracle_sketches):
    from sourmash_ray.pipelines.sourmash_parity import search

    q = sorted(oracle_sketches)[0]
    got = {r["match"]: r["jaccard"]
           for r in search(sigs, q, CFG, threshold=0.05).take_all()}
    qm = oracle_sketches[q]["mins"]
    for cid, sk in oracle_sketches.items():
        if cid == q:
            continue
        ref = jaccard_mins(qm, sk["mins"], PARAMS)
        if ref >= 0.05:
            assert got[cid] == pytest.approx(ref, abs=1e-12), cid
        else:
            assert cid not in got


def test_search_sorted_desc(sigs, oracle_sketches):
    from sourmash_ray.pipelines.sourmash_parity import search

    q = sorted(oracle_sketches)[0]
    rows = search(sigs, q, CFG, threshold=0.0).take_all()
    scores = [r["jaccard"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_prefetch_overlap(sigs, oracle_sketches):
    from sourmash_ray.pipelines.sourmash_parity import prefetch

    q = sorted(oracle_sketches)[0]
    qm = oracle_sketches[q]["mins"]
    got = {r["match"]: r["overlap"]
           for r in prefetch(sigs, q, CFG, threshold_hashes=1).take_all()}
    for cid, sk in oracle_sketches.items():
        if cid == q:
            continue
        ov = int(np.intersect1d(qm, sk["mins"], assume_unique=True).size)
        if ov >= 1:
            assert got[cid] == ov, cid
        else:
            assert cid not in got


def test_gather_greedy(sigs, oracle_sketches):
    """Gather on a clone query must find its exact dup first with full
    coverage, then stop (remaining below threshold)."""
    from sourmash_ray.pipelines.sourmash_parity import gather

    clones = [c for c in oracle_sketches if "_xd" in c]
    assert clones
    q = clones[0]
    base = q.split("_xd")[0]
    res = gather(sigs, q, CFG, threshold_hashes=3).to_pylist()
    assert res, "gather found nothing for an exact clone"
    assert res[0]["match"] == base
    assert res[0]["remaining_hashes"] == 0


def test_gather_result_schema_and_ani(sigs, oracle_sketches):
    """Widened GatherResult stats family (search.py:553-664): bp columns,
    weighted sums, and the containment-ANI estimates with CIs."""
    from sourmash_ray.functions.distance import containment_to_distance
    from sourmash_ray.pipelines.sourmash_parity import gather

    clones = [c for c in oracle_sketches if "_xd" in c]
    q = clones[0]
    res = gather(sigs, q, CFG, threshold_hashes=3,
                 estimate_ani_ci=True).to_pylist()
    top = res[0]
    scaled = max(1, CFG.sketch.scaled)
    # an exact clone covers the whole query in round 0
    assert top["f_orig_query"] == pytest.approx(1.0)
    assert top["f_unique_to_query"] == pytest.approx(1.0)
    assert top["intersect_bp"] == top["overlap"] * scaled
    assert top["unique_intersect_bp"] == top["query_bp"]
    assert top["remaining_bp"] == 0
    assert top["query_name"] == q and top["ksize"] == CFG.sketch.ksize
    assert top["sum_weighted_found"] == pytest.approx(
        top["n_unique_weighted_found"])
    # containment 1.0 → ANI exactly 1, CI collapses to 1
    assert top["query_containment_ani"] == pytest.approx(1.0)
    assert top["query_containment_ani_low"] == pytest.approx(1.0)
    # ANI column agrees with the scalar estimator on each row
    for r in res:
        exp = containment_to_distance(
            min(1.0, r["f_orig_query"]), CFG.sketch.ksize, scaled,
            n_unique_kmers=r["query_n_hashes"] * scaled)
        assert r["query_containment_ani"] == pytest.approx(
            exp.ani, rel=1e-12)
        assert r["average_containment_ani"] == pytest.approx(
            (r["query_containment_ani"] + r["match_containment_ani"]) / 2)


def test_compare_exact_matches_oracle(sigs, oracle_sketches):
    from sourmash_ray.pipelines.sourmash_parity import compare_exact

    rows = compare_exact(sigs, CFG).take_all()
    got = {(r["a"], r["b"]): r["jaccard"] for r in rows}
    ids = sorted(oracle_sketches)
    n_pairs = len(ids) * (len(ids) - 1) // 2
    assert len(got) == n_pairs
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ref = jaccard_mins(oracle_sketches[a]["mins"],
                               oracle_sketches[b]["mins"], PARAMS)
            assert got[(a, b)] == pytest.approx(ref, abs=1e-12), (a, b)


def test_downsample_sigs(sigs, oracle_sketches):
    from sourmash_ray.functions.sketch import max_hash_for_scaled
    from sourmash_ray.stages.sigops import downsample_sigs

    out = {r["conv_id"]: r for r in downsample_sigs(sigs, 8).take_all()}
    mh = np.uint64(max_hash_for_scaled(8))
    for cid, sk in oracle_sketches.items():
        ref = sk["mins"][sk["mins"] <= mh]
        assert np.array_equal(
            np.asarray(out[cid]["mins"], dtype=np.uint64), ref), cid
        assert out[cid]["scaled"] == 8


def test_downsample_rejects_upsample(sigs):
    from sourmash_ray.stages.sigops import downsample_sigs

    with pytest.raises(Exception):
        downsample_sigs(sigs, 2).take_all()


def test_abund_filter(sigs, oracle_sketches):
    from sourmash_ray.stages.sigops import abund_filter_sigs

    out = {r["conv_id"]: r
           for r in abund_filter_sigs(sigs, min_abund=2).take_all()}
    for cid, sk in oracle_sketches.items():
        ref = sk["mins"][sk["abunds"] >= 2]
        assert np.array_equal(
            np.asarray(out[cid]["mins"], dtype=np.uint64), ref), cid


def test_merge_and_intersect_all(sigs, oracle_sketches):
    from sourmash_ray.stages.sigops import intersect_all, merge_all

    merged = merge_all(sigs)
    ref_union = np.unique(np.concatenate(
        [s["mins"] for s in oracle_sketches.values()]))
    assert np.array_equal(merged["mins"], ref_union)

    inter = intersect_all(sigs)
    ref_common = None
    for s in oracle_sketches.values():
        ref_common = (s["mins"] if ref_common is None
                      else np.intersect1d(ref_common, s["mins"]))
    assert np.array_equal(inter["mins"], ref_common)


def test_extract_and_describe(sigs):
    from sourmash_ray.stages.sigops import describe_sigs, extract_sigs

    sub = extract_sigs(sigs, name_pattern="_xd").take_all()
    assert sub and all("_xd" in r["conv_id"] for r in sub)
    desc = describe_sigs(sigs).take_all()
    assert all(len(r["md5short"]) == 8 for r in desc)
    assert all(r["n_mins"] >= 0 for r in desc)


def test_sig_json_roundtrip(sigs):
    import numpy as np
    import tempfile, os

    from sourmash_ray.sources.sigjson import read_sig_json, write_sig_json

    rows = sigs.take_all()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "collection.sig.gz")
        write_sig_json(rows, path)
        back = read_sig_json(path)
    by_id = {back["conv_id"][i].as_py(): i for i in range(back.num_rows)}
    assert len(by_id) == len(rows)
    for r in rows:
        i = by_id[r["conv_id"]]
        assert np.array_equal(
            np.asarray(back["mins"][i].as_py(), dtype=np.uint64),
            np.asarray(r["mins"], dtype=np.uint64))
        assert back["md5"][i].as_py() == r["md5"]
        assert back["scaled"][i].as_py() == r["scaled"]


def test_rename_and_cat(sigs):
    from sourmash_ray.stages.sigops import cat_collections, rename_sigs

    renamed = rename_sigs(sigs, lambda c: "x_" + c)
    got = renamed.take(3)
    assert all(r["conv_id"].startswith("x_") for r in got)
    both = cat_collections(sigs, renamed)
    assert both.count() == 2 * sigs.count()


def test_angular_pairs_matches_kernel(sigs, oracle_sketches):
    """Pipeline angular similarity ≡ setops.angular_similarity kernel
    (abundance-cosine, minhash.rs:635-680)."""
    from sourmash_ray.functions.setops import angular_similarity
    from sourmash_ray.functions.sketch import Sketch
    from sourmash_ray.stages.lsh import candidate_pairs
    from sourmash_ray.stages.verify import angular_pairs

    pairs = candidate_pairs(sigs, CFG)
    got = {(r["a"], r["b"]): r["similarity"]
           for r in angular_pairs(pairs, sigs, CFG, threshold=0.0).take_all()}
    assert got
    for (a, b), sim in got.items():
        sa = Sketch(mins=oracle_sketches[a]["mins"],
                    abunds=oracle_sketches[a]["abunds"], params=PARAMS)
        sb = Sketch(mins=oracle_sketches[b]["mins"],
                    abunds=oracle_sketches[b]["abunds"], params=PARAMS)
        ref = angular_similarity(sa, sb)
        assert abs(sim - ref) < 1e-12, (a, b)


def test_angular_pairs_exchange_fallback_equals_broadcast(sigs):
    """Forcing the beyond-broadcast co-group path (broadcast_bytes_limit=0)
    must produce exactly the broadcast path's angular scores."""
    from sourmash_ray.config import ExecParams
    from sourmash_ray.stages.lsh import candidate_pairs
    from sourmash_ray.stages.verify import angular_pairs

    pairs = candidate_pairs(sigs, CFG)
    base = {(r["a"], r["b"]): r["similarity"]
            for r in angular_pairs(pairs, sigs, CFG, threshold=0.0)
            .take_all()}
    forced_cfg = EngineConfig(sketch=CFG.sketch, lsh=CFG.lsh,
                              exec=ExecParams(broadcast_bytes_limit=0))
    forced = {(r["a"], r["b"]): r["similarity"]
              for r in angular_pairs(pairs, sigs, forced_cfg, threshold=0.0)
              .take_all()}
    assert base and forced == pytest.approx(base)


def test_prefetch_ani_columns(sigs, oracle_sketches):
    """PrefetchResult ANI family (search.py:367-433): vectorized columns
    agree with the scalar containment_to_distance estimator."""
    from sourmash_ray.functions.distance import containment_to_distance
    from sourmash_ray.pipelines.sourmash_parity import prefetch

    clones = [c for c in oracle_sketches if "_xd" in c]
    q = clones[0]
    rows = prefetch(sigs, q, CFG, threshold_hashes=1,
                    estimate_ani=True).take_all()
    assert rows
    scaled = max(1, CFG.sketch.scaled)
    q_n = len(oracle_sketches[q]["mins"])
    for r in rows[:10]:
        exp = containment_to_distance(
            min(1.0, r["containment_query"]), CFG.sketch.ksize, scaled,
            n_unique_kmers=q_n * scaled)
        assert r["query_containment_ani"] == pytest.approx(exp.ani,
                                                           rel=1e-9)
        assert r["average_containment_ani"] == pytest.approx(
            (r["query_containment_ani"] + r["match_containment_ani"]) / 2)


def test_categorize_best_match(sigs, oracle_sketches):
    """categorize ≡ per-query argmax jaccard over the oracle sketches
    (commands.py:758-833, self-md5 excluded)."""
    from sourmash_ray.pipelines.sourmash_parity import categorize

    got = {r["query"]: (r["match"], r["similarity"])
           for r in categorize(sigs, sigs, CFG, threshold=0.05).take_all()}
    ids = sorted(oracle_sketches)
    import hashlib

    for q in ids:
        best, best_sim = None, -1.0
        for m in ids:
            if m == q:
                continue
            # exclusion is by md5 identity, not name: exact clones of q
            # are still legal matches only if md5 differs — here sketches
            # of identical text share md5, mirror that
            if np.array_equal(oracle_sketches[q]["mins"],
                              oracle_sketches[m]["mins"]):
                same_md5 = True
            else:
                same_md5 = False
            if same_md5:
                continue
            sim = jaccard_mins(oracle_sketches[q]["mins"],
                               oracle_sketches[m]["mins"], PARAMS)
            if sim > best_sim:
                best, best_sim = m, sim
        if best_sim >= 0.05:
            assert q in got, q
            assert got[q][1] == pytest.approx(best_sim, abs=1e-12), q
        else:
            assert q not in got, q


def test_manifest_write_and_select(sigs, tmp_path):
    """Standalone manifest: selection via the manifest prunes the
    collection without touching sketch payloads (manifest.py:17-214)."""
    from sourmash_ray.stages.sigops import select_via_manifest, write_manifest

    mp = str(tmp_path / "manifest")
    write_manifest(sigs, mp)
    out = select_via_manifest(sigs, mp, "n_mins >= 5").take_all()
    import pyarrow.parquet as pq
    import glob

    man = pq.read_table(glob.glob(mp + "/*.parquet")[0])
    assert "mins" not in man.column_names  # manifest has no payloads
    exp = {r["conv_id"] for r in sigs.take_all() if len(r["mins"]) >= 5}
    assert {r["conv_id"] for r in out} == exp


def test_compare_estimate_ani(sigs, oracle_sketches):
    """compare --estimate-ani: per-pair ANI agrees with jaccard_to_ani."""
    from sourmash_ray.functions.setops import jaccard_to_ani
    from sourmash_ray.pipelines.sourmash_parity import compare_exact

    rows = compare_exact(sigs, CFG, estimate_ani=True).take_all()
    assert rows and "ani" in rows[0]
    for r in rows[:50]:
        assert r["ani"] == pytest.approx(
            jaccard_to_ani(r["jaccard"], CFG.sketch.ksize), rel=1e-12)


def test_gather_matches_naive_greedy_oracle(sigs, oracle_sketches):
    """CounterGather consume/decrement rounds ≡ a naive greedy
    min-set-cov recomputed from scratch each round (index/__init__.py:
    858-909 semantics: max remaining overlap, md5-ascending tiebreak)."""
    import hashlib

    from sourmash_ray.functions.sketch import md5_of_mins
    from sourmash_ray.pipelines.sourmash_parity import gather

    q = sorted(oracle_sketches)[0]
    got = gather(sigs, q, CFG, threshold_hashes=2).to_pylist()

    # naive oracle: rescan every round
    orig = oracle_sketches[q]["mins"]
    md5s = {c: md5_of_mins(s["mins"], PARAMS.ksize)
            for c, s in oracle_sketches.items()}
    remaining = set(int(x) for x in orig)
    exp = []
    used = set()
    while len(remaining) >= 2:
        best = None
        for c, s in oracle_sketches.items():
            if c == q or c in used:
                continue
            ov = len(remaining & set(int(x) for x in s["mins"]))
            key = (-ov, md5s[c])
            if ov >= 2 and (best is None or key < best[0]):
                best = (key, c, ov)
        if best is None:
            break
        _, c, ov = best
        exp.append((c, ov))
        used.add(c)
        remaining -= set(int(x) for x in oracle_sketches[c]["mins"])
    assert [(r["match"], r["overlap"]) for r in got] == exp


def test_subtract_from_collection(sigs, oracle_sketches):
    """sig subtract: target minus the union of every other signature."""
    from sourmash_ray.stages.sigops import subtract_from

    ids = sorted(oracle_sketches)
    target = ids[0]
    out = subtract_from(sigs, target)
    union_others = np.unique(np.concatenate(
        [oracle_sketches[c]["mins"] for c in ids if c != target]))
    exp = oracle_sketches[target]["mins"]
    exp = exp[~np.isin(exp, union_others, assume_unique=True)]
    assert np.array_equal(out["mins"], exp)
    assert out["n_removed"] == len(oracle_sketches[target]["mins"]) - len(exp)
    with pytest.raises(KeyError):
        subtract_from(sigs, "nope")


def test_multigather_equals_single_gathers(sigs, oracle_sketches):
    """multigather's one-scan + query-parallel greedy must equal N
    independent single-query gathers row-for-row."""
    from sourmash_ray.pipelines.sourmash_parity import gather, multigather

    qids = sorted(oracle_sketches)[:4]
    got = multigather(sigs, qids, CFG, threshold_hashes=2).to_pylist()
    want = []
    for q in sorted(qids):
        want.extend(gather(sigs, q, CFG, threshold_hashes=2).to_pylist())
    assert got == want
    assert any(r for r in got), "multigather found nothing"


def test_gather_candidates_never_collected_on_driver(
        sigs, oracle_sketches, monkeypatch):
    """The candidate blocks feed _CounterShard actors; the DRIVER process
    must never concat/collect them (VERDICT r2 #2). concat_tables is
    poisoned in this (driver) process only — the actor processes import
    their own unpatched module copies."""
    import pyarrow as _pa

    import sourmash_ray.pipelines.sourmash_parity as sp

    def _boom(*a, **k):
        raise AssertionError("driver-side pa.concat_tables during gather")

    monkeypatch.setattr(sp.pa, "concat_tables", _boom)
    clones = [c for c in oracle_sketches if "_xd" in c]
    q = clones[0]
    res = sp.gather(sigs, q, CFG, threshold_hashes=3).to_pylist()
    assert res and res[0]["match"] == q.split("_xd")[0]


def test_gather_threshold_zero_no_spurious_rows(sigs, oracle_sketches):
    """threshold_hashes=0 must terminate without re-picking consumed
    candidates at overlap 0 (ADVICE r2): every emitted row has overlap ≥ 1
    and each match appears at most once."""
    from sourmash_ray.pipelines.sourmash_parity import gather

    q = sorted(oracle_sketches)[0]
    res = gather(sigs, q, CFG, threshold_hashes=0, max_rounds=80).to_pylist()
    matches = [r["match"] for r in res]
    assert len(matches) == len(set(matches))
    assert all(r["overlap"] >= 1 for r in res)


def test_compare_matrix_variants_golden(ray_session):
    """compare containment/max/avg variants vs hand-computed matrices
    (the reference's tests/test_compare.py golden-matrix idea)."""
    import pyarrow as pa
    import ray.data

    from sourmash_ray.config import EngineConfig
    from sourmash_ray.functions.sketch import SketchParams
    from sourmash_ray.pipelines.sourmash_parity import compare_exact

    cfg = EngineConfig(sketch=SketchParams(ksize=12, scaled=4, num=0))
    sigs = ray.data.from_arrow(pa.table({
        "conv_id": pa.array(["A", "B", "C"]),
        "mins": pa.array([list(range(1, 11)), list(range(1, 6)),
                          list(range(6, 16))],
                         pa.list_(pa.uint64())),
    }))

    def rows(metric):
        return {(r["a"], r["b"]): r
                for r in compare_exact(sigs, cfg,
                                       metric=metric).take_all()}

    cont = rows("containment")
    assert cont[("A", "B")]["containment_ab"] == pytest.approx(0.5)
    assert cont[("A", "B")]["containment_ba"] == pytest.approx(1.0)
    assert cont[("A", "C")]["containment_ab"] == pytest.approx(0.5)
    assert cont[("A", "C")]["containment_ba"] == pytest.approx(0.5)
    assert cont[("B", "C")]["containment_ab"] == 0.0
    mx = rows("max_containment")
    assert mx[("A", "B")]["max_containment"] == pytest.approx(1.0)
    assert mx[("A", "C")]["max_containment"] == pytest.approx(0.5)
    av = rows("avg_containment")
    assert av[("A", "B")]["avg_containment"] == pytest.approx(0.75)
    assert av[("B", "C")]["avg_containment"] == 0.0
    ja = rows("jaccard")
    assert ja[("A", "B")]["jaccard"] == pytest.approx(0.5)
    assert ja[("A", "C")]["jaccard"] == pytest.approx(1.0 / 3.0)

    with pytest.raises(ValueError):
        compare_exact(sigs, EngineConfig(
            sketch=SketchParams(ksize=12, scaled=0, num=16)),
            metric="containment")


def test_sig_collect_and_check(sigs, tmp_path):
    """sig collect / sig check (sig/__main__.py:1412-1660): manifests
    combined with internal_location rewritten per container; picklist
    audit reports matches + never-found entries; manifests required by
    default; merge_previous unions with an existing output."""
    from sourmash_ray.stages.picklist import PickStyle
    from sourmash_ray.stages.sigops import (check_collections,
                                            collect_manifests,
                                            write_manifest)

    # split the collection into two "locations" with sibling manifests
    ids = sorted(r["conv_id"] for r in
                 sigs.select_columns(["conv_id"]).take_all())
    half = set(ids[:len(ids) // 2])
    loc_a = str(tmp_path / "col_a")
    loc_b = str(tmp_path / "col_b")
    a = sigs.filter(lambda r: r["conv_id"] in half)
    b = sigs.filter(lambda r: r["conv_id"] not in half)
    a.write_parquet(loc_a)
    b.write_parquet(loc_b)
    write_manifest(a, loc_a + ".manifest")
    write_manifest(b, loc_b + ".manifest")

    # collect: every row present once, internal_location = its container
    out = str(tmp_path / "combined.manifest")
    mf = collect_manifests([loc_a, loc_b], output_path=out)
    rows = mf.take_all()
    assert sorted(r["conv_id"] for r in rows) == ids
    for r in rows:
        assert r["internal_location"] == (loc_a if r["conv_id"] in half
                                          else loc_b)

    # refuse to overwrite without merge_previous (reference error)
    with pytest.raises(FileExistsError):
        collect_manifests([loc_a], output_path=out)

    # merge_previous: previous rows + the new location's rows
    merged = collect_manifests([loc_a], output_path=out,
                               merge_previous=True)
    assert merged.count() == len(ids) + len(half)

    # missing manifest → error by default, generated when allowed
    loc_c = str(tmp_path / "col_c")
    sigs.limit(3).write_parquet(loc_c)
    with pytest.raises(FileNotFoundError):
        collect_manifests([loc_c])
    assert collect_manifests([loc_c], require_manifest=False).count() == 3

    # check: 2 present + 1 phantom picklist entry
    picked = [ids[0], ids[-1], "zz_not_there"]
    matching, missing, n = check_collections([loc_a, loc_b], picked)
    got = sorted(r["conv_id"] for r in matching.take_all())
    assert got == sorted(picked[:2])
    assert missing == ["zz_not_there"]
    assert n == len(ids)

    # exclude style: complement, no missing report (reference forbids -o)
    excl, miss, _ = check_collections([loc_a, loc_b], picked,
                                      style=PickStyle.EXCLUDE)
    assert sorted(r["conv_id"] for r in excl.take_all()) == \
        sorted(set(ids) - set(picked))
    assert miss is None

    # ident coltype: pick by first-token identifier
    ident0 = ids[0].split()[0].split("/")[0]
    m2, miss2, _ = check_collections([loc_a, loc_b], [ident0],
                                     coltype="ident")
    assert any(r["conv_id"] == ids[0] for r in m2.take_all())


def test_watch_stream_finds_match_and_stops_early(sigs, corpus):
    """watch (commands.py:1389-1471): stream a known conversation's turns;
    the periodic best-only search must find that conversation, at the
    first watermark that crosses the threshold; an unrelated stream must
    end with found=False."""
    from sourmash_ray.pipelines.sourmash_parity import watch_stream

    texts = {}
    for cid, txt in zip(corpus["conv_id"].to_pylist(),
                        corpus["text"].to_pylist()):
        texts.setdefault(cid, []).append(txt)
    target = sorted(texts, key=lambda c: -len(texts[c]))[0]
    stream = texts[target]
    out = watch_stream(iter(stream), sigs, CFG, threshold=0.2, watermark=2)
    assert out["found"]
    assert out["best_id"] in (target, target.split("_xd")[0]) or \
        out["best_score"] >= 0.2
    assert 0 < out["n_records"] <= len(stream)
    assert out["n_mins"] > 0

    # gibberish stream shares no shingles -> no hit, runs to exhaustion
    junk = ["zq%d!!xv" % i * 3 for i in range(5)]
    out2 = watch_stream(iter(junk), sigs, CFG, threshold=0.2, watermark=2)
    assert not out2["found"]
    assert out2["n_records"] == 5


def test_watch_dataset_streams_blocks(sigs, corpus, ray_session):
    """watch over a Dataset source: iter_batches feeds the serial loop,
    deterministic order via sort_by, same hit as the list-stream path."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from sourmash_ray.pipelines.sourmash_parity import (watch_dataset,
                                                        watch_stream)

    texts = {}
    for cid, txt in zip(corpus["conv_id"].to_pylist(),
                        corpus["text"].to_pylist()):
        texts.setdefault(cid, []).append(txt)
    target = sorted(texts, key=lambda c: -len(texts[c]))[0]
    sub = corpus.filter(pc.equal(corpus["conv_id"], target))
    if "turn_idx" not in sub.column_names:
        sub = sub.append_column(
            "turn_idx", pa.array(range(sub.num_rows), pa.int64()))
    ds = ray.data.from_arrow(sub).repartition(3)

    out = watch_dataset(ds, sigs, "text", CFG, threshold=0.2, watermark=2,
                        sort_by="turn_idx")
    ref = watch_stream(iter(texts[target]), sigs, CFG, threshold=0.2,
                       watermark=2)
    assert out == ref
    assert out["found"]


def test_overlap_report_matches_oracle(sigs, oracle_sketches):
    import numpy as np

    from sourmash_ray.stages.sigops import overlap_report

    ids = sorted(oracle_sketches)[:2]
    a, b = ids
    row = overlap_report(sigs, a, b).to_pylist()[0]
    ma = np.asarray(oracle_sketches[a]["mins"], np.uint64)
    mb = np.asarray(oracle_sketches[b]["mins"], np.uint64)
    common = len(np.intersect1d(ma, mb))
    union = len(np.union1d(ma, mb))
    assert row["num_common"] == common
    assert row["num_union"] == union
    assert row["disjoint_a"] == len(ma) - common
    assert row["disjoint_b"] == len(mb) - common
    assert row["size_a"] == len(ma) and row["size_b"] == len(mb)
    assert abs(row["jaccard"] - (common / union if union else 1.0)) < 1e-12
    assert abs(row["containment_a_in_b"]
               - (common / len(ma) if len(ma) else 0.0)) < 1e-12
    import pytest

    with pytest.raises(ValueError, match="not found"):
        overlap_report(sigs, a, "no-such-conv")


def test_export_mash_json(sigs, oracle_sketches, tmp_path):
    import json

    from sourmash_ray.sources.sigjson import export_mash_json

    cid = sorted(oracle_sketches)[0]
    p = export_mash_json(sigs, cid, str(tmp_path / "out.msh.json"))
    x = json.load(open(p))
    assert x["hashType"] == "MurmurHash3_x64_128"
    assert x["hashBits"] == 64 and x["hashSeed"] == 42
    assert x["sketches"][0]["hashes"] == [
        int(h) for h in oracle_sketches[cid]["mins"]]
    assert x["sketchSize"] == len(oracle_sketches[cid]["mins"])


def test_import_mash_csv(tmp_path):
    import pytest

    from sourmash_ray.sources.sigjson import import_mash_csv

    p = tmp_path / "sigs.csv"
    p.write_text('murmur64,42,31,convA,30 10 20\n'
                 'murmur64,42,31,convB,5\n')
    t = import_mash_csv(str(p))
    rows = {r["conv_id"]: r for r in t.to_pylist()}
    assert rows["convA"]["mins"] == [10, 20, 30]     # sorted invariant
    assert rows["convA"]["num"] == 3
    assert rows["convB"]["mins"] == [5]
    assert len(rows["convA"]["md5"]) == 32

    bad = tmp_path / "bad.csv"
    bad.write_text('sha1,42,31,x,1 2\n')
    with pytest.raises(ValueError, match="hash function"):
        import_mash_csv(str(bad))


def test_plan_fromfile(sigs):
    import pytest

    from sourmash_ray.stages.sigops import describe_sigs, plan_fromfile

    params = PARAMS
    manifest = (describe_sigs(sigs)
                .to_pandas().pipe(lambda df: df))
    import pyarrow as pa
    man_tbl = pa.Table.from_pandas(manifest)
    have = manifest["conv_id"].tolist()[:3]
    entries = ([{"name": n, "source_path": "corpus.parquet"}
                for n in have]
               + [{"name": "brand-new", "source_path": "x.parquet"},
                  {"name": "no-source", "source_path": ""}])
    to_build, summary = plan_fromfile(entries, [params], man_tbl)
    built = {r["name"] for r in to_build.to_pylist()}
    assert built == {"brand-new"}
    assert summary["n_already_done"] == 3
    assert summary["n_missing_source"] == 1
    assert summary["missing"] == ["no-source"]
    assert summary["total_sigs"] == 5

    with pytest.raises(ValueError, match="duplicate"):
        plan_fromfile([{"name": "a", "source_path": "x"}] * 2, [params])
    with pytest.raises(ValueError, match="blank"):
        plan_fromfile([{"name": "", "source_path": "x"}], [params])
