"""Exact long-match (LCS) kernel + stage tests vs difflib oracle."""

from __future__ import annotations

from difflib import SequenceMatcher

import pytest
from hypothesis import given, settings, strategies as st

from sourmash_ray.functions.substring import longest_common_substring


def _oracle_len(a: bytes, b: bytes) -> int:
    m = SequenceMatcher(None, a, b, autojunk=False)
    return m.find_longest_match(0, len(a), 0, len(b)).size


@pytest.mark.parametrize("a,b,want", [
    (b"hello world", b"say hello there", 6),       # "hello " vs " hello"
    (b"abcdef", b"zabcdefg", 6),
    (b"aaaa", b"aaaa", 4),
    (b"abc", b"xyz", 0),
    (b"", b"abc", 0),
    (b"ab", b"", 0),
])
def test_lcs_known(a, b, want):
    L, pa_, pb_ = longest_common_substring(a, b)
    assert L == want
    if L:
        assert a[pa_:pa_ + L] == b[pb_:pb_ + L]


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=120), st.binary(min_size=0, max_size=120))
def test_lcs_matches_difflib(a, b):
    L, pa_, pb_ = longest_common_substring(a, b)
    assert L == _oracle_len(a, b)
    if L:
        assert a[pa_:pa_ + L] == b[pb_:pb_ + L]


def test_exact_substring_stage(ray_session):
    import ray.data

    from sourmash_ray.config import EngineConfig, LSHParams
    from sourmash_ray.functions.sketch import SketchParams
    from sourmash_ray.pipelines.dedup import dedup_pipeline
    from sourmash_ray.sources.transcripts import synth_transcripts
    from sourmash_ray.stages.substring import exact_substring_pass

    cfg = EngineConfig(sketch=SketchParams(ksize=12, scaled=4, num=0),
                       lsh=LSHParams(num_perm=12, bands=4, rows=3))
    tbl = synth_transcripts(30, seed=41)
    ds = ray.data.from_arrow(tbl)
    out = dedup_pipeline(ds, cfg)
    spans = exact_substring_pass(out["verified_pairs"], ds, cfg,
                                 min_len=32).take_all()
    assert spans, "no long exact spans among verified dup pairs"
    # exact clones must share a span covering their whole (equal) text
    clones = [r for r in spans if r["b"].startswith(r["a"] + "_xd")]
    assert clones
    for r in spans:
        assert r["lcs_len"] >= 32


def test_exact_substring_exchange_equals_broadcast(ray_session):
    """Forced beyond-broadcast path (broadcast_bytes_limit=0): the LCS
    pass rides the two-exchange co-group and must produce exactly the
    broadcast path's spans — no take_all of pairs, no driver text dict."""
    import ray.data

    from sourmash_ray.config import EngineConfig, ExecParams, LSHParams
    from sourmash_ray.functions.sketch import SketchParams
    from sourmash_ray.pipelines.dedup import dedup_pipeline
    from sourmash_ray.stages.substring import exact_substring_pass

    from sourmash_ray.sources.transcripts import synth_transcripts

    cfg = EngineConfig(sketch=SketchParams(ksize=12, scaled=4, num=0),
                       lsh=LSHParams(num_perm=12, bands=4, rows=3))
    forced = EngineConfig(sketch=cfg.sketch, lsh=cfg.lsh,
                          exec=ExecParams(broadcast_bytes_limit=0))
    tbl = synth_transcripts(30, seed=41)
    ds = ray.data.from_arrow(tbl)
    out = dedup_pipeline(ds, cfg)
    pairs = out["verified_pairs"].materialize()
    key = lambda r: (r["a"], r["b"], r["lcs_len"], r["lcs_a_start"],
                     r["lcs_b_start"])
    want = sorted(key(r) for r in
                  exact_substring_pass(pairs, ds, cfg, min_len=32).take_all())
    got = sorted(set(
        key(r) for r in
        exact_substring_pass(pairs, ds, forced, min_len=32).take_all()))
    assert want and got == sorted(set(want))


def test_exact_spans_docs_spans_verify_against_text(ray_session):
    """Doc-level exact-spans: every reported (start, len) must slice to
    IDENTICAL bytes in the two documents' normalized texts, and planted
    near-dup docs must surface a span."""
    import pyarrow.parquet as pq

    from sourmash_ray.functions.sketch import normalize_text
    from sourmash_ray.pipelines.docops import exact_spans_docs

    sf = "/root/testdata/sf0.001"
    rows = exact_spans_docs(sf, min_len=32).take_all()
    assert rows, "expected at least one near-dup doc span at sf0.001"
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"])
    texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    for r in rows:
        ba = normalize_text(texts[int(r["a"])] or "")
        bb = normalize_text(texts[int(r["b"])] or "")
        ln = r["lcs_len"]
        assert ln >= 32
        sa, sb = r["lcs_a_start"], r["lcs_b_start"]
        assert ba[sa:sa + ln] == bb[sb:sb + ln]
        assert len(ba[sa:sa + ln]) == ln
