"""Job-level failure injection (VERDICT r4 item 9): SIGKILL the
composite ``ray job submit`` entrypoints mid-stage, resubmit the
identical command, and assert the resumed output matches a fresh
uninterrupted run. Jobs run in SUBPROCESSES with their own local Ray
sessions (that is the deployment shape under test — the in-test
``ray_session`` fixture stays untouched)."""
from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run(cmd, timeout=420):
    return subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=timeout)


def _spawn(cmd):
    return subprocess.Popen(cmd, cwd=REPO, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL,
                            start_new_session=True)


def _kill_when(proc, predicate, timeout=300):
    """SIGKILL the whole process group as soon as ``predicate()`` is
    true; returns whether the kill fired before the job exited."""
    t0 = time.time()
    while time.time() - t0 < timeout:
        if proc.poll() is not None:
            return False               # job finished before the trigger
        if predicate():
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            proc.wait(timeout=60)
            return True
        time.sleep(0.1)
    raise TimeoutError("kill trigger never fired")


def _sorted_rows(path_glob):
    files = sorted(glob.glob(path_glob))
    assert files, f"no parquet under {path_glob}"
    import pyarrow as pa

    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    cols = sorted(tbl.column_names)
    return sorted(tuple(r[c] for c in cols) for r in tbl.to_pylist())


def test_curate_job_kill_mid_stage_resume(tmp_path):
    out_killed = str(tmp_path / "killed")
    out_fresh = str(tmp_path / "fresh")
    cmd = [sys.executable, "jobs/curate_job.py", "--input", SF,
           "--num-cpus", "4"]

    # first attempt: kill the moment the FIRST stage commits its _DONE
    proc = _spawn(cmd + ["--out", out_killed])
    killed = _kill_when(
        proc, lambda: os.path.exists(
            os.path.join(out_killed, "exact_dedup", "_DONE")))
    assert killed, "job finished before the kill trigger - fixture too small"
    done_after_kill = glob.glob(os.path.join(out_killed, "*", "_DONE"))
    assert len(done_after_kill) < 6, "all stages finished before the kill"

    # resubmit the identical command: completed stages skip, rest run
    r = _run(cmd + ["--out", out_killed])
    assert r.returncode == 0, r.stderr[-2000:]
    stages = json.loads(r.stdout.strip().splitlines()[-1])["stages"]
    assert stages["exact_dedup"] == "skipped (done)"
    assert len(glob.glob(os.path.join(out_killed, "*", "_DONE"))) == 6

    # fresh uninterrupted run for comparison
    r = _run(cmd + ["--out", out_fresh])
    assert r.returncode == 0, r.stderr[-2000:]

    for stage in ("exact_dedup", "curated", "langid", "quality_gate",
                  "exact_decontam", "lm_score"):
        assert _sorted_rows(f"{out_killed}/{stage}/*.parquet") == \
            _sorted_rows(f"{out_fresh}/{stage}/*.parquet"), stage


def test_dedup_job_kill_mid_checkpoint_resume(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out_resumed = str(tmp_path / "resumed")
    out_fresh = str(tmp_path / "fresh")
    cmd = [sys.executable, "jobs/dedup_job.py", "--input", SF,
           "--num-cpus", "4"]

    # kill as soon as the signatures stage checkpoint commits
    proc = _spawn(cmd + ["--checkpoint-dir", ckpt])
    killed = _kill_when(
        proc, lambda: os.path.exists(
            os.path.join(ckpt, "signatures", "_LINEAGE.json")))
    assert killed, "job finished before the kill trigger"
    assert not os.path.exists(
        os.path.join(ckpt, "clusters", "_LINEAGE.json"))

    # resubmit with the same checkpoint dir -> resumes past signatures
    r = _run(cmd + ["--checkpoint-dir", ckpt, "--out", out_resumed])
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["clusters_rows"] > 0

    # fresh run, no checkpoints at all
    r = _run(cmd + ["--out", out_fresh])
    assert r.returncode == 0, r.stderr[-2000:]

    assert _sorted_rows(f"{out_resumed}/*.parquet") == \
        _sorted_rows(f"{out_fresh}/*.parquet")


def test_dedup_job_tiered_mode(tmp_path):
    """--tiered docs runs the cascade end-to-end from the job
    entrypoint, writes the (doc_id, tier, rep_doc_id) table, and covers
    every input row exactly once."""
    out = str(tmp_path / "tiers")
    r = _run([sys.executable, "jobs/dedup_job.py", "--input", SF,
              "--tiered", "docs", "--out", out, "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["job"] == "tiered_dedup_docs"
    tbl = pq.read_table(out)
    n_docs = pq.read_table(f"{SF}/documents.parquet",
                           columns=["doc_id"]).num_rows
    assert tbl.num_rows == rep["rows"] == n_docs
    ids = sorted(tbl["doc_id"].to_pylist())
    assert ids == sorted(set(ids))  # one labeled row per doc
    assert set(tbl["tier"].to_pylist()) <= {"exact", "simhash",
                                            "minhash", "kept"}


def test_tiered_job_kill_mid_tier_resume(tmp_path):
    """SIGKILL the tiered cascade after its sketch checkpoint commits;
    resubmitting with the same checkpoint dir resumes past completed
    tiers and the resumed output is content-identical to a fresh run."""
    ckpt = str(tmp_path / "ckpt")
    out_resumed = str(tmp_path / "resumed")
    out_fresh = str(tmp_path / "fresh")
    cmd = [sys.executable, "jobs/dedup_job.py", "--input", SF,
           "--tiered", "docs", "--num-cpus", "4"]

    proc = _spawn(cmd + ["--checkpoint-dir", ckpt])
    killed = _kill_when(
        proc, lambda: os.path.exists(
            os.path.join(ckpt, "sketches", "_LINEAGE.json")))
    assert killed, "job finished before the kill trigger"
    assert not os.path.exists(
        os.path.join(ckpt, "tier_minhash", "_LINEAGE.json"))

    r = _run(cmd + ["--checkpoint-dir", ckpt, "--out", out_resumed])
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["rows"] > 0

    r = _run(cmd + ["--out", out_fresh])
    assert r.returncode == 0, r.stderr[-2000:]
    assert _sorted_rows(f"{out_resumed}/*.parquet") == \
        _sorted_rows(f"{out_fresh}/*.parquet")


def test_dedup_job_tiered_embeddings_mode(tmp_path):
    """--tiered embeddings runs the third-modality cascade end-to-end
    from the job entrypoint and labels every vector exactly once."""
    out = str(tmp_path / "etiers")
    r = _run([sys.executable, "jobs/dedup_job.py", "--input", SF,
              "--tiered", "embeddings", "--out", out, "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["job"] == "tiered_dedup_embeddings"
    tbl = pq.read_table(out)
    n_vecs = pq.read_table(f"{SF}/embeddings.parquet",
                           columns=["vec_id"]).num_rows
    assert tbl.num_rows == rep["rows"] == n_vecs
    ids = sorted(tbl["vec_id"].to_pylist())
    assert ids == sorted(set(ids))
    assert set(tbl["tier"].to_pylist()) <= {"exact", "cosine_hi",
                                            "cosine_lo", "kept"}


def test_tiered_embeddings_checkpoint_resume(tmp_path):
    """Kill the embeddings cascade after the sketch checkpoint commits;
    a resubmit with the same checkpoint dir completes and its output is
    content-identical to a fresh uncheckpointed run."""
    ckpt = str(tmp_path / "eckpt")
    out_resumed = str(tmp_path / "eout_resumed")
    out_fresh = str(tmp_path / "eout_fresh")
    cmd = [sys.executable, "jobs/dedup_job.py", "--input", SF,
           "--tiered", "embeddings", "--num-cpus", "4"]
    proc = _spawn(cmd + ["--checkpoint-dir", ckpt])
    killed = _kill_when(
        proc, lambda: os.path.exists(
            os.path.join(ckpt, "sketches", "_LINEAGE.json")))
    assert killed, "job finished before the kill trigger"

    r = _run(cmd + ["--checkpoint-dir", ckpt, "--out", out_resumed])
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run(cmd + ["--out", out_fresh])
    assert r.returncode == 0, r.stderr[-2000:]
    assert _sorted_rows(f"{out_resumed}/*.parquet") == \
        _sorted_rows(f"{out_fresh}/*.parquet")


def test_dedup_job_tiered_embeddings_audit(tmp_path):
    """--tiered embeddings --audit reports the residual-cosine audit
    row from the job entrypoint."""
    r = _run([sys.executable, "jobs/dedup_job.py", "--input", SF,
              "--tiered", "embeddings", "--audit", "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    audit = rep["audit"]
    assert audit["n_kept"] > 0 and audit["n_pairs_checked"] > 0
    assert set(audit) == {"n_kept", "n_sampled", "n_pairs_checked",
                          "n_dup_pairs", "dup_rate_ppm"}


def test_audit_job_end_to_end(tmp_path):
    """audit_job runs the whole audit suite at sf0.001 in a subprocess
    (its own Ray session), emits one AUDIT JSON line with exact headline
    scalars, and persists every audit's full table under --out."""
    out = str(tmp_path / "audit_out")
    r = _run([sys.executable, "jobs/audit_job.py", "--input", SF,
              "--out", out, "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("AUDIT ")]
    assert line
    m = json.loads(line[-1][len("AUDIT "):])
    # exact expectations, independently verifiable at sf0.001
    assert m["coverage"] == {"matched": 500, "docs_without_vec": 0,
                             "vecs_without_doc": 0}
    # duckdb twins of the two fingerprint audits
    import duckdb

    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    ng, nd = c.sql(f"""
        WITH f AS (SELECT conv_id, md5(string_agg(coalesce(text,''),
                          chr(31) ORDER BY turn_idx)) AS fp
                   FROM read_parquet('{transcripts_path(SF)}/*.parquet')
                   GROUP BY conv_id),
        g AS (SELECT fp, count(*) AS c FROM f GROUP BY fp
              HAVING count(*) >= 2)
        SELECT count(*), CAST(coalesce(sum(c), 0) AS BIGINT) FROM g
    """).fetchone()
    assert m["conv_dups"] == {"n_groups": ng, "n_dup_convs": nd}
    assert m["leakage"]["n_leaking_groups"] > 0
    assert m["vocab_overlap"]["n_pairs"] == 190
    assert 0 < m["lexdiv"]["min_ttr_ppm"] <= 1_000_000
    # persisted tables match the headline counts
    assert len(_sorted_rows(f"{out}/conv_dups/*.parquet")) == ng
    assert len(_sorted_rows(f"{out}/leakage/*.parquet")) \
        == m["leakage"]["n_leaking_groups"]
    assert len(_sorted_rows(f"{out}/vocab_overlap/*.parquet")) == 190
    # session-7 audits: deterministic exact scalars at sf0.001
    assert m["echo"] == {"n_pairs": 955, "echo_ppm": 28272,
                         "mean_jaccard_ppm": 136603}
    assert m["drift"]["n_convs"] == 125
    assert m["dup_depth"] == {"dup_turn_ppm": 125925,
                              "n_dup_convs": 18}
    # the dup_depth headline reconciles with the conv_dups inventory
    assert m["dup_depth"]["n_dup_convs"] == m["conv_dups"]["n_dup_convs"]


def test_audit_job_subset_selection():
    """--audits runs only the named audits and rejects unknown names."""
    r = _run([sys.executable, "jobs/audit_job.py", "--input", SF,
              "--audits", "coverage", "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads([ln for ln in r.stdout.splitlines()
                    if ln.startswith("AUDIT ")][-1][len("AUDIT "):])
    assert "coverage" in m and "conv_dups" not in m
    r2 = _run([sys.executable, "jobs/audit_job.py", "--input", SF,
               "--audits", "nope", "--num-cpus", "4"])
    assert r2.returncode != 0
