"""Kill a running PageRank JOB PROCESS after superstep k, resume in a fresh
process, final state bit-identical to an uninterrupted run — the strongest
form of BASELINE.md's checkpoint/resume gate (process death, not just a
polite early return)."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "jobs", "pagerank_job.py")


def _run_job(edges_path, ck, out, extra_env=None, max_iter=10):
    env = dict(os.environ, RAY_GRAFT_CPUS="4", **(extra_env or {}))
    env.pop("RAY_ADDRESS", None)  # job owns a fresh local session
    return subprocess.run(
        [sys.executable, JOB, "--edges", edges_path, "--checkpoint-dir", ck,
         "--out", out, "--tol", "0", "--max-iter", str(max_iter), "--symmetrize"],
        env=env, capture_output=True, text=True, cwd=REPO,
    )


def test_job_kill_and_resume(tmp_path):
    edges_path = str(tmp_path / "edges.parquet")
    rng = np.random.default_rng(4)
    src = rng.integers(0, 30, size=120)
    dst = rng.integers(0, 30, size=120)
    m = src != dst
    pq.write_table(
        pa.table({"src": src[m].astype("int64"), "dst": dst[m].astype("int64")}),
        edges_path,
    )

    # uninterrupted reference run
    out_a = str(tmp_path / "out_a")
    r = _run_job(edges_path, str(tmp_path / "ck_a"), out_a)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["iterations"] == 10

    # crash after superstep 4 (process hard-exits), then resume
    ck_b = str(tmp_path / "ck_b")
    out_b = str(tmp_path / "out_b")
    r1 = _run_job(edges_path, ck_b, out_b, extra_env={"GRAFT_KILL_AFTER_ITER": "4"})
    assert r1.returncode == 1  # died mid-job
    # committed iterations only; in-flight speculative supersteps may leave
    # an uncommitted iter=*.tmp staging dir, which resume ignores (validity
    # is defined by the manifest, renamed in last)
    committed = sorted(d for d in os.listdir(ck_b) if not d.endswith(".tmp"))
    assert committed == [f"iter={i}" for i in range(5)]
    r2 = _run_job(edges_path, ck_b, out_b)
    assert r2.returncode == 0, r2.stderr[-2000:]
    summary = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary["resumed_from"] == 4

    ranks_a = pq.read_table(os.path.join(out_a, "ranks")).to_pandas()
    ranks_b = pq.read_table(os.path.join(out_b, "ranks")).to_pandas()
    ranks_a = ranks_a.sort_values("vertex_id").reset_index(drop=True)
    ranks_b = ranks_b.sort_values("vertex_id").reset_index(drop=True)
    assert ranks_a.equals(ranks_b)  # bit-identical
