"""jobs/graph_job.py — the ``ray job submit`` entry for the remaining
north-star algorithms: cc/lpa kill-and-resume (process hard-exit after a
committed superstep, fresh-process resume, bit-identical labels) and the
triangles single-pass job. Mirrors tests/test_kill_resume.py's contract for
PageRank."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "jobs", "graph_job.py")


def _run_job(algo, edges_path, out, ck=None, extra_env=None, max_iter=0):
    env = dict(os.environ, RAY_GRAFT_CPUS="4", **(extra_env or {}))
    env.pop("RAY_ADDRESS", None)  # job owns a fresh local session
    cmd = [sys.executable, JOB, algo, "--edges", edges_path, "--out", out,
           "--symmetrize"]
    if ck is not None:
        cmd += ["--checkpoint-dir", ck]
    if max_iter:
        cmd += ["--max-iter", str(max_iter)]
    return subprocess.run(cmd, env=env, capture_output=True, text=True, cwd=REPO)


def _edges(tmp_path, seed=9, n=40, m=160):
    edges_path = str(tmp_path / "edges.parquet")
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    keep = src != dst
    pq.write_table(
        pa.table({"src": src[keep].astype("int64"),
                  "dst": dst[keep].astype("int64")}),
        edges_path,
    )
    return edges_path


def _read_sorted(path):
    df = pq.read_table(path).to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_lpa_job_kill_and_resume(tmp_path):
    edges_path = _edges(tmp_path)

    out_a = str(tmp_path / "out_a")
    r = _run_job("lpa", edges_path, out_a, ck=str(tmp_path / "ck_a"),
                 max_iter=8)
    assert r.returncode == 0, r.stderr[-2000:]

    ck_b = str(tmp_path / "ck_b")
    out_b = str(tmp_path / "out_b")
    r1 = _run_job("lpa", edges_path, out_b, ck=ck_b, max_iter=8,
                  extra_env={"GRAFT_KILL_AFTER_ITER": "2"})
    assert r1.returncode == 1  # died mid-job
    committed = sorted(d for d in os.listdir(ck_b) if not d.endswith(".tmp"))
    assert committed == [f"iter={i}" for i in range(3)]
    r2 = _run_job("lpa", edges_path, out_b, ck=ck_b, max_iter=8)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert json.loads(r2.stdout.strip().splitlines()[-1])["resumed_from"] == 2

    a = _read_sorted(os.path.join(out_a, "labels"))
    b = _read_sorted(os.path.join(out_b, "labels"))
    assert a.equals(b)  # bit-identical


def test_cc_job_matches_oracle(tmp_path):
    edges_path = _edges(tmp_path, seed=3)
    out = str(tmp_path / "out")
    r = _run_job("cc", edges_path, out, ck=str(tmp_path / "ck"))
    assert r.returncode == 0, r.stderr[-2000:]
    got = _read_sorted(os.path.join(out, "components"))

    # union-find oracle
    df = pq.read_table(edges_path).to_pandas()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(df["src"], df["dst"]):
        parent[find(int(s))] = find(int(d))
    comp: dict = {}
    for v in parent:
        comp.setdefault(find(v), []).append(v)
    exp = {}
    for members in comp.values():
        label = min(members)
        for v in members:
            exp[v] = label
    exp_df = pd.DataFrame(
        sorted(exp.items()), columns=["vertex_id", "component_id"]
    )
    got2 = got.sort_values("vertex_id").reset_index(drop=True)
    assert got2["vertex_id"].tolist() == exp_df["vertex_id"].tolist()
    assert got2["component_id"].tolist() == exp_df["component_id"].tolist()


def test_triangles_job(tmp_path):
    # K4: every vertex in 3 triangles
    edges_path = str(tmp_path / "edges.parquet")
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    pq.write_table(
        pa.table({"src": pa.array([a for a, _ in pairs], pa.int64()),
                  "dst": pa.array([b for _, b in pairs], pa.int64())}),
        edges_path,
    )
    out = str(tmp_path / "out")
    r = _run_job("triangles", edges_path, out)
    assert r.returncode == 0, r.stderr[-2000:]
    got = _read_sorted(os.path.join(out, "triangles"))
    assert got["vertex_id"].tolist() == [0, 1, 2, 3]
    assert got["n_triangles"].tolist() == [3, 3, 3, 3]


def test_ktruss_and_edge_jaccard_jobs(tmp_path):
    """Fresh-process job smoke for the edge-scale sinks: the ktruss /
    edge_jaccard subcommands write the core Datasets as parquet (no driver
    materialization) and match the in-process cores."""
    edges_path = _edges(tmp_path, seed=5, n=30, m=200)

    out_t = str(tmp_path / "out_truss")
    env = dict(os.environ, RAY_GRAFT_CPUS="4")
    env.pop("RAY_ADDRESS", None)
    r = subprocess.run(
        [sys.executable, JOB, "ktruss", "--edges", edges_path,
         "--out", out_t, "--truss-k", "3"],
        env=env, capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["algo"] == "ktruss"
    truss = _read_sorted(os.path.join(out_t, "ktruss"))
    assert len(truss) > 0
    truss = truss[sorted(truss.columns)].sort_values(
        sorted(truss.columns)).reset_index(drop=True)

    out_j = str(tmp_path / "out_jac")
    r = _run_job("edge_jaccard", edges_path, out_j)
    assert r.returncode == 0, r.stderr[-2000:]
    jac = _read_sorted(os.path.join(out_j, "edge_jaccard"))
    assert set(jac.columns) == {"src", "dst", "common_neighbors",
                                "deg_src", "deg_dst", "jaccard"}
    jac = jac[sorted(jac.columns)].sort_values(
        sorted(jac.columns)).reset_index(drop=True)

    # parity with the in-process cores on the same edges
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR", ignore_reinit_error=True)
    from graphminingtools_ray.pipelines.linkpred import (
        edge_jaccard_dataset,
        k_truss,
    )

    edges = rd.read_parquet(edges_path)
    want_truss, _ = k_truss(edges, k=3)
    want_truss = want_truss.to_pandas()
    want_truss = want_truss[sorted(want_truss.columns)].sort_values(
        list(sorted(want_truss.columns))).reset_index(drop=True)
    assert truss.equals(want_truss)
    want_jac = edge_jaccard_dataset(edges).to_pandas()
    want_jac = want_jac[sorted(want_jac.columns)].sort_values(
        sorted(want_jac.columns)).reset_index(drop=True)
    assert jac.equals(want_jac)
