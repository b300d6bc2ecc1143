#!/usr/bin/env python
"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "pagerank": {... per-superstep metrics ...}}

``--scaling``: runs this script twice in fresh processes (num_cpus=8 and 32)
on the same input and reports both throughputs plus scaling efficiency
(BASELINE.json two-cluster-size rule, sandbox stand-in).

This script OWNS its Ray session (unlike __ray_entry__).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_benchmarks(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from graphminingtools_ray.context import configure

    configure()

    from graphminingtools_ray.algos.components import connected_components
    from graphminingtools_ray.algos.pagerank import pagerank
    from graphminingtools_ray.algos.triangles import triangle_counts
    from graphminingtools_ray.algos.wl import wl_relabel
    from graphminingtools_ray.graph.build import copurchase_edges, symmetrize
    from graphminingtools_ray.pipelines import embeddings_q, relational, text_q

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # warm the OS page cache so we measure compute + shuffle, not cold disk
    import pyarrow.parquet as pq

    for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
        pq.read_table(os.path.join(sf_dir, f"{t}.parquet"))

    # derive the co-purchase link graph ONCE; all four graph algorithms share
    # the materialized edge table (the realistic pipeline shape)
    edges = timed(
        "edge_derivation", lambda: copurchase_edges(sf_dir).materialize()
    )
    sym = symmetrize(edges.drop_columns(["weight"]))

    _, _, pr_info = timed("pagerank", lambda: pagerank(sym, tol=1e-6, max_iter=60))

    def consume(res):
        # force full execution of lazy Datasets
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            return res.count()
        return len(res)

    timed(
        "connected_components",
        lambda: connected_components(
            symmetrize(edges.filter(expr="weight >= 2"))
        )[0].shape,
    )
    timed("triangles", lambda: triangle_counts(edges)[2])
    timed("wl_relabel_1", lambda: wl_relabel(sym, iterations=1)[0].shape)
    timed("q1_pricing_summary", lambda: consume(relational.q1_pricing_summary(sf_dir)))
    timed("events_hourly", lambda: consume(relational.events_hourly(sf_dir)))
    timed("sessionize", lambda: consume(relational.sessionize(sf_dir)))
    timed("dedup_exact", lambda: consume(text_q.dedup_exact(sf_dir)))
    timed("minhash_near_dup", lambda: consume(text_q.minhash_near_dup(sf_dir)))
    timed("word_freq_topk", lambda: consume(text_q.word_freq_topk(sf_dir)))
    timed("ann_topk", lambda: consume(embeddings_q.ann_topk(sf_dir)))

    ray.shutdown()

    supersteps = pr_info.get("supersteps", [])
    # steady-state edges/s/superstep: median over supersteps (first one pays
    # object-store warmup)
    eps = sorted(s["edges_per_sec"] for s in supersteps) if supersteps else [0.0]
    pr_metrics = {
        "iterations": pr_info.get("iterations"),
        "converged": pr_info.get("converged"),
        "n_vertices": pr_info.get("n_vertices"),
        "n_edges": pr_info.get("n_edges"),
        "median_edges_per_sec_per_superstep": round(eps[len(eps) // 2], 1),
        "mean_superstep_sec": round(
            sum(s["seconds"] for s in supersteps) / max(1, len(supersteps)), 4
        ),
    }
    return {
        "metric": "total seconds for headline pipelines (PageRank to 1e-6 over "
        "derived link graph, CC, triangles, WL, relational aggregates, dedup, ANN)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "pagerank": pr_metrics,
    }


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo = one(lo)
    r_hi = one(hi)
    # throughput = work/sec ∝ 1/value on the same input;
    # efficiency = (T_lo / T_hi) / (hi / lo); 1.0 = linear scaling
    speedup = r_lo["value"] / r_hi["value"]
    eff = speedup / (hi / lo)
    pr_lo = r_lo["pagerank"]["median_edges_per_sec_per_superstep"]
    pr_hi = r_hi["pagerank"]["median_edges_per_sec_per_superstep"]
    return {
        "metric": "scaling efficiency (num_cpus 8 vs 32, fresh processes, same input)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": sf_dir,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "speedup": round(speedup, 3),
        "pagerank_edges_per_sec_lo": pr_lo,
        "pagerank_edges_per_sec_hi": pr_hi,
        "pagerank_superstep_speedup": round(pr_hi / max(pr_lo, 1e-9), 3),
        "queries_lo": r_lo["queries"],
        "queries_hi": r_hi["queries"],
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_benchmarks(sf_dir, num_cpus)))
