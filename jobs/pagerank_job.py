#!/usr/bin/env python
"""PageRank job — the ``ray job submit`` entry point for the north-star
pipeline (BASELINE.json: "resumable from checkpoint with per-partition
lineage + metrics, run via ray job submit").

    ray job submit -- python jobs/pagerank_job.py \
        --edges /data/edges_parquet_dir --checkpoint-dir /data/ck \
        --out /data/ranks

A killed submission re-run with the same arguments resumes from the last
completed superstep (state/checkpoint.py lineage manifests). Metrics
(per-superstep seconds, edges/s, delta) are written next to the output.

GRAFT_KILL_AFTER_ITER (test hook): hard-exit the process after superstep k
completes, simulating a mid-job crash for the resume test.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True, help="parquet dir/file with src,dst[,weight]")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--out", required=True, help="output dir for ranks parquet + metrics")
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--symmetrize", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "0")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import importlib

    pr_mod = importlib.import_module("graphminingtools_ray.algos.pagerank")
    from graphminingtools_ray.context import configure
    from graphminingtools_ray.graph.build import symmetrize

    configure()

    kill_after = int(os.environ.get("GRAFT_KILL_AFTER_ITER", "-1"))
    if kill_after >= 0:
        orig_commit = pr_mod.PartitionedCheckpoint.commit

        def killing_commit(self, iteration, *a, **kw):
            orig_commit(self, iteration, *a, **kw)
            if iteration >= kill_after:
                os._exit(1)  # simulated crash AFTER the checkpoint landed

        pr_mod.PartitionedCheckpoint.commit = killing_commit

    edges = rd.read_parquet(args.edges)
    if args.symmetrize:
        edges = symmetrize(edges)
    ids, ranks, info = pr_mod.pagerank(
        edges,
        damping=args.damping,
        tol=args.tol,
        max_iter=args.max_iter,
        checkpoint_dir=args.checkpoint_dir,
    )

    os.makedirs(args.out, exist_ok=True)
    rd.from_arrow(pa.table({"vertex_id": ids, "rank": ranks})).write_parquet(
        os.path.join(args.out, "ranks")
    )
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(info, f, default=float)
    print(json.dumps({
        "converged": info.get("converged"),
        "iterations": info.get("iterations"),
        "resumed_from": info.get("resumed_from"),
        "n_vertices": info.get("n_vertices"),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
