#!/usr/bin/env python
"""Unified link-graph job — the ``ray job submit`` entry point for the
remaining north-star algorithms (BASELINE.json names all four: PageRank —
see jobs/pagerank_job.py — plus connected components, label propagation and
triangle counting, "resumable from checkpoint with per-partition lineage +
metrics, run via ray job submit").

    ray job submit -- python jobs/graph_job.py cc \
        --edges /data/edges --checkpoint-dir /data/ck --out /data/components
    ray job submit -- python jobs/graph_job.py lpa \
        --edges /data/edges --checkpoint-dir /data/ck --out /data/labels
    ray job submit -- python jobs/graph_job.py triangles \
        --edges /data/edges --out /data/triangles
    ray job submit -- python jobs/graph_job.py kcore --k 3 \
        --edges /data/edges --checkpoint-dir /data/ck --out /data/kcore
    ray job submit -- python jobs/graph_job.py sssp --source 0 \
        --edges /data/edges --checkpoint-dir /data/ck --out /data/hops
    ray job submit -- python jobs/graph_job.py walks --length 4 \
        --symmetrize --edges /data/edges --checkpoint-dir /data/ck \
        --out /data/walks
    ray job submit -- python jobs/graph_job.py ktruss --truss-k 10 \
        --edges /data/edges --out /data/ktruss
    ray job submit -- python jobs/graph_job.py edge_jaccard \
        --edges /data/edges --out /data/edge_jaccard

cc / lpa / kcore / sssp run on the 2D-grid superstep substrate
(walks checkpoint per STEP — graph/walks.random_walks_checkpointed): a killed
submission re-run with the same arguments resumes from the last completed
superstep (state/checkpoint.py lineage manifests, keyed by the graph
digest — sssp checkpoints of different sources need different dirs).
triangles is a single streaming pass (no iterative state to checkpoint);
its output parquet is the resumable artifact. Metrics (per-superstep
seconds, changed counts) land next to the output as metrics.json.

GRAFT_KILL_AFTER_ITER (test hook): hard-exit after superstep k's
checkpoint commits, simulating a mid-job crash for the resume test.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("algo", choices=["cc", "lpa", "triangles", "kcore",
                                     "sssp", "walks", "ktruss",
                                     "edge_jaccard"])
    ap.add_argument("--truss-k", type=int, default=10,
                    help="ktruss: minimum per-edge support + 2")
    ap.add_argument("--length", type=int, default=4,
                    help="walks: steps per walk")
    ap.add_argument("--weighted", action="store_true",
                    help="walks: weight-proportional transitions")
    ap.add_argument("--node2vec", action="store_true",
                    help="walks: second-order biased transitions")
    ap.add_argument("--k", type=int, default=3, help="kcore: the k")
    ap.add_argument("--source", type=int, default=None,
                    help="sssp: source vertex (default: min id)")
    ap.add_argument("--edges", required=True,
                    help="parquet dir/file with src,dst[,weight]")
    ap.add_argument("--out", required=True,
                    help="output dir for result parquet + metrics")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="cc/lpa: superstep checkpoint/lineage root")
    ap.add_argument("--max-iter", type=int, default=0,
                    help="0 = per-algo default (cc 200, lpa 20)")
    ap.add_argument("--symmetrize", action="store_true",
                    help="input has one half-edge per undirected edge")
    ap.add_argument("--num-state-partitions", type=int, default=8)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "0")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False,
              "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)

    import importlib

    import pyarrow as pa  # noqa: F401  (used by the dataset sinks)
    import ray.data as rd

    from graphminingtools_ray.context import configure
    from graphminingtools_ray.graph.build import symmetrize

    configure()

    kill_after = int(os.environ.get("GRAFT_KILL_AFTER_ITER", "-1"))
    if kill_after >= 0:
        pmod = importlib.import_module("graphminingtools_ray.algos.partitioned")
        orig_commit = pmod.PartitionedCheckpoint.commit

        def killing_commit(self, iteration, *a, **kw2):
            orig_commit(self, iteration, *a, **kw2)
            if iteration >= kill_after:
                os._exit(1)  # simulated crash AFTER the checkpoint landed

        pmod.PartitionedCheckpoint.commit = killing_commit

    edges = rd.read_parquet(args.edges)
    os.makedirs(args.out, exist_ok=True)
    info: dict = {}

    def sink(ds, name: str) -> None:
        # parquet writes never overwrite: a re-run (the advertised
        # resume workflow) into a dirty output dir would duplicate rows.
        # Write to a tmp dir, and only after the write fully lands remove
        # the previous committed output and rename into place — a crash
        # mid-write leaves the old committed output intact.
        import shutil

        final = os.path.join(args.out, name)
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        ds.write_parquet(tmp)
        # an empty Dataset writes no files (and possibly no dir): an empty
        # committed output dir is still a valid, resumable result
        os.makedirs(tmp, exist_ok=True)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)

    if args.algo == "walks":
        # resumable walk corpus: per-step parquet + manifest-last commit
        # under --checkpoint-dir (required); a killed submission re-run
        # with the same args resumes after the last committed step
        from graphminingtools_ray.graph.walks import random_walks_checkpointed

        if not args.checkpoint_dir:
            ap.error("walks requires --checkpoint-dir")
        if args.symmetrize:
            edges = symmetrize(edges)
        corpus = random_walks_checkpointed(
            edges, args.checkpoint_dir, length=args.length,
            weighted=args.weighted, node2vec=args.node2vec,
        )
        sink(corpus, "walks")
        summary = {"algo": "walks", "length": args.length}
    elif args.algo == "triangles":
        from graphminingtools_ray.algos.triangles import triangle_counts_dataset

        counts = triangle_counts_dataset(edges)
        sink(counts, "triangles")
        summary = {"algo": "triangles"}
    elif args.algo == "ktruss":
        # edge-scale output parquet-sinked directly from the Dataset the
        # core returns — the gate wrapper's to_pandas() is gate-scale only
        # (both cores build the simple undirected graph themselves, so the
        # input may carry one or both half-edges)
        from graphminingtools_ray.pipelines.linkpred import k_truss

        out_ds, info = k_truss(edges, k=args.truss_k)
        sink(out_ds, "ktruss")
        summary = {"algo": "ktruss", "k": args.truss_k,
                   "n_edges": info.get("n_edges")}
    elif args.algo == "edge_jaccard":
        from graphminingtools_ray.pipelines.linkpred import (
            edge_jaccard_dataset,
        )

        sink(edge_jaccard_dataset(edges), "edge_jaccard")
        summary = {"algo": "edge_jaccard"}
    else:
        if args.symmetrize:
            edges = symmetrize(edges)
        if args.algo == "cc":
            from graphminingtools_ray.algos.components import (
                connected_components_dataset,
            )

            out_ds, info = connected_components_dataset(
                edges,
                max_iter=args.max_iter or 200,
                checkpoint_dir=args.checkpoint_dir,
                num_state_partitions=args.num_state_partitions,
            )
            sink(out_ds, "components")
        elif args.algo == "kcore":
            from graphminingtools_ray.algos.kcore import k_core_dataset

            out_ds, info = k_core_dataset(
                edges,
                k=args.k,
                max_iter=args.max_iter or 200,
                num_state_partitions=args.num_state_partitions,
                checkpoint_dir=args.checkpoint_dir,
            )
            sink(out_ds, "kcore")
        elif args.algo == "sssp":
            from graphminingtools_ray.algos.sssp import sssp_hops_dataset

            out_ds, info = sssp_hops_dataset(
                edges,
                source=args.source,
                max_iter=args.max_iter or 200,
                num_state_partitions=args.num_state_partitions,
                checkpoint_dir=args.checkpoint_dir,
            )
            sink(out_ds, "hops")
        else:
            from graphminingtools_ray.algos.labelprop import (
                label_propagation_dataset,
            )

            out_ds, info = label_propagation_dataset(
                edges,
                max_iter=args.max_iter or 20,
                checkpoint_dir=args.checkpoint_dir,
                num_state_partitions=args.num_state_partitions,
            )
            sink(out_ds, "labels")
        summary = {
            "algo": args.algo,
            "iterations": info.get("iterations"),
            "resumed_from": info.get("resumed_from"),
        }

    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(info, f, default=float)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
