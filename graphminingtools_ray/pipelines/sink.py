"""Resumable parquet sink for the ingest pipeline.

Output layout (one directory per logical table, parquet part files inside,
manifest written LAST so partial runs are never mistaken for complete):

    <out_dir>/files/*.parquet      per (file, commit) rows + sha256
    <out_dir>/vertices/*.parquet
    <out_dir>/edges/*.parquet
    <out_dir>/MANIFEST.json        {input_digest, tables, row_counts}

A rerun with the same input digest skips everything (resume == skip
finished work); a different digest rebuilds into a temp dir and atomically
renames. This is the batch-pipeline meaning of "resumable from checkpoint"
for the ingest path (superstep state has its own manager in state/).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import ray.data as rd

from ..graph.build import corpus_ingest


def _digest_of_input(path: str) -> str:
    st = os.stat(path)
    return hashlib.blake2b(
        f"{os.path.abspath(path)}:{st.st_size}:{int(st.st_mtime)}".encode(),
        digest_size=16,
    ).hexdigest()


def ingest_to_parquet(corpus_parquet: str, out_dir: str, **ingest_kwargs) -> dict:
    """Run corpus ingest and persist files/vertices/edges; skip if the
    manifest already records this input. Returns the manifest dict."""
    digest = _digest_of_input(corpus_parquet)
    manifest_path = os.path.join(out_dir, "MANIFEST.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("input_digest") == digest:
            return m  # complete output for this input — nothing to do

    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    out = corpus_ingest(rd.read_parquet(corpus_parquet), **ingest_kwargs)
    counts = {}
    for name in ["files", "vertices", "edges"]:
        d = os.path.join(tmp, name)
        out[name].write_parquet(d)
        counts[name] = rd.read_parquet(d).count()

    manifest = {"input_digest": digest, "tables": list(counts), "row_counts": counts}
    with open(os.path.join(tmp, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.rename(tmp, out_dir)
    return manifest
