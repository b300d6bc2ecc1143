"""Per-superstep checkpoint / resume (BASELINE.md "Checkpoint/resume" row).

The reference has no in-process checkpointing; its level-granular flushed
mining output is a de facto checkpoint (``/root/reference/
lwm_miningAndExtension.c:283-286``). We make that explicit: after every
superstep the vertex-state vector is written as hash-partitioned parquet
shards, each shard carrying lineage ``(partition_id, iteration,
input_digest)``, and a manifest is renamed into place LAST so a partially
written iteration is never visible. A killed run resumes from the highest
iteration whose manifest exists and whose ``input_digest`` matches the
current input.

Layout:
    <dir>/iter=<K>/part-<p>.parquet     vertex_id, value (+ lineage in file metadata)
    <dir>/iter=<K>/MANIFEST.json        {iteration, input_digest, parts, meta}
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _part_of(vertex_ids: np.ndarray, num_partitions: int) -> np.ndarray:
    # multiplicative (Fibonacci) hashing — stable, avoids modulo patterns in ids
    h = (vertex_ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
    return (h % np.uint64(num_partitions)).astype(np.int64)


class CheckpointManager:
    def __init__(self, root: str, input_digest: str, num_partitions: int = 8):
        self.root = root
        self.input_digest = input_digest
        self.num_partitions = num_partitions
        os.makedirs(root, exist_ok=True)

    # -- write --------------------------------------------------------------
    def save(
        self,
        iteration: int,
        vertex_ids: np.ndarray,
        values: np.ndarray,
        meta: dict | None = None,
    ) -> None:
        final = os.path.join(self.root, f"iter={iteration}")
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        parts = _part_of(vertex_ids, self.num_partitions)
        written = []
        for p in range(self.num_partitions):
            m = parts == p
            if not m.any():
                continue
            t = pa.table({"vertex_id": vertex_ids[m], "value": values[m]})
            lineage = {
                b"partition_id": str(p).encode(),
                b"iteration": str(iteration).encode(),
                b"input_digest": self.input_digest.encode(),
            }
            t = t.replace_schema_metadata(lineage)
            pq.write_table(t, os.path.join(tmp, f"part-{p}.parquet"))
            written.append(p)
        manifest = {
            "iteration": iteration,
            "input_digest": self.input_digest,
            "parts": written,
            "num_partitions": self.num_partitions,
            "meta": meta or {},
        }
        with open(os.path.join(tmp, "MANIFEST.json"), "w") as f:
            json.dump(manifest, f)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)  # manifest becomes visible atomically

    # -- read ---------------------------------------------------------------
    def completed_iterations(self) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            if not name.startswith("iter=") or name.endswith(".tmp"):
                continue
            d = os.path.join(self.root, name)
            mf = os.path.join(d, "MANIFEST.json")
            if not os.path.exists(mf):
                continue
            with open(mf) as f:
                m = json.load(f)
            if m.get("input_digest") == self.input_digest:
                out.append(m["iteration"])
        return sorted(out)

    def load_latest(self):
        """-> (iteration, vertex_ids, values, meta) or None."""
        its = self.completed_iterations()
        if not its:
            return None
        it = its[-1]
        d = os.path.join(self.root, f"iter={it}")
        with open(os.path.join(d, "MANIFEST.json")) as f:
            m = json.load(f)
        tables = [
            pq.read_table(os.path.join(d, f"part-{p}.parquet"))
            for p in m["parts"]
        ]
        t = pa.concat_tables(tables)
        ids = t["vertex_id"].to_numpy()
        vals = t["value"].to_numpy()
        order = np.argsort(ids, kind="stable")
        return it, ids[order], vals[order], m.get("meta", {})
