"""Weisfeiler–Lehman relabeling / label propagation.

Reference semantics (``/root/reference/weisfeilerLehman.c:19-75``): one WL
iteration maps each vertex label to a compressed id of the signature
``(own label, sorted list of neighbor labels)``. The reference compresses
signatures to ids by trie insertion order — a serial artifact
(``searchTree.c:504``); we use ``md5(signature)`` instead so ids are
order-independent AND verifiable in SQL (DuckDB ``md5``), as designed in
SURVEY §2.11.

Signature string (identical on the engine and SQL sides):
    own_label || '|' || join(lexicographically_sorted(neighbor_labels), ',')
new label = md5 hex of the signature. Neighbor labels are a MULTISET over
distinct neighbors (the edge view must be a simple symmetric graph).

Implementation: per block, emit (dst, src_label) message rows (labels looked
up from the broadcast state); ``groupby(dst).map_groups`` computes the
signature per vertex. Vertices with no incoming edges hash the empty
neighbor list.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..graph.csr import build_csr_blocks, unpack_block
from .common import broadcast_state, collect_vertex_ids


def wl_signature(own: str, neighbor_labels: list[str]) -> str:
    return f"{own}|{','.join(sorted(neighbor_labels))}"


def _make_msg_fn(ids_ref, lab_ref):
    def emit(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        labels = ray.get(lab_ref)  # numpy object array of str, aligned to ids
        dsts, src_labels = [], []
        for row in range(batch.num_rows):
            srcs, src_index, dst_unique, dst_index, _ = unpack_block(batch, row)
            sl = labels[np.searchsorted(ids, srcs)][src_index]
            dsts.append(dst_unique[dst_index])
            src_labels.append(sl)
        if not dsts:
            return pa.table(
                {"dst": np.empty(0, np.int64), "src_label": pa.array([], pa.string())}
            )
        return pa.table(
            {
                "dst": np.concatenate(dsts),
                "src_label": pa.array(np.concatenate(src_labels).tolist(), pa.string()),
            }
        )

    return emit


def _make_sig_bucket(ids_ref, lab_ref):
    """Per-bucket combine: signatures for EVERY dst in the bucket in one
    pandas pass (sorted join + md5 per vertex) — no per-group dispatch."""

    def combine(t: pa.Table) -> pa.Table:
        import ray as _ray

        ids = _ray.get(ids_ref)
        labels = _ray.get(lab_ref)
        df = pd.DataFrame(
            {"dst": t["dst"].to_numpy(), "src_label": t["src_label"].to_pylist()}
        )
        df = df.sort_values(["dst", "src_label"], kind="stable")
        joined = df.groupby("dst", sort=True)["src_label"].agg(",".join)
        own = labels[np.searchsorted(ids, joined.index.to_numpy())]
        out_labels = [
            hashlib.md5(f"{o}|{ns}".encode()).hexdigest()
            for o, ns in zip(own, joined.to_numpy())
        ]
        return pa.table(
            {
                "vertex_id": joined.index.to_numpy(),
                "label": pa.array(out_labels, pa.string()),
            }
        )

    return combine


def wl_relabel(
    edges_symmetric: rd.Dataset,
    iterations: int = 1,
    init_labels: tuple[np.ndarray, np.ndarray] | None = None,
):
    """-> (vertex_ids, labels: np.ndarray[object of str hex], info).

    ``init_labels`` is (ids, labels) aligned arrays; default initial label is
    ``str(vertex_id)`` (matches the SQL oracle's ``CAST(v AS VARCHAR)``).
    """
    blocks = build_csr_blocks(edges_symmetric)
    ids = collect_vertex_ids(blocks)
    n = len(ids)
    if n == 0:
        return ids, np.empty(0, dtype=object), {"iterations": 0}

    if init_labels is None:
        labels = np.array([str(v) for v in ids], dtype=object)
    else:
        init_ids, init_vals = init_labels
        pos = np.searchsorted(ids, init_ids)
        labels = np.array([str(v) for v in ids], dtype=object)
        labels[pos] = np.asarray(init_vals, dtype=object)

    for _ in range(iterations):
        ids_ref, lab_ref = broadcast_state(ids, labels)
        msgs = blocks.map_batches(_make_msg_fn(ids_ref, lab_ref), batch_format="pyarrow")
        # hash-partitioned exchange keyed on dst; every dst's whole neighbor
        # multiset lands in one bucket
        from ..functions.bucketing import bucketed_group_combine

        sigs = bucketed_group_combine(
            msgs, ["dst"], _make_sig_bucket(ids_ref, lab_ref)
        )

        new_labels = np.empty(n, dtype=object)
        seen = np.zeros(n, dtype=bool)
        for b in sigs.iter_batches(batch_size=None, batch_format="pyarrow"):
            idx = np.searchsorted(ids, b["vertex_id"].to_numpy())
            new_labels[idx] = np.array(b["label"].to_pylist(), dtype=object)
            seen[idx] = True
        # isolated vertices: empty neighbor multiset
        for i in np.flatnonzero(~seen):
            new_labels[i] = hashlib.md5(
                wl_signature(labels[i], []).encode()
            ).hexdigest()
        labels = new_labels

    return ids, labels, {"iterations": iterations}
