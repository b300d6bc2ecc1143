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

Round-2 co-partitioned implementation (algos.partitioned): label state lives
as per-partition string rows in the object store; per pinned src-part block
we emit (part(dst), dst, src_label) message rows, ONE ``groupby(part)``
exchange, and the per-partition update builds every signature of its part in
one pandas pass — including the empty-neighbor signature for isolated
vertices, which the update sees because it walks the partition's full id
list, not just message keys. Nothing vertex-scale on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.bucketing import int_bucket, partition_group_combine
from .partitioned import (
    build_partitioned_graph,
    init_state,
    index_state,
    state_to_arrays,
    state_to_dataset,
    unpack_part_block,
    _row_lists,
)

_SENTINEL = -1


def wl_signature(own: str, neighbor_labels: list[str]) -> str:
    return f"{own}|{','.join(sorted(neighbor_labels))}"


def _make_msg_fn(handles_ref, P: int):
    def emit(batch: pa.Table) -> pa.Table:
        h = ray.get(handles_ref)
        cache: dict[int, tuple] = {}
        parts_out, dst_lists, label_lists = [], [], []
        for row in range(batch.num_rows):
            part, srcs, src_index, dst_unique, dst_index, _ = unpack_part_block(
                batch, row
            )
            if part not in cache:
                sref, srow = h["static"][part]
                (ids_p,) = _row_lists(ray.get(sref), srow, ["ids"])
                vref, vrow = h["state"][part]
                (labels_p,) = _row_lists(ray.get(vref), vrow, ["values"])
                cache[part] = (ids_p, labels_p)
            ids_p, labels_p = cache[part]
            sl = labels_p[np.searchsorted(ids_p, srcs)][src_index]
            d = dst_unique[dst_index]
            # panel rows per (sub-block, dst_part): the update re-sorts by
            # (dst, src_label), so only the grouping — not order — matters
            pk = int_bucket(d, P)
            order = np.argsort(pk, kind="stable")
            pk_s, d_s, sl_s = pk[order], d[order], sl[order]
            bounds = np.flatnonzero(np.diff(pk_s)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(pk_s)]))
            for a, b in zip(starts, ends):
                if a == b:
                    continue
                parts_out.append(int(pk_s[a]))
                dst_lists.append(d_s[a:b])
                label_lists.append(sl_s[a:b].tolist())
        return pa.table(
            {
                "part": pa.array(parts_out, pa.int64()),
                "dst": pa.array(dst_lists, pa.list_(pa.int64())),
                "src_label": pa.array(label_lists, pa.list_(pa.string())),
            }
        )

    return emit


def _make_update_fn(handles_ref):
    def update(t: pa.Table) -> pa.Table:
        h = ray.get(handles_ref)
        part = int(t["part"][0].as_py())
        sref, srow = h["static"][part]
        (ids_p,) = _row_lists(ray.get(sref), srow, ["ids"])
        vref, vrow = h["state"][part]
        (labels_old,) = _row_lists(ray.get(vref), vrow, ["values"])
        import pyarrow.compute as pc

        dst = pc.list_flatten(t["dst"].combine_chunks()).to_numpy(
            zero_copy_only=False
        )
        labels_flat = pc.list_flatten(t["src_label"].combine_chunks())
        df = pd.DataFrame(
            {"dst": dst, "src_label": np.asarray(labels_flat.to_pylist(), object)}
        )
        df = df.sort_values(["dst", "src_label"], kind="stable")
        joined = df.groupby("dst", sort=True)["src_label"].agg(",".join)
        neigh = np.full(len(ids_p), "", dtype=object)
        if len(joined):
            neigh[np.searchsorted(ids_p, joined.index.to_numpy())] = joined.to_numpy()
        new_labels = [
            hashlib.md5(f"{o}|{ns}".encode()).hexdigest()
            for o, ns in zip(labels_old, neigh)
        ]
        return pa.table(
            {
                "part": pa.array([part], pa.int64()),
                "values": pa.array([new_labels], pa.list_(pa.string())),
            }
        )

    return update


def wl_relabel_partitioned(
    edges_symmetric: rd.Dataset,
    iterations: int = 1,
    init_labels: tuple[np.ndarray, np.ndarray] | None = None,
    num_state_partitions: int = 8,
    graph=None,
):
    """Core loop. -> (state_ds, graph, info)."""
    g = graph if graph is not None else build_partitioned_graph(
        edges_symmetric, P=num_state_partitions
    )
    if g.n_vertices == 0:
        return None, g, {"iterations": 0}

    if init_labels is None:
        make_values = lambda part, ids, outdeg: np.array(
            [str(v) for v in ids], dtype=object
        )
    else:
        init_ids = np.asarray(init_labels[0], dtype=np.int64)
        init_vals = np.asarray(init_labels[1], dtype=object)
        order = np.argsort(init_ids, kind="stable")
        init_ids, init_vals = init_ids[order], init_vals[order]
        iref = ray.put((init_ids, init_vals))

        def make_values(part, ids, outdeg):
            si, sv = ray.get(iref)
            out = np.array([str(v) for v in ids], dtype=object)
            pos = np.searchsorted(si, ids)
            pos_ok = (pos < len(si))
            hit = np.zeros(len(ids), dtype=bool)
            hit[pos_ok] = si[pos[pos_ok]] == ids[pos_ok]
            out[hit] = sv[pos[hit]]
            return out

    state_ds, state_index, _ = init_state(g, make_values, pa.string())

    # seed with matching PANEL schema (part, dst list, src_label list)
    k = len(g.parts)
    seed = rd.from_arrow(
        pa.table(
            {
                "part": pa.array(g.parts, pa.int64()),
                "dst": pa.array([[]] * k, pa.list_(pa.int64())),
                "src_label": pa.array([[]] * k, pa.list_(pa.string())),
            }
        )
    )

    for _ in range(iterations):
        handles_ref = ray.put({"static": g.static_index, "state": state_index})
        msgs = g.blocks.map_batches(
            _make_msg_fn(handles_ref, g.P), batch_format="pyarrow"
        )
        new_state = partition_group_combine(
            msgs.union(seed), "part", g.P, _make_update_fn(handles_ref)
        ).materialize()
        state_index, _ = index_state(new_state, [])
        state_ds = new_state

    return state_ds, g, {"iterations": iterations}


def wl_relabel(
    edges_symmetric: rd.Dataset,
    iterations: int = 1,
    init_labels: tuple[np.ndarray, np.ndarray] | None = None,
    graph=None,
):
    """-> (vertex_ids, labels: np.ndarray[object of str hex], info).

    ``init_labels`` is (ids, labels) aligned arrays; default initial label is
    ``str(vertex_id)`` (matches the SQL oracle's ``CAST(v AS VARCHAR)``).
    numpy result delivery over the distributed loop.
    """
    state_ds, g, info = wl_relabel_partitioned(
        edges_symmetric, iterations, init_labels, graph=graph
    )
    if state_ds is None:
        return np.empty(0, np.int64), np.empty(0, dtype=object), info
    ids, labels = state_to_arrays(state_ds, g)
    return ids, np.asarray(labels, dtype=object), info


def wl_relabel_dataset(edges_symmetric: rd.Dataset, **kw):
    """Streaming result: Dataset of (vertex_id, label)."""
    state_ds, g, info = wl_relabel_partitioned(edges_symmetric, **kw)
    if state_ds is None:
        return rd.from_arrow(
            pa.table({"vertex_id": pa.array([], pa.int64()),
                      "label": pa.array([], pa.string())})
        ), info
    return state_to_dataset(state_ds, g, "label"), info
