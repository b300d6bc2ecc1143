"""Sampled-source betweenness centrality (Brandes 2001, exact per source).

For each source s in the sample: forward BFS levels give dist and the
shortest-path counts sigma (sigma(v) = sum of sigma(u) over in-neighbors u
one level closer); the backward sweep accumulates dependencies
delta(v) = sum over out-neighbors w one level farther of
sigma(v)/sigma(w) * (1 + delta(w)); BC(v) += delta(v) for v != s. Over the
full source set this is exact betweenness; over a sample it is the
standard unbiased estimator (Brandes & Pich 2007).

Substrate mapping (same pinned 2D-grid cells as PageRank/CC/LPA):
- dist comes from algos.sssp (min-plus relaxation, exact int lattice);
- each sigma level ℓ is ONE panel exchange: cells emit
  Σ sigma[src]·[dist(src)=ℓ−1] per dst, updates set sigma at dist=ℓ;
- each delta level ℓ (descending) is one exchange of
  Σ (1+delta[src])/sigma[src]·[dist(src)=ℓ+1] per dst — the symmetric edge
  view makes the "out-neighbor one level farther" sum readable from the
  SRC side, and the update multiplies by the dst's own sigma;
- panels flatten in canonical block_id order (the PageRank discipline), so
  the float accumulation is bit-deterministic run-to-run.

sigma/delta are float64 (path counts grow exponentially with distance —
the standard practice; exact as ints up to 2^53). Per source the cost is
2·ecc(s) supersteps; state handles carry separate (dist, sigma, delta)
per-part vectors through one handles dict.

Reference: no betweenness in the reference; this is the link-graph-tier
centrality member next to PageRank/harmonic. Oracle: pure-Python Brandes
in tests (no SQL twin — the fractional delta sums are not reproducible
order-free in SQL within hash tolerance).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .partitioned import (
    build_partitioned_graph,
    flatten_float_panels,
    index_state,
    init_state,
    state_to_arrays,
    unpack_panel_layout,
    unpack_part_block,
    _row_lists,
)
from .sssp import _INF, sssp_hops_partitioned


@ray.remote
def _level_cell(block: pa.Table, layout: pa.Table, h: dict, level: int,
                mode: str, out_parts: list[int]):
    """One sigma or delta level: per-dst sums of the masked src quantity.
    mode='sigma': per_edge = sigma[src]·[dist(src) = level−1];
    mode='delta': per_edge = (1+delta[src])/sigma[src]·[dist(src) = level+1]
    (sigma>0 wherever dist is finite, so the division is safe under the
    mask)."""
    cache: dict[int, np.ndarray] = {}
    by_part = {p: ([], [], []) for p in out_parts}
    for row in range(block.num_rows):
        part, srcs, src_index, dst_unique, dst_index, _ = unpack_part_block(
            block, row
        )
        src_pos, panel_parts, offsets, dst_local = unpack_panel_layout(
            layout, row
        )
        if not len(panel_parts):
            continue
        if part not in cache:
            dref, drow = h["dist"][part]
            (dist_p,) = _row_lists(ray.get(dref), drow, ["values"])
            sref, srow_ = h["sigma"][part]
            (sigma_p,) = _row_lists(ray.get(sref), srow_, ["values"])
            if mode == "sigma":
                q = np.where(dist_p == level - 1, sigma_p, 0.0)
            else:
                eref, erow = h["delta"][part]
                (delta_p,) = _row_lists(ray.get(eref), erow, ["values"])
                mask = dist_p == level + 1
                q = np.where(
                    mask, (1.0 + delta_p) / np.where(mask, sigma_p, 1.0), 0.0
                )
            cache[part] = q
        q = cache[part]
        per_edge = q[src_pos][src_index]
        partial = np.bincount(
            dst_index, weights=per_edge, minlength=len(dst_local)
        )
        block_id = int(block["block_id"][row].as_py())
        bids, dl, pl = by_part[int(panel_parts[0])]
        bids.append(block_id)
        dl.append(dst_local)
        pl.append(partial)
    out = []
    for p in out_parts:
        bids, dl, pl = by_part[p]
        out.append(pa.table(
            {
                "block_id": pa.array(bids, pa.int64()),
                "dst": pa.array(dl, pa.list_(pa.int32())),
                "partial": pa.array(pl, pa.list_(pa.float64())),
            }
        ))
    return out[0] if len(out) == 1 else tuple(out)


@ray.remote(num_returns=2)
def _sigma_update(h: dict, part: int, level: int, *panels: pa.Table):
    """sigma(v at dist=level) = incoming path-count sum; counts newly-set
    vertices (0 ⇒ the level past the eccentricity)."""
    dref, drow = h["dist"][part]
    (dist_p,) = _row_lists(ray.get(dref), drow, ["values"])
    sref, srow_ = h["sigma"][part]
    (sigma_old,) = _row_lists(ray.get(sref), srow_, ["values"])
    incoming = flatten_float_panels(panels, len(sigma_old))
    at_level = dist_p == level
    new_sigma = np.where(at_level, incoming, sigma_old)
    n_set = int(np.count_nonzero(at_level))
    return pa.table(
        {"part": pa.array([part], pa.int64()),
         "values": pa.array([new_sigma], pa.list_(pa.float64()))}
    ), n_set


@ray.remote
def _delta_update(h: dict, part: int, level: int, *panels: pa.Table):
    """delta(v at dist=level) = sigma(v) · incoming dependency sum."""
    dref, drow = h["dist"][part]
    (dist_p,) = _row_lists(ray.get(dref), drow, ["values"])
    sref, srow_ = h["sigma"][part]
    (sigma_p,) = _row_lists(ray.get(sref), srow_, ["values"])
    eref, erow = h["delta"][part]
    (delta_old,) = _row_lists(ray.get(eref), erow, ["values"])
    incoming = flatten_float_panels(panels, len(delta_old))
    at_level = dist_p == level
    new_delta = np.where(at_level, sigma_p * incoming, delta_old)
    return pa.table(
        {"part": pa.array([part], pa.int64()),
         "values": pa.array([new_delta], pa.list_(pa.float64()))}
    )


@ray.remote
def _max_finite_dist(block: pa.Table, row: int) -> int:
    # the block ref arg is auto-dereffed by Ray at task entry
    (dist_p,) = _row_lists(block, row, ["values"])
    finite = dist_p[dist_p < _INF]
    return int(finite.max()) if len(finite) else 0


@ray.remote
def _bc_accumulate(h: dict, part: int, source: int):
    """bc += delta for every vertex except the source."""
    bref, brow = h["bc"][part]
    (bc_old,) = _row_lists(ray.get(bref), brow, ["values"])
    eref, erow = h["delta"][part]
    (delta_p,) = _row_lists(ray.get(eref), erow, ["values"])
    iref, irow = h["ids"][part]
    (ids_p,) = _row_lists(ray.get(iref), irow, ["ids"])
    new_bc = bc_old + np.where(ids_p == source, 0.0, delta_p)
    return pa.table(
        {"part": pa.array([part], pa.int64()),
         "values": pa.array([new_bc], pa.list_(pa.float64()))}
    )


def _exchange(g, handles_ref, level, mode, parts_sorted):
    panel_refs: dict[int, list] = {p: [] for p in parts_sorted}
    for bref, lref, dst_parts, _bid in g.panel_blocks:
        refs = _level_cell.options(num_returns=len(dst_parts)).remote(
            bref, lref, handles_ref, level, mode, dst_parts
        )
        if len(dst_parts) == 1:
            refs = [refs]
        for p, r in zip(dst_parts, refs):
            panel_refs[p].append(r)
    return panel_refs


def brandes_forward(
    edges_symmetric: rd.Dataset,
    source: int | None = None,
    num_state_partitions: int = 8,
    graph=None,
):
    """-> (ids, dist, sigma, info): the FORWARD half of one Brandes source
    sweep — exact BFS hop distances (-1 unreached) plus exact
    shortest-path counts sigma (0 unreached). sigma is an INTEGER path
    count, so unlike the fractional backward dependencies it has an
    order-free SQL twin (level-unrolled sums over the final dist table) —
    this is the driver-gate-certifiable half of betweenness_sampled; the
    fractional delta sweep stays pytest-oracled. The float64 level
    accumulator is exact below 2^53; raises if a count exceeds it."""
    g = graph if graph is not None else build_partitioned_graph(
        edges_symmetric, P=num_state_partitions)
    if g.n_vertices == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64), {"supersteps": 0})

    parts_sorted = list(g.parts)
    dist_state, _, dinfo = sssp_hops_partitioned(
        edges_symmetric, source=source, graph=g,
        num_state_partitions=num_state_partitions,
    )
    s = int(dinfo["source"])
    dist_index, _ = index_state(dist_state)
    _, sigma_index, _ = init_state(
        g, lambda part, ids, outdeg: np.where(ids == s, 1.0, 0.0),
        pa.float64()
    )
    max_level = max(ray.get([
        _max_finite_dist.remote(dist_index[p][0], dist_index[p][1])
        for p in parts_sorted
    ]))
    n_supersteps = dinfo["iterations"]
    for level in range(1, max_level + 1):
        handles_ref = ray.put({"dist": dist_index, "sigma": sigma_index})
        panel_refs = _exchange(g, handles_ref, level, "sigma", parts_sorted)
        rows, sets = {}, {}
        for p in parts_sorted:
            rows[p], sets[p] = _sigma_update.remote(
                handles_ref, p, level, *panel_refs[p]
            )
        ray.get([sets[p] for p in parts_sorted])
        sigma_index = {p: (rows[p], 0) for p in parts_sorted}
        n_supersteps += 1

    ids, dist = state_to_arrays(dist_state, g)
    sigma_ds = rd.from_arrow_refs(
        [sigma_index[p][0] for p in parts_sorted])
    ids2, sigma_f = state_to_arrays(sigma_ds, g)
    assert np.array_equal(ids, ids2)
    if len(sigma_f) and float(np.max(sigma_f)) >= 2.0 ** 53:
        raise ValueError("sigma exceeds the float64 exact-integer bound")
    dist_out = np.where(dist >= _INF, -1, dist).astype(np.int64)
    sigma = sigma_f.astype(np.int64)
    info = {"source": s, "supersteps": n_supersteps,
            "max_level": int(max_level)}
    return ids, dist_out, sigma, info


def betweenness_sampled(
    edges_symmetric: rd.Dataset,
    sources: np.ndarray,
    num_state_partitions: int = 8,
    graph=None,
):
    """-> (vertex_ids, bc, info): exact per-source Brandes dependencies
    summed over ``sources`` (the sampled-source estimator; pass every
    vertex for exact betweenness). ``edges_symmetric`` must contain both
    half-edges; bc counts each unordered pair's paths twice on undirected
    graphs (the directed-sum convention — halve for the undirected value).
    """
    sources = [int(s) for s in sources]
    g = graph if graph is not None else build_partitioned_graph(
        edges_symmetric, P=num_state_partitions)
    if g.n_vertices == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64), {
            "sources": sources, "supersteps": 0}

    parts_sorted = list(g.parts)
    bc_ds, bc_index, _ = init_state(
        g, lambda part, ids, outdeg: np.zeros(len(ids)), pa.float64()
    )
    n_supersteps = 0
    for s in sources:
        dist_state, _, dinfo = sssp_hops_partitioned(
            edges_symmetric, source=s, graph=g,
            num_state_partitions=num_state_partitions,
        )
        dist_index, _ = index_state(dist_state)
        n_supersteps += dinfo["iterations"]

        _, sigma_index, _ = init_state(
            g, lambda part, ids, outdeg: np.where(
                ids == s, 1.0, 0.0), pa.float64()
        )
        # forward sigma levels 1..ecc(s) (the eccentricity comes from the
        # per-part dist maxima — P scalar tasks, no probe exchange)
        max_level = max(ray.get([
            _max_finite_dist.remote(dist_index[p][0], dist_index[p][1])
            for p in parts_sorted
        ]))
        for level in range(1, max_level + 1):
            handles_ref = ray.put({"dist": dist_index, "sigma": sigma_index})
            panel_refs = _exchange(g, handles_ref, level, "sigma",
                                   parts_sorted)
            rows, sets = {}, {}
            for p in parts_sorted:
                rows[p], sets[p] = _sigma_update.remote(
                    handles_ref, p, level, *panel_refs[p]
                )
            ray.get([sets[p] for p in parts_sorted])
            sigma_index = {p: (rows[p], 0) for p in parts_sorted}
            n_supersteps += 1

        _, delta_index, _ = init_state(
            g, lambda part, ids, outdeg: np.zeros(len(ids)), pa.float64()
        )
        for level in range(max_level - 1, -1, -1):
            handles_ref = ray.put({"dist": dist_index, "sigma": sigma_index,
                                   "delta": delta_index})
            panel_refs = _exchange(g, handles_ref, level, "delta",
                                   parts_sorted)
            rows = {}
            for p in parts_sorted:
                rows[p] = _delta_update.remote(
                    handles_ref, p, level, *panel_refs[p]
                )
            # sync per level (matches the sigma loop): cells deref the
            # previous level's update rows inside the task, and submitting
            # the whole descending chain un-synced measured a one-time
            # ~160 s scheduler stall on cold workers
            ray.wait(list(rows.values()), num_returns=len(rows))
            delta_index = {p: (rows[p], 0) for p in parts_sorted}
            n_supersteps += 1

        handles_ref = ray.put({"bc": bc_index, "delta": delta_index,
                               "ids": g.static_index})
        rows = {}
        for p in parts_sorted:
            rows[p] = _bc_accumulate.remote(handles_ref, p, s)
        bc_index = {p: (rows[p], 0) for p in parts_sorted}

    bc_ds = rd.from_arrow_refs([bc_index[p][0] for p in parts_sorted])
    ids, bc = state_to_arrays(bc_ds, g)
    info = {"sources": sources, "supersteps": n_supersteps}
    return ids, bc, info
