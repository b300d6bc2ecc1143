"""Distributed synchronous label propagation (community LPA).

The north-star names label propagation as a first-class verb next to
PageRank / CC / triangles. This is the classic community-detection rule
(Raghavan, Albert & Kumara 2007, "Near linear time algorithm to detect
community structures in large-scale networks"): every vertex starts with
its own id as label; each superstep every vertex adopts the label that is
MOST FREQUENT among its neighbors' current labels, ties broken by the
SMALLEST label; stop when no label changes or after ``max_iter``
supersteps.  (Distinct from ``algos.wl`` — WL relabels by the full
multiset signature; LPA votes.)

Determinism: all vote math is exact int64 counting, the winner rule
(max count, then min label) is a total order, and the per-partition merge
is order-free (integer sums), so runs are bit-identical regardless of Ray
scheduling. ``include_self=True`` (default) adds one vote for the
vertex's own current label — the standard damping that prevents the
2-cycle label swap synchronous LPA exhibits on bipartite structures
(label-swap oscillation is why the loop is also bounded by ``max_iter``;
the reference rule itself does not guarantee synchronous convergence).

Distribution shape: identical to ``algos.components`` — the 2D-grid
co-partitioned substrate (``algos.partitioned``), one vote task per
pinned CSR cell (pre-combining counts per (dst, label) inside the cell,
so exchange entries are bounded by distinct (dst, label) pairs seen in
the cell, sub-edge scale), ONE hand-scheduled hash shuffle keyed on
part(dst), and a per-partition update task that merges votes and applies
the winner rule. Nothing vertex- or edge-scale touches the driver.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .partitioned import (
    PartitionedCheckpoint,
    build_partitioned_graph,
    init_state,
    state_to_arrays,
    state_to_dataset,
    unpack_panel_layout,
    unpack_part_block,
    _row_lists,
)


def _count_votes(dst_local: np.ndarray, labels: np.ndarray,
                 counts: np.ndarray | None = None):
    """Group-sum votes by (dst_local, label). Returns (dst, label, count)
    int64 arrays sorted by (dst, label).

    Fast path: when (dst, label) packs into one non-negative int64
    (dst_local is V/P-bounded and labels are vertex ids, so this holds for
    any graph whose max-id × V/P product fits 2^62 — e.g. 10^9 vertices at
    P=8), sort ONE packed key instead of a two-key lexsort — the vote
    exchange is edge-scale in early supersteps, and the single-key sort is
    the difference between the update task being sort-bound or not."""
    if not len(dst_local):
        e = np.empty(0, np.int64)
        return e, e, e
    d64 = dst_local.astype(np.int64, copy=False)
    l64 = labels.astype(np.int64, copy=False)
    lmin = int(l64.min())
    span = int(l64.max()) - lmin + 1
    dmax = int(d64.max())
    if lmin >= 0 and span < (1 << 62) // (dmax + 1):
        key = d64 * span + (l64 - lmin)
        if counts is None:
            k = np.sort(key)
            flag = np.empty(len(k), bool)
            flag[0] = True
            np.not_equal(k[1:], k[:-1], out=flag[1:])
            starts = np.flatnonzero(flag)
            c = np.diff(np.append(starts, len(k))).astype(np.int64)
            ks = k[starts]
            return ks // span, ks % span + lmin, c
        order = np.argsort(key)
        k = key[order]
        flag = np.empty(len(k), bool)
        flag[0] = True
        np.not_equal(k[1:], k[:-1], out=flag[1:])
        starts = np.flatnonzero(flag)
        c = np.add.reduceat(counts[order].astype(np.int64), starts)
        ks = k[starts]
        return ks // span, ks % span + lmin, c
    order = np.lexsort((l64, d64))
    d = d64[order]
    l = l64[order]
    flag = np.empty(len(d), bool)
    flag[0] = True
    np.logical_or(d[1:] != d[:-1], l[1:] != l[:-1], out=flag[1:])
    starts = np.flatnonzero(flag)
    if counts is None:
        c = np.diff(np.append(starts, len(d))).astype(np.int64)
    else:
        c = np.add.reduceat(counts[order].astype(np.int64), starts)
    return d[starts], l[starts], c


def _winners(dst: np.ndarray, label: np.ndarray, count: np.ndarray):
    """Per-dst winner: max count, tie -> min label. Input MUST be sorted by
    (dst, label) — the ``_count_votes`` contract — which makes this three
    O(n) contiguous passes (run boundaries + maximum.reduceat + first
    masked position per run) instead of a 3-key lexsort: the lexsort was
    the early-superstep bottleneck at 512M-edge scale, where vote entries
    are edge-scale before labels coalesce. Returns (dst_unique, label)."""
    if not len(dst):
        return dst, label
    flag = np.empty(len(dst), bool)
    flag[0] = True
    np.not_equal(dst[1:], dst[:-1], out=flag[1:])
    starts = np.flatnonzero(flag)
    gid = np.cumsum(flag) - 1
    maxc = np.maximum.reduceat(count, starts)
    pos = np.flatnonzero(count == maxc[gid])
    # labels ascend within a run, so the FIRST max-count entry per run is
    # the min-label tie-break; gid[pos] is ascending with every run present
    firsts = pos[np.searchsorted(gid[pos], np.arange(len(starts)))]
    return dst[firsts], label[firsts]


def _reduce_first_votes(d: np.ndarray, l: np.ndarray, c: np.ndarray):
    """Superstep-0 per-cell vote reduction. At iteration 0 every label IS
    its source's vertex id, so a (dst, label) pair lives in exactly ONE grid
    cell (the edge's cell is a function of (hash(src), hash(dst))) — counts
    never merge across cells. The global winner per dst (max count, tie →
    min label) is therefore decided by: all entries with count > 1, plus the
    per-dst MINIMUM label among count-1 entries — every other count-1 entry
    can never win a max or a tie. Shrinks the first superstep's panels from
    edge-scale to dst-unique-scale on simple graphs (where all counts are 1)
    at bit-identical final labels. Input sorted by (dst, label) — the
    ``_count_votes`` contract."""
    if not len(d):
        return d, l, c
    keep = c > 1
    runs = np.empty(len(d), bool)
    runs[0] = True
    np.not_equal(d[1:], d[:-1], out=runs[1:])
    gid = np.cumsum(runs) - 1
    ones = np.flatnonzero(c == 1)
    if len(ones):
        # labels ascend within a dst run, so the FIRST count-1 entry per run
        # is that run's minimum count-1 label
        first_idx = ones[np.unique(gid[ones], return_index=True)[1]]
        keep[first_idx] = True
    return d[keep], l[keep], c[keep]


@ray.remote
def _vote_cell(block: pa.Table, layout: pa.Table, h: dict,
               out_parts: list[int], first: bool = False):
    """MAP side (same exchange contract as components._min_cell): per-edge
    vote = src's current label for dst; pre-combined per (dst_local, label)
    inside the cell. One panel table per dst part present. ``first`` enables
    the superstep-0 reduction (see ``_reduce_first_votes``; disabled for a
    cell when it carries self-loops, whose vote would merge with the update
    task's self-vote and break the cross-cell disjointness argument)."""
    cache: dict[int, np.ndarray] = {}
    by_part = {p: ([], [], [], [], [], []) for p in out_parts}
    for row in range(block.num_rows):
        part, srcs, src_index, dst_unique, dst_index, _ = unpack_part_block(
            block, row
        )
        src_pos, panel_parts, _off, dst_local = unpack_panel_layout(
            layout, row
        )
        if not len(panel_parts):
            continue
        if part not in cache:
            vref, vrow = h["state"][part]
            (labels_p,) = _row_lists(ray.get(vref), vrow, ["values"])
            cache[part] = labels_p
        labels_p = cache[part]
        lab_edge = labels_p[src_pos][src_index]
        dl_edge = dst_local[dst_index]
        d, l, c = _count_votes(dl_edge, lab_edge)
        if first and not np.any(lab_edge == dst_unique[dst_index]):
            d, l, c = _reduce_first_votes(d, l, c)
        # Panels are edge-scale in early supersteps (one entry per distinct
        # (dst, label) seen in the cell) and the exchange is plasma-write
        # bound at that scale, so the panel format is byte-minimal:
        # entries leave _count_votes sorted by (dst, label), so the dst
        # column is run-length encoded (dst_u + run lengths — U unique dsts
        # are V/P-bounded, far below N entries), and counts are stored
        # SPARSELY (exception positions + values; in the genuine vote
        # superstep almost every per-cell count is 1). 12 bytes/entry →
        # 4 bytes/entry + O(U + exceptions). Labels that fit int32 travel
        # as int32 (vertex-id labels usually do); the update side
        # reconstructs per panel and upcasts, so cells may disagree.
        if len(l) and l.min() >= 0 and l.max() < 2**31:
            l = l.astype(np.int32)
        block_id = int(block["block_id"][row].as_py())
        bids, dus, rns, lls, eps, ecs = by_part[int(panel_parts[0])]
        bids.append(block_id)
        if len(d):
            flag = np.empty(len(d), bool)
            flag[0] = True
            np.not_equal(d[1:], d[:-1], out=flag[1:])
            starts = np.flatnonzero(flag)
            du = d[starts]
            rn = np.diff(np.append(starts, len(d)))
            exc = np.flatnonzero(c != 1)
            ec = c[exc]
            # loud guard on the int32 panel downcasts: dst_local is
            # V/P-bounded, run lengths / positions are bounded by the
            # cell's entry count, counts by its edge count — all hold
            # under the current substrate bounds, but fail HERE rather
            # than wrap silently if those bounds ever change
            assert int(du.max()) < 2**31 and len(d) < 2**31
            assert not len(ec) or int(ec.max()) < 2**31
        else:
            du = rn = exc = ec = np.empty(0, np.int64)
        dus.append(du.astype(np.int32))
        rns.append(rn.astype(np.int32))
        lls.append(l)
        eps.append(exc.astype(np.int32))
        ecs.append(ec.astype(np.int32))
    out = []
    for p in out_parts:
        bids, dus, rns, lls, eps, ecs = by_part[p]
        ltype = pa.int32() if all(
            a.dtype == np.int32 for a in lls
        ) else pa.int64()
        out.append(pa.table(
            {
                "block_id": pa.array(bids, pa.int64()),
                "dst_u": pa.array(dus, pa.list_(pa.int32())),
                "runs": pa.array(rns, pa.list_(pa.int32())),
                "label": pa.array(
                    [a.astype(np.int64) for a in lls] if ltype == pa.int64()
                    else lls,
                    pa.list_(ltype),
                ),
                "exc_pos": pa.array(eps, pa.list_(pa.int32())),
                "exc_cnt": pa.array(ecs, pa.list_(pa.int32())),
            }
        ))
    return out[0] if len(out) == 1 else tuple(out)


def _panel_range_arrays(t: pa.Table, lo: int, hi: int):
    """Reconstruct the (dst, label, count) entries of one panel restricted
    to the dst range [lo, hi) from the RLE/sparse wire format. Each panel
    ROW's runs are dst-sorted (the _count_votes contract), so the range is
    two searchsorteds per row; only the range's entries are materialized."""
    import pyarrow.compute as pc

    lab_col = t["label"].combine_chunks()
    # NO astype here: with n_sub range tasks each decoding the same panel,
    # an up-front int64 copy of the N-scale label column would multiply the
    # dominant superstep's decode bytes by n_sub — keep the zero-copy raw
    # view and upcast only the [e0, e1) slices below
    lab = pc.list_flatten(lab_col).to_numpy(zero_copy_only=False)
    if not len(lab):
        return [], [], []
    du_col = t["dst_u"].combine_chunks()
    du = pc.list_flatten(du_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    rn = pc.list_flatten(t["runs"].combine_chunks()).to_numpy(
        zero_copy_only=False).astype(np.int64)
    u_lens = pc.list_value_length(du_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    lab_lens = pc.list_value_length(lab_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    u_base = np.concatenate([[0], np.cumsum(u_lens)])
    e_base = np.concatenate([[0], np.cumsum(lab_lens)])
    ep_col = t["exc_pos"].combine_chunks()
    ep = pc.list_flatten(ep_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    ep_lens = pc.list_value_length(ep_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    ec = pc.list_flatten(t["exc_cnt"].combine_chunks()).to_numpy(
        zero_copy_only=False).astype(np.int64)
    ep_base = np.concatenate([[0], np.cumsum(ep_lens)])
    dsts, labs, cnts = [], [], []
    for r in range(t.num_rows):
        du_r = du[u_base[r]:u_base[r + 1]]
        if not len(du_r):
            continue
        rn_r = rn[u_base[r]:u_base[r + 1]]
        i0 = int(np.searchsorted(du_r, lo))
        i1 = int(np.searchsorted(du_r, hi))
        if i0 == i1:
            continue
        ent = np.cumsum(rn_r) - rn_r  # entry offsets within the row
        e0 = int(ent[i0])
        e1 = int(ent[i1 - 1] + rn_r[i1 - 1])
        l_s = lab[e_base[r] + e0 : e_base[r] + e1].astype(np.int64)
        c_s = np.ones(len(l_s), np.int64)
        ep_r = ep[ep_base[r]:ep_base[r + 1]]
        if len(ep_r):
            m = (ep_r >= e0) & (ep_r < e1)
            if m.any():
                c_s[ep_r[m] - e0] = ec[ep_base[r]:ep_base[r + 1]][m]
        dsts.append(np.repeat(du_r[i0:i1], rn_r[i0:i1]))
        labs.append(l_s)
        cnts.append(c_s)
    return dsts, labs, cnts


@ray.remote
def _update_range(h: dict, part: int, include_self: bool, lo: int, hi: int,
                  *panels: pa.Table) -> np.ndarray:
    """RANGE-SPLIT reduce: merge this part's vote panels restricted to dst
    range [lo, hi) and apply the winner rule. The winner per dst depends
    only on that dst's votes, so splitting the update by dst range is exact
    — and it is what keeps every core busy during the genuine vote
    superstep: with P state partitions, a monolithic per-part update ran
    only P concurrent sorts (measured as the dominant superstep-1 cost at
    512M edges, 24 of 32 cores idle); S sub-ranges per part run P*S."""
    vref, vrow = h["state"][part]
    (labels_old,) = _row_lists(ray.get(vref), vrow, ["values"])
    dsts, labs, cnts = [], [], []
    for t in panels:
        if not t.num_rows:
            continue
        d_l, l_l, c_l = _panel_range_arrays(t, lo, hi)
        dsts.extend(d_l)
        labs.extend(l_l)
        cnts.extend(c_l)
    new_slice = labels_old[lo:hi].copy()
    if include_self:
        dsts.append(np.arange(lo, hi, dtype=np.int64))
        labs.append(new_slice.astype(np.int64, copy=True))
        cnts.append(np.ones(hi - lo, np.int64))
    if dsts:
        d, l, c = _count_votes(
            np.concatenate(dsts), np.concatenate(labs), np.concatenate(cnts)
        )
        wd, wl_ = _winners(d, l, c)
        new_slice[wd - lo] = wl_
    return new_slice


@ray.remote(num_returns=2)
def _assemble_part(h: dict, part: int, iteration: int, ckpt_tmp, digest,
                   *slices: np.ndarray):
    """Concatenate the range slices (disjoint, in range order), count
    changes, write the checkpoint shard, emit the state row."""
    sref, srow = h["static"][part]
    (ids_p,) = _row_lists(ray.get(sref), srow, ["ids"])
    vref, vrow = h["state"][part]
    (labels_old,) = _row_lists(ray.get(vref), vrow, ["values"])
    new_labels = np.concatenate(slices) if slices else labels_old.copy()
    changed = int(np.count_nonzero(new_labels != labels_old))
    if ckpt_tmp is not None:
        PartitionedCheckpoint.write_shard(
            ckpt_tmp, iteration, part, digest, ids_p, new_labels
        )
    row_table = pa.table(
        {
            "part": pa.array([part], pa.int64()),
            "values": pa.array([new_labels], pa.list_(pa.int64())),
        }
    )
    return row_table, changed


def label_propagation_partitioned(
    edges_symmetric: rd.Dataset,
    all_vertex_ids: np.ndarray | None = None,
    max_iter: int = 20,
    include_self: bool = True,
    checkpoint_dir: str | None = None,
    num_state_partitions: int = 8,
):
    """Core loop. -> (state_ds, graph, info). ``edges_symmetric`` must
    contain both half-edges (``graph.symmetrize``). State stays
    distributed; drain via ``state_to_dataset``."""
    g = build_partitioned_graph(
        edges_symmetric, P=num_state_partitions, extra_vertex_ids=all_vertex_ids
    )
    if g.n_vertices == 0:
        return None, g, {"iterations": 0, "supersteps": []}

    ckpt = (
        PartitionedCheckpoint(checkpoint_dir, g.digest)
        if checkpoint_dir is not None
        else None
    )
    start_iter = 0
    resumed_from = None
    state_ds = state_index = None
    if ckpt is not None:
        latest = ckpt.latest_meta()
        if latest is not None:
            it, manifest = latest
            meta = manifest.get("meta", {})
            state_ds, state_index = ckpt.load_state(g, it, pa.int64())
            start_iter = it + 1
            resumed_from = it
            if meta.get("converged") or it + 1 >= max_iter:
                return state_ds, g, {
                    "iterations": it + 1,
                    "converged": bool(meta.get("converged")),
                    "resumed_from": it,
                    "supersteps": [],
                }
    if state_ds is None:
        state_ds, state_index, _ = init_state(
            g, lambda part, ids, outdeg: ids.copy(), pa.int64()
        )

    supersteps = []
    converged = False
    parts_sorted = list(g.parts)
    # range-split factor for the per-part update: P monolithic updates left
    # most cores idle during the genuine vote superstep (its single-threaded
    # sort dominated superstep 1 at 512M edges); the split is exact because
    # the winner rule is per-dst. Result is bit-identical for any n_sub.
    import os

    cpus = int(ray.cluster_resources().get("CPU", len(parts_sorted)))
    n_sub = max(1, min(8, cpus // max(1, len(parts_sorted))))
    if os.environ.get("GRAFT_LPA_NSUB"):  # test hook: pin the split factor
        n_sub = max(1, int(os.environ["GRAFT_LPA_NSUB"]))
    row_refs: dict = {}
    for it in range(start_iter, max_iter):
        t0 = time.perf_counter()
        handles_ref = ray.put({"static": g.static_index, "state": state_index})
        tmp = ckpt.tmp_dir(it) if ckpt is not None else None
        panel_refs: dict[int, list] = {p: [] for p in parts_sorted}
        for bref, lref, dst_parts, _bid in g.panel_blocks:
            refs = _vote_cell.options(num_returns=len(dst_parts)).remote(
                bref, lref, handles_ref, dst_parts, it == 0
            )
            if len(dst_parts) == 1:
                refs = [refs]
            for p, r in zip(dst_parts, refs):
                panel_refs[p].append(r)
        row_refs, chg_refs = {}, {}
        for p in parts_sorted:
            n_p = int(g.static_scalars[p]["n"])
            bounds = [s * n_p // n_sub for s in range(n_sub)] + [n_p]
            slice_refs = [
                _update_range.remote(
                    handles_ref, p, include_self, bounds[s], bounds[s + 1],
                    *panel_refs[p]
                )
                for s in range(n_sub)
                if bounds[s] < bounds[s + 1]
            ]
            row_refs[p], chg_refs[p] = _assemble_part.remote(
                handles_ref, p, it, tmp, g.digest, *slice_refs
            )
        changed_per_part = ray.get([chg_refs[p] for p in parts_sorted])
        state_index = {p: (row_refs[p], 0) for p in parts_sorted}
        state_ds = None
        changed = int(sum(changed_per_part))
        converged = changed == 0
        dt = time.perf_counter() - t0
        supersteps.append({"iteration": it, "seconds": dt, "changed": changed})
        if ckpt is not None:
            ckpt.commit(
                it, parts_sorted,
                meta={"changed": changed, "converged": converged,
                      "seconds": dt, "n_edges": g.n_edges},
            )
        if converged:
            break

    if state_ds is None and row_refs:
        state_ds = rd.from_arrow_refs([row_refs[p] for p in parts_sorted])
    info = {
        "iterations": len(supersteps) + start_iter,
        "converged": converged,
        "resumed_from": resumed_from,
        "supersteps": supersteps,
    }
    return state_ds, g, info


def label_propagation(
    edges_symmetric: rd.Dataset,
    all_vertex_ids: np.ndarray | None = None,
    max_iter: int = 20,
    include_self: bool = True,
    checkpoint_dir: str | None = None,
    num_state_partitions: int = 8,
):
    """-> (vertex_ids, labels, info) — numpy result delivery (test scale)."""
    state_ds, g, info = label_propagation_partitioned(
        edges_symmetric, all_vertex_ids, max_iter, include_self,
        checkpoint_dir, num_state_partitions,
    )
    if state_ds is None:
        return np.empty(0, np.int64), np.empty(0, np.int64), info
    ids, labels = state_to_arrays(state_ds, g)
    return ids, labels.astype(np.int64), info


def label_propagation_dataset(edges_symmetric: rd.Dataset, **kw):
    """Streaming result: Dataset of (vertex_id, label)."""
    state_ds, g, info = label_propagation_partitioned(edges_symmetric, **kw)
    if state_ds is None:
        return rd.from_arrow(
            pa.table({"vertex_id": pa.array([], pa.int64()),
                      "label": pa.array([], pa.int64())})
        ), info
    return state_to_dataset(state_ds, g, "label"), info
