"""Co-partitioned vertex state for superstep algorithms.

Round-2 replacement of the driver-broadcast contract that lived in
``algos.common.broadcast_state``: NOTHING vertex- or edge-scale ever lands on
the driver any more.

- **Adjacency** is CSR sub-blocks PRE-PARTITIONED into a 2D grid of cells
  ``(part(src), part(dst))`` and materialized once in the object store (the
  north-star's "per-partition CSR adjacency blocks", read zero-copy each
  superstep). Cell routing (int32 positions into the partition inventories,
  panel layout) is baked at build time so supersteps do zero hashing /
  sorting / searchsorted.
- **Vertex state** is ONE Arrow row per partition: ``(part, ids
  list<int64>-aligned values list)`` in the object store. The driver holds
  only ``{part: (ref, row_index)}`` plus per-part SCALARS (delta,
  dangling-mass partials, changed counts).
- **A superstep** is a hand-scheduled hash shuffle keyed on part(dst): one
  contrib task per pinned cell block (reads only its src partition's state
  slice, 1/P of the vector, zero-copy shared memory; per-dst combiner via
  bincount — exchange entries are bounded by P*V*(1-e^{-E/PV}), sub-edge
  scale), with output panel refs routed by the driver straight to P
  per-partition update tasks — no sort exchange anywhere in the loop.
- **Hub-vertex splitting / skew**: vertices are hash-partitioned, and a hub
  vertex's edge list is NOT resident on any single partition — its
  out-edges split across the P cells of its src row by part(dst), its
  in-contributions are pre-combined per cell before the exchange, so a
  10^7-degree hub costs each cell at most V/P combiner entries (the
  P·V·(1−e^{−E/PV}) panel bound) instead of one partition holding
  degree-scale state. This is the north-star's "hub-vertex splitting":
  the 2D grid splits every hub structurally, no special-cased hub list to
  maintain or mis-detect (tests/test_hub_skew.py pins the balance).
- **The build** is the same map/reduce shuffle shape: split-by-cell map
  tasks (single packed numpy returns — plasma's per-object sealing cost
  makes many small returns 5x slower), per-cell canonical-sort CSR reduces
  (which yield the vertex inventory for free), per-part static combines,
  V/P-bounded localization side-tables. Edge data crosses the object store
  twice; there is no Dataset sort materialization to spill.

The per-partition update concatenates its panels in canonical block_id
order, so float accumulation is bit-deterministic regardless of Ray
scheduling — the property the checkpoint/resume contract relies on.

Reference anchor: the reference pins per-graph adjacency in process memory
(``/root/reference/graph.h:10-19``); this module is the distributed analog
where the "process" is a hash partition of a 10^8+-vertex graph.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions.bucketing import int_bucket

_MASK = (1 << 64) - 1
_SENTINEL = np.int64(-1)


# ---------------------------------------------------------------------------
# block refs / state indexing
# ---------------------------------------------------------------------------

def _block_refs(ds: rd.Dataset):
    return [ref for b in ds.iter_internal_ref_bundles() for ref in b.block_refs]



def _unique_inverse(x: np.ndarray):
    """np.unique(x, return_inverse=True) via stable radix argsort — ~1.4x
    faster than np.unique's quicksort on large int64 arrays."""
    o = np.argsort(x, kind="stable")
    xs = x[o]
    if not len(xs):
        return xs, np.empty(0, np.int64)
    flag = np.empty(len(xs), bool)
    flag[0] = True
    np.not_equal(xs[1:], xs[:-1], out=flag[1:])
    uniq = xs[flag]
    grp = np.cumsum(flag) - 1
    inv = np.empty(len(xs), np.int64)
    inv[o] = grp
    return uniq, inv


def _unique_sorted(x: np.ndarray):
    """Distinct values of x, sorted (radix path)."""
    xs = np.sort(x, kind="stable")
    if not len(xs):
        return xs
    flag = np.empty(len(xs), bool)
    flag[0] = True
    np.not_equal(xs[1:], xs[:-1], out=flag[1:])
    return xs[flag]


@ray.remote
def _scan_state_block(block, scalar_cols: list[str]):
    """Tiny index task: run ON A WORKER against a state block (zero-copy) and
    return only (part, row_index, scalars) — never the vertex-scale lists."""
    if not isinstance(block, pa.Table):
        block = pa.table(block)
    parts = block["part"].to_numpy() if block.num_rows else np.empty(0, np.int64)
    out = []
    for i, p in enumerate(parts):
        scal = {c: block[c][i].as_py() for c in scalar_cols}
        out.append((int(p), i, scal))
    return out


def index_state(ds: rd.Dataset, scalar_cols: list[str] | None = None):
    """Materialized per-part-row dataset → ({part: (block_ref, row)},
    {part: scalars}). Only refs and scalars reach the driver."""
    scalar_cols = scalar_cols or []
    refs = _block_refs(ds)
    futures = [_scan_state_block.remote(r, scalar_cols) for r in refs]
    index: dict[int, tuple] = {}
    scalars: dict[int, dict] = {}
    for ref, rows in zip(refs, ray.get(futures)):
        for part, row, scal in rows:
            index[part] = (ref, row)
            scalars[part] = scal
    return index, scalars


def _row_lists(block: pa.Table, row: int, cols: list[str]):
    """Zero-copy-ish numpy views of one state row's list columns."""
    out = []
    for c in cols:
        v = block[c][row].values
        if pa.types.is_string(v.type) or pa.types.is_large_string(v.type):
            out.append(np.asarray(v.to_pylist(), dtype=object))
        else:
            out.append(v.to_numpy(zero_copy_only=False))
    return out


def get_part(index: dict, part: int, cols: list[str]):
    ref, row = index[part]
    return _row_lists(ray.get(ref), row, cols)


class PartCache:
    """Per-task cache of fetched state-index partitions (zero-copy plasma
    reads, shared per node). ``get(part)`` → tuple of numpy list-column
    views, or None for an absent partition."""

    def __init__(self, index: dict, cols: list[str]):
        self.index = index
        self.cols = cols
        self.cache: dict[int, tuple | None] = {}

    def get(self, part: int):
        if part not in self.cache:
            if part not in self.index:
                self.cache[part] = None
            else:
                ref, row = self.index[part]
                self.cache[part] = tuple(_row_lists(ray.get(ref), row, self.cols))
        return self.cache[part]


# ---------------------------------------------------------------------------
# partitioned graph build
# ---------------------------------------------------------------------------

class PartitionedGraph:
    """Pinned adjacency + static per-part vertex inventory.

    Attributes: ``blocks`` (materialized CSR sub-blocks with ``src_part``),
    ``static`` (materialized per-part rows ``(part, ids, outdeg)``),
    ``static_index`` / ``static_scalars``, ``parts`` (sorted present parts),
    ``n_vertices``, ``n_edges``, ``n_dangling``, ``digest``, ``P``.
    """

    def __init__(self, blocks, static, static_index, static_scalars, P,
                 n_edges, digest, panel_blocks=None):
        self.blocks = blocks
        self.static = static
        self.static_index = static_index
        self.static_scalars = static_scalars
        # [(block_ref, [dst_parts present], min_block_id)] sorted by
        # min_block_id; each ROW belongs to one grid cell (single dst part)
        self.panel_blocks = panel_blocks or []
        self.P = P
        self.parts = sorted(static_index)
        self.n_vertices = sum(s["n"] for s in static_scalars.values())
        self.n_dangling = sum(s["n_dangling"] for s in static_scalars.values())
        self.n_edges = n_edges
        self.digest = digest

def flatten_panel_group(t: pa.Table):
    """One part's panel rows → (dst, partial) numpy arrays concatenated in
    canonical block_id order (bit-deterministic accumulation basis).
    Sentinel seed rows carry empty lists and vanish in the flatten."""
    order = np.argsort(t["block_id"].to_numpy(), kind="stable")
    t = t.take(pa.array(order))
    import pyarrow.compute as pc

    dst = pc.list_flatten(t["dst"].combine_chunks()).to_numpy(
        zero_copy_only=False
    )
    partial = pc.list_flatten(t["partial"].combine_chunks()).to_numpy(
        zero_copy_only=False
    )
    return dst, partial


def flatten_float_panels(panels, n_p: int) -> np.ndarray:
    """Canonical float-panel accumulation shared by PageRank / PPR /
    betweenness: flatten in stable block_id order, DENSE panels first
    (empty dst list + partial length == n_p, pure vector adds) then sparse
    panels via one np.add.at — bit-deterministic run-to-run. Returns the
    length-n_p incoming vector."""
    incoming = np.zeros(n_p, dtype=np.float64)
    if not panels:
        return incoming
    t = pa.concat_tables(panels)
    order = np.argsort(t["block_id"].to_numpy(), kind="stable")
    dst_col = t["dst"].combine_chunks()
    par_col = t["partial"].combine_chunks()
    sparse_dst, sparse_par = [], []
    for i in order:
        i = int(i)
        dv = dst_col[i].values.to_numpy(zero_copy_only=False)
        pv = par_col[i].values.to_numpy(zero_copy_only=False)
        if len(dv) == 0 and len(pv) == n_p:
            incoming += pv
        elif len(dv):
            sparse_dst.append(dv)
            sparse_par.append(pv)
    if sparse_dst:
        np.add.at(incoming, np.concatenate(sparse_dst),
                  np.concatenate(sparse_par))
    return incoming


def unpack_part_block(batch: pa.Table, row: int):
    srcs = batch["srcs"][row].values.to_numpy(zero_copy_only=False)
    src_index = batch["src_index"][row].values.to_numpy(zero_copy_only=False)
    dst_unique = batch["dst_unique"][row].values.to_numpy(zero_copy_only=False)
    dst_index = batch["dst_index"][row].values.to_numpy(zero_copy_only=False)
    if "weight" in batch.column_names:
        weight = batch["weight"][row].values.to_numpy(zero_copy_only=False)
    else:
        weight = None
    part = int(batch["src_part"][row].as_py())
    return part, srcs, src_index, dst_unique, dst_index, weight


def unpack_panel_layout(batch: pa.Table, row: int):
    """Precomputed routing for one CSR sub-block (built once by
    ``_localize_blocks``): ``src_pos`` positions of ``srcs`` in the src
    partition inventory, ``panel_parts``/``panel_offsets`` segmenting the
    part-ordered ``dst_unique``, and ``dst_local`` positions in each dst
    partition's inventory. Supersteps do no hashing or searchsorted."""
    src_pos = batch["src_pos"][row].values.to_numpy(zero_copy_only=False)
    panel_parts = batch["panel_parts"][row].values.to_numpy(zero_copy_only=False)
    panel_offsets = batch["panel_offsets"][row].values.to_numpy(
        zero_copy_only=False
    )
    dst_local = batch["dst_local"][row].values.to_numpy(zero_copy_only=False)
    return src_pos, panel_parts, panel_offsets, dst_local


# ---------------------------------------------------------------------------
# partitioned graph build — hand-scheduled map/reduce shuffle
#
# The build is ONE pass of raw Ray tasks instead of Dataset sort exchanges:
# map tasks split each edge block by 2D grid cell (part(src) x part(dst)) and
# by vertex part; reduce tasks assemble each cell's canonical CSR sub-blocks
# (localized against the partition inventories) and each part's vertex
# inventory. Edge data crosses the object store exactly once (no sort
# materialization, no spill at edge scale); the driver holds only
# B x (P^2 + P) refs plus per-cell scalar metadata.
# ---------------------------------------------------------------------------

@ray.remote
def _split_edges(block, P: int, weighted: bool,
                 range_starts: list[int] | None = None):
    """MAP (cells): one edge block → edge arrays sorted by grid cell + cell
    offsets, packed into ONE return per reducer NODE RANGE (``range_starts``:
    contiguous cell-id range boundaries, one range per node; None = single
    node = one packed object). Packing per range (not per cell) avoids
    plasma's per-object sealing overhead (measured ~70 ms/object on this
    store — P^2 returns per task were 5x slower than one) while, past one
    node, each range's object is fetched only by the node whose affinity-
    pinned ``_build_cell`` tasks own those cells — build bytes cross the NIC
    at most once (same layout as functions.bucketing's node-aware
    exchange). Reduce tasks slice their cell's segment zero-copy."""
    if not isinstance(block, pa.Table):
        block = pa.table(block)
    ncell = P * P
    n_ranges = 1 if range_starts is None else len(range_starts) - 1

    def empty_pack(lo_c: int, hi_c: int):
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.zeros(hi_c - lo_c + 1, np.int64), None)

    if "src" not in block.column_names or block.num_rows == 0:
        if n_ranges == 1:
            return empty_pack(0, ncell)
        return tuple(
            empty_pack(range_starts[j], range_starts[j + 1])
            for j in range(n_ranges)
        )
    src = block["src"].to_numpy()
    dst = block["dst"].to_numpy()
    w = None
    if weighted and "weight" in block.column_names:
        w = block["weight"].to_numpy().astype(np.float64)
    cell = int_bucket(src, P) * P + int_bucket(dst, P)
    # ids that fit int32 travel as int32 (halves the shuffle bytes and the
    # downstream concat/sort traffic; hashed 64-bit ids keep int64 — the
    # reduce upcasts transparently when blocks disagree)
    if (src.dtype == np.int64 and len(src)
            and src.min() >= 0 and dst.min() >= 0
            and src.max() < 2**31 and dst.max() < 2**31):
        src = src.astype(np.int32)
        dst = dst.astype(np.int32)
    # cell alphabet is tiny (P^2): radix-sorting a narrow view is ~7x faster
    key = cell.astype(np.uint8) if ncell <= 256 else cell.astype(np.uint16)
    order = np.argsort(key, kind="stable")
    cs = cell[order]
    ss = src[order]
    ds = dst[order]
    ws = w[order] if w is not None else None
    counts = np.bincount(cs, minlength=ncell)
    offs = np.zeros(ncell + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    if n_ranges == 1:
        return ss, ds, offs, ws
    out = []
    for j in range(n_ranges):
        lo_c, hi_c = range_starts[j], range_starts[j + 1]
        a, b = int(offs[lo_c]), int(offs[hi_c])
        out.append((
            ss[a:b], ds[a:b], offs[lo_c:hi_c + 1] - a,
            ws[a:b] if ws is not None else None,
        ))
    return tuple(out)


@ray.remote(num_returns=2)
def _combine_static(part: int, extra_ids, n_src_packs: int, *packs):
    """REDUCE (vertex inventory): merge the per-cell inventory packs —
    (srcs, outdeg_partial, dst_unique) from this part's row of cells
    (src side, first ``n_src_packs``) and column of cells (dst side) —
    into the 1-row static table (part, ids, outdeg, n, n_dangling) +
    (n, n_dangling) scalars. Inputs are V/P-bounded (already unique per
    cell), so this merge is tiny compared to edge scale. Canonical
    (vertex, deg) accumulation → bit-identical weighted degree sums."""
    vids, degs = [], []
    for k, pk in enumerate(packs):
        srcs_c, outdeg_c, dstu_c = pk
        if k < n_src_packs:
            if len(srcs_c):
                vids.append(srcs_c.astype(np.int64, copy=False))
                degs.append(outdeg_c)
        else:
            if len(dstu_c):
                vids.append(dstu_c.astype(np.int64, copy=False))
                degs.append(np.zeros(len(dstu_c), dtype=np.float64))
    if extra_ids is not None and len(extra_ids):
        vids.append(np.asarray(extra_ids, dtype=np.int64))
        degs.append(np.zeros(len(extra_ids), dtype=np.float64))
    if not vids:
        return None, (0, 0)
    vid = np.concatenate(vids)
    deg = np.concatenate(degs)
    order = np.lexsort((deg, vid))
    vid, deg = vid[order], deg[order]
    ids = np.unique(vid)
    acc = np.zeros(len(ids), dtype=np.float64)
    np.add.at(acc, np.searchsorted(ids, vid), deg)
    row = pa.table(
        {
            "part": pa.array([part], pa.int64()),
            "ids": pa.array([ids], pa.list_(pa.int64())),
            "outdeg": pa.array([acc], pa.list_(pa.float64())),
            "n": pa.array([len(ids)], pa.int64()),
            "n_dangling": pa.array(
                [int(np.count_nonzero(acc == 0.0))], pa.int64()
            ),
        }
    )
    return row, (len(ids), int(np.count_nonzero(acc == 0.0)))


@ray.remote(num_returns=3)
def _build_cell(cell: int, P: int, target_edges: int, weighted: bool,
                *packed, cell_local: int | None = None):
    """REDUCE (cells): slice this cell's segment from each packed split
    block (zero-copy views) → (CSR sub-block table,
    inventory pack (srcs, outdeg_partial, dst_unique),
    meta (n_edges, mix, [dst_part], min_block_id)).

    ``cell`` is always the GLOBAL cell id (it defines part_i/part_j and the
    block_id identity); ``cell_local`` is the index into the packed splits'
    offset arrays — it differs from ``cell`` only on the multi-node build
    path, where splits are packed per node range and offsets are re-based
    to the range.

    Edges are sorted canonically by (src, dst) first, so the blocks — and
    every downstream float accumulation order — are bit-identical regardless
    of input block arrival order. The cell's unique srcs/dsts come out of
    the CSR construction for free, so the vertex inventory needs NO extra
    pass over the edges. Localization (src_pos/dst_local) happens in a later
    pass once the inventories exist."""
    ci = cell if cell_local is None else cell_local
    srcs_in, dsts_in, ws_in = [], [], []
    for ss, ds, offs, ws in packed:
        a, b = int(offs[ci]), int(offs[ci + 1])
        if b > a:
            srcs_in.append(ss[a:b])
            dsts_in.append(ds[a:b])
            if ws is not None:
                ws_in.append(ws[a:b])
    if not srcs_in:
        empty = (np.empty(0, np.int64), np.empty(0, np.float64),
                 np.empty(0, np.int64))
        return None, empty, (0, 0, [], -1)
    src = np.concatenate(srcs_in)
    dst = np.concatenate(dsts_in)
    w = np.concatenate(ws_in) if (weighted and ws_in) else None
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    if w is not None:
        w = w[order]
    part_i, part_j = cell // P, cell % P
    # cell-level inventory: srcs + weighted out-degree partials via the
    # sorted-run boundaries (free), dst union accumulated from sub-blocks
    cflag = np.empty(len(src), bool)
    cflag[0] = True
    np.not_equal(src[1:], src[:-1], out=cflag[1:])
    srcs_cell = src[cflag]
    grp = np.cumsum(cflag) - 1
    if w is None:
        outdeg_cell = np.bincount(grp, minlength=len(srcs_cell)).astype(
            np.float64
        )
    else:
        # canonical order (already (src,dst)-sorted) → deterministic sums
        outdeg_cell = np.zeros(len(srcs_cell), dtype=np.float64)
        np.add.at(outdeg_cell, grp, w)
    rows = {k: [] for k in ("src_part", "block_id", "srcs", "src_index",
                            "dst_unique", "dst_index", "weight")}
    mix_total = 0
    dstu_parts = []
    for seq, lo in enumerate(range(0, len(src), target_edges)):
        s = src[lo: lo + target_edges]
        d = dst[lo: lo + target_edges]
        # s is globally sorted → srcs/src_index via boundary flags (free)
        sflag = np.empty(len(s), bool)
        if len(s):
            sflag[0] = True
            np.not_equal(s[1:], s[:-1], out=sflag[1:])
        srcs = s[sflag]
        src_index = np.cumsum(sflag) - 1
        dst_unique, dst_index = _unique_inverse(d)
        dstu_parts.append(dst_unique)
        m = (s.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + d.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        mix_total = (mix_total + int(m.sum(dtype=np.uint64))) & _MASK
        rows["src_part"].append(part_i)
        rows["block_id"].append((cell << 32) | seq)
        rows["srcs"].append(srcs.astype(np.int64, copy=False))
        rows["src_index"].append(src_index.astype(np.int32))
        rows["dst_unique"].append(dst_unique.astype(np.int64, copy=False))
        rows["dst_index"].append(dst_index.astype(np.int32))
        if w is not None:
            rows["weight"].append(w[lo: lo + target_edges])
    cols = {
        "src_part": pa.array(rows["src_part"], pa.int64()),
        "block_id": pa.array(rows["block_id"], pa.int64()),
        "srcs": pa.array(rows["srcs"], pa.list_(pa.int64())),
        "src_index": pa.array(rows["src_index"], pa.list_(pa.int32())),
        "dst_unique": pa.array(rows["dst_unique"], pa.list_(pa.int64())),
        "dst_index": pa.array(rows["dst_index"], pa.list_(pa.int32())),
    }
    if w is not None:
        cols["weight"] = pa.array(rows["weight"], pa.list_(pa.float64()))
    dstu_cell = (_unique_sorted(np.concatenate(dstu_parts))
                 if len(dstu_parts) > 1 else dstu_parts[0])
    inv_pack = (srcs_cell, outdeg_cell, dstu_cell)
    meta = (len(src), mix_total, [part_j], cell << 32)
    return pa.table(cols), inv_pack, meta


@ray.remote
def _localize_cell(block: pa.Table, cell: int, P: int, static_i, static_j):
    """Routing side-table for one cell's CSR sub-blocks: src/dst positions
    in the partition inventories + (trivial single-segment) panel layout.
    V/P-bounded — a few MB per cell, so the edge-scale CSR table is never
    rewritten."""
    part_j = cell % P
    (ids_i,) = _row_lists(static_i, 0, ["ids"])
    (ids_j,) = _row_lists(static_j, 0, ["ids"])
    out = {k: [] for k in ("block_id", "src_pos", "panel_parts",
                           "panel_offsets", "dst_local")}
    for row in range(block.num_rows):
        srcs = block["srcs"][row].values.to_numpy(zero_copy_only=False)
        dstu = block["dst_unique"][row].values.to_numpy(zero_copy_only=False)
        out["block_id"].append(int(block["block_id"][row].as_py()))
        out["src_pos"].append(np.searchsorted(ids_i, srcs).astype(np.int32))
        out["panel_parts"].append(np.array([part_j], dtype=np.int64))
        out["panel_offsets"].append(np.array([0, len(dstu)], dtype=np.int32))
        out["dst_local"].append(np.searchsorted(ids_j, dstu).astype(np.int32))
    return pa.table(
        {
            "block_id": pa.array(out["block_id"], pa.int64()),
            "src_pos": pa.array(out["src_pos"], pa.list_(pa.int32())),
            "panel_parts": pa.array(out["panel_parts"], pa.list_(pa.int64())),
            "panel_offsets": pa.array(
                out["panel_offsets"], pa.list_(pa.int32())
            ),
            "dst_local": pa.array(out["dst_local"], pa.list_(pa.int32())),
        }
    )


def build_partitioned_graph(
    edges: rd.Dataset,
    P: int = 16,
    weighted: bool = False,
    target_edges_per_block: int = 4_000_000,
    extra_vertex_ids: np.ndarray | None = None,
) -> PartitionedGraph:
    """Edge table → PartitionedGraph via the hand-scheduled build shuffle
    (see module banner above): split by grid cell → per-cell CSR build
    (which yields the vertex inventory for free) → per-part static combine
    → per-cell localization side-tables. Edge data crosses the object store
    twice (split + CSR); everything else is V/P-bounded."""
    edges_mat = edges.materialize()
    erefs = _block_refs(edges_mat)
    # coalesce to ~cluster-CPU map blocks: bigger blocks saturate the
    # per-cell combine and keep the driver's ref count linear and small
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 32))
    except Exception:
        ncpu = 32
    target_b = max(8, min(64, ncpu))
    if len(erefs) > 2 * target_b:
        edges_mat = edges_mat.repartition(target_b).materialize()
        erefs = _block_refs(edges_mat)

    from ..functions.bucketing import _alive_node_ids

    nodes = _alive_node_ids()
    ncell = P * P
    csr_refs, inv_refs, meta_refs = {}, {}, {}
    if len(nodes) <= 1 or ncell < 2:
        split_refs = [_split_edges.remote(r, P, weighted) for r in erefs]
        if split_refs:
            for c in range(ncell):
                csr_refs[c], inv_refs[c], meta_refs[c] = _build_cell.remote(
                    c, P, target_edges_per_block, weighted, *split_refs
                )
    elif erefs:
        # multi-node: cells are assigned to nodes in contiguous ranges;
        # splits pack one object per range and each range's _build_cell
        # tasks carry soft affinity to the owner node — build bytes cross
        # the NIC at most once (see _split_edges)
        from ray.util.scheduling_strategies import (
            NodeAffinitySchedulingStrategy,
        )

        n_ranges = min(len(nodes), ncell)
        range_starts = [
            round(j * ncell / n_ranges) for j in range(n_ranges + 1)
        ]
        split_n = _split_edges.options(num_returns=n_ranges)
        per_range: list[list] = [[] for _ in range(n_ranges)]
        for r in erefs:
            srefs = split_n.remote(r, P, weighted, range_starts)
            for j in range(n_ranges):
                per_range[j].append(srefs[j])
        for j in range(n_ranges):
            strategy = NodeAffinitySchedulingStrategy(nodes[j], soft=True)
            build_j = _build_cell.options(scheduling_strategy=strategy)
            for c in range(range_starts[j], range_starts[j + 1]):
                csr_refs[c], inv_refs[c], meta_refs[c] = build_j.remote(
                    c, P, target_edges_per_block, weighted, *per_range[j],
                    cell_local=c - range_starts[j],
                )
    metas = {c: ray.get(m) for c, m in meta_refs.items()}
    live_cells = [c for c in sorted(metas) if metas[c][0] > 0]

    extra_by_part: dict[int, np.ndarray] = {}
    if extra_vertex_ids is not None and len(extra_vertex_ids):
        ev = np.unique(np.asarray(extra_vertex_ids, dtype=np.int64))
        epk = int_bucket(ev, P)
        for p in range(P):
            sel = ev[epk == p]
            if len(sel):
                extra_by_part[p] = sel

    static_refs, scal_refs = {}, {}
    for p in range(P):
        src_cells = [c for c in live_cells if c // P == p]
        dst_cells = [c for c in live_cells if c % P == p]
        if not src_cells and not dst_cells and p not in extra_by_part:
            continue
        packs = [inv_refs[c] for c in src_cells] + [inv_refs[c] for c in dst_cells]
        static_refs[p], scal_refs[p] = _combine_static.remote(
            p, extra_by_part.get(p), len(src_cells), *packs
        )
    scal = {p: ray.get(scal_refs[p]) for p in sorted(scal_refs)}
    static_scalars = {
        p: {"n": n, "n_dangling": nd} for p, (n, nd) in scal.items() if n > 0
    }
    parts = sorted(static_scalars)
    static_index = {p: (static_refs[p], 0) for p in parts}
    if parts:
        static_ds = rd.from_arrow_refs([static_refs[p] for p in parts])
    else:
        static_ds = rd.from_arrow(pa.table(
            {
                "part": pa.array([], pa.int64()),
                "ids": pa.array([], pa.list_(pa.int64())),
                "outdeg": pa.array([], pa.list_(pa.float64())),
                "n": pa.array([], pa.int64()),
                "n_dangling": pa.array([], pa.int64()),
            }
        ))

    layout_refs = {
        c: _localize_cell.remote(
            csr_refs[c], c, P, static_refs[c // P], static_refs[c % P]
        )
        for c in live_cells
    }

    n_edges, mix = 0, 0
    panel_blocks = []
    live_csr = []
    for c in live_cells:
        ne, mx, dst_parts, min_bid = metas[c]
        n_edges += ne
        mix = (mix + mx) & _MASK
        panel_blocks.append((csr_refs[c], layout_refs[c], dst_parts, min_bid))
        live_csr.append(csr_refs[c])
    digest = hashlib.blake2b(
        f"{n_edges}:{mix}".encode(), digest_size=16
    ).hexdigest()
    if live_csr:
        blocks = rd.from_arrow_refs(live_csr)
    else:
        blocks = rd.from_arrow(pa.table({"src_part": pa.array([], pa.int64())}))
    return PartitionedGraph(
        blocks, static_ds, static_index, static_scalars, P, n_edges, digest,
        panel_blocks,
    )


def init_state(
    graph: PartitionedGraph,
    make_values,
    value_field: pa.DataType = pa.float64(),
    scalar_cols: list[str] | None = None,
) -> tuple[rd.Dataset, dict, dict]:
    """Build the iteration-0 state dataset from the static inventory:
    ``make_values(part, ids, outdeg) -> np.ndarray`` runs inside each task.
    Returns (materialized ds, index, scalars)."""

    def init_rows(t: pa.Table) -> pa.Table:
        parts, values = [], []
        for i in range(t.num_rows):
            part = int(t["part"][i].as_py())
            ids = t["ids"][i].values.to_numpy(zero_copy_only=False)
            outdeg = t["outdeg"][i].values.to_numpy(zero_copy_only=False)
            parts.append(part)
            v = make_values(part, ids, outdeg)
            values.append(v.tolist() if getattr(v, "dtype", None) == object else v)
        return pa.table(
            {
                "part": pa.array(parts, pa.int64()),
                "values": pa.array(values, pa.list_(value_field)),
            }
        )

    ds = graph.static.map_batches(init_rows, batch_format="pyarrow").materialize()
    index, scalars = index_state(ds, scalar_cols or [])
    return ds, index, scalars


def state_to_arrays(state: rd.Dataset, graph: PartitionedGraph):
    """RESULT DELIVERY (small-scale/test path): pull the final per-part rows
    and assemble globally sorted (ids, values). This is the only vertex-scale
    driver materialization left, and it happens once at the END for callers
    that want numpy arrays — the superstep loop itself never does this. At
    scale use ``state_to_dataset`` and keep streaming."""
    ids_parts, val_parts = [], []
    for b in state.iter_batches(batch_size=None, batch_format="pyarrow"):
        for i in range(b.num_rows):
            part = int(b["part"][i].as_py())
            (vals,) = _row_lists(b, i, ["values"])
            (ids,) = _row_lists(
                ray.get(graph.static_index[part][0]),
                graph.static_index[part][1],
                ["ids"],
            )
            ids_parts.append(ids)
            val_parts.append(vals)
    if not ids_parts:
        return np.empty(0, np.int64), np.empty(0)
    ids = np.concatenate(ids_parts)
    vals = np.concatenate(val_parts)
    order = np.argsort(ids, kind="stable")
    return ids[order], vals[order]


def state_to_dataset(
    state: rd.Dataset, graph: PartitionedGraph, value_name: str = "value"
) -> rd.Dataset:
    """Streaming result view: (vertex_id, value) rows, one task per part —
    the 100-TB-safe delivery path (feeds write_parquet / further stages)."""
    static_ref = ray.put(graph.static_index)

    def expand(t: pa.Table) -> pa.Table:
        sidx = ray.get(static_ref)
        ids_out, val_out = [], []
        for i in range(t.num_rows):
            part = int(t["part"][i].as_py())
            (vals,) = _row_lists(t, i, ["values"])
            ref, row = sidx[part]
            (ids,) = _row_lists(ray.get(ref), row, ["ids"])
            ids_out.append(ids)
            val_out.append(vals)
        if not ids_out:
            return pa.table({"vertex_id": pa.array([], pa.int64()),
                             value_name: pa.array([], pa.float64())})
        vals = np.concatenate(val_out)
        va = pa.array(vals.tolist()) if vals.dtype == object else pa.array(vals)
        return pa.table({"vertex_id": np.concatenate(ids_out), value_name: va})

    return state.map_batches(expand, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# partitioned checkpointing (per-part shards written BY THE UPDATE TASKS)
# ---------------------------------------------------------------------------

class PartitionedCheckpoint:
    """Same on-disk layout/manifest contract as state.checkpoint (lineage =
    partition id + iteration + input digest; manifest renamed LAST), but each
    shard is written by its own partition's update task — the driver never
    holds the vectors. Requires a path visible to all workers (shared FS /
    object store URI on a real cluster)."""

    def __init__(self, root: str, input_digest: str):
        self.root = root
        self.input_digest = input_digest
        os.makedirs(root, exist_ok=True)

    def tmp_dir(self, iteration: int) -> str:
        d = os.path.join(self.root, f"iter={iteration}.tmp")
        os.makedirs(d, exist_ok=True)
        return d

    @staticmethod
    def write_shard(tmp_dir: str, iteration: int, part: int, digest: str,
                    ids: np.ndarray, values: np.ndarray) -> None:
        t = pa.table({"vertex_id": ids, "value": values})
        t = t.replace_schema_metadata(
            {
                b"partition_id": str(part).encode(),
                b"iteration": str(iteration).encode(),
                b"input_digest": digest.encode(),
            }
        )
        pq.write_table(t, os.path.join(tmp_dir, f"part-{part}.parquet"))

    def commit(self, iteration: int, parts: list[int], meta: dict) -> None:
        import json
        import shutil

        tmp = os.path.join(self.root, f"iter={iteration}.tmp")
        manifest = {
            "iteration": iteration,
            "input_digest": self.input_digest,
            "parts": sorted(parts),
            "num_partitions": len(parts),
            "meta": meta,
        }
        with open(os.path.join(tmp, "MANIFEST.json"), "w") as f:
            json.dump(manifest, f)
        final = os.path.join(self.root, f"iter={iteration}")
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    def completed_iterations(self) -> list[int]:
        import json

        out = []
        if not os.path.isdir(self.root):
            return out
        for name in os.listdir(self.root):
            if not name.startswith("iter=") or name.endswith(".tmp"):
                continue
            mf = os.path.join(self.root, name, "MANIFEST.json")
            if not os.path.exists(mf):
                continue
            with open(mf) as f:
                m = json.load(f)
            if m.get("input_digest") == self.input_digest:
                out.append(m["iteration"])
        return sorted(out)

    def latest_meta(self):
        import json

        its = self.completed_iterations()
        if not its:
            return None
        it = its[-1]
        with open(os.path.join(self.root, f"iter={it}", "MANIFEST.json")) as f:
            return it, json.load(f)

    def shard_path(self, iteration: int, part: int) -> str:
        return os.path.join(self.root, f"iter={iteration}", f"part-{part}.parquet")

    def load_state(
        self, graph: PartitionedGraph, iteration: int,
        value_field: pa.DataType = pa.float64(),
    ):
        """Rebuild the state dataset from an iteration's shards — each part's
        shard is read INSIDE its own task (driver sees refs only)."""
        root = self.root

        def load_rows(t: pa.Table) -> pa.Table:
            parts, values = [], []
            for i in range(t.num_rows):
                part = int(t["part"][i].as_py())
                ids = t["ids"][i].values.to_numpy(zero_copy_only=False)
                shard = os.path.join(
                    root, f"iter={iteration}", f"part-{part}.parquet"
                )
                st = pq.read_table(shard)
                svid = st["vertex_id"].to_numpy()
                sval = st["value"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(svid, ids)
                vals = sval[pos]
                parts.append(part)
                values.append(vals)
            return pa.table(
                {
                    "part": pa.array(parts, pa.int64()),
                    "values": pa.array(values, pa.list_(value_field)),
                }
            )

        ds = graph.static.map_batches(load_rows, batch_format="pyarrow").materialize()
        index, _ = index_state(ds, [])
        return ds, index
