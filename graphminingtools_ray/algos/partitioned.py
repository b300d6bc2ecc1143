"""Co-partitioned vertex state for superstep algorithms.

Round-2 replacement of the driver-broadcast contract that lived in
``algos.common.broadcast_state``: NOTHING vertex- or edge-scale ever lands on
the driver any more.

- **Adjacency** is CSR sub-blocks PRE-PARTITIONED by ``part(src) =
  hash(src) % P`` and materialized once in the object store (the north-star's
  "per-partition CSR adjacency blocks", read zero-copy each superstep).
- **Vertex state** is a materialized Dataset with ONE Arrow row per
  partition: ``(part, ids list<int64>-aligned values list)``. The driver
  holds only ``{part: (block_ref, row_index)}`` plus per-part SCALARS
  (delta, dangling-mass partials, changed counts).
- **A superstep** is: ``map_batches`` over the pinned blocks — each task
  ``ray.get``s only its block's src-partition state (1/P of the vector,
  zero-copy shared memory) — per-block combiner, then ONE
  ``groupby(dst_part)`` exchange, then a per-partition update task that
  emits the next state row, its scalars, and its checkpoint shard.

The per-partition update runs each partition's float math in one task in a
canonical (dst, value) order, so results are bit-deterministic regardless of
Ray scheduling — the property the checkpoint/resume contract relies on.

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


@ray.remote
def _scan_panel_meta(block):
    """Tiny worker-side scan of a localized CSR block: (num_rows,
    sorted list of dst parts present, min_block_id). Each ROW belongs to one
    grid cell (single dst part), but a Ray block may concatenate several
    cells' rows — the contrib task splits its output per part."""
    if not isinstance(block, pa.Table):
        block = pa.table(block)
    if block.num_rows == 0:
        return 0, [], -1
    parts = set()
    for i in range(block.num_rows):
        pp = block["panel_parts"][i].values
        if len(pp):
            parts.add(int(pp[0].as_py()))
    min_bid = int(pa.compute.min(block["block_id"]).as_py())
    return block.num_rows, sorted(parts), min_bid


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

    def seed_messages(self, value_type=pa.float64()) -> rd.Dataset:
        """One sentinel PANEL row per present part so the per-part update
        group exists even for partitions that receive no real messages.
        Panel schema: (part, block_id=-1, dst list<int64>, partial list<T>)
        with empty payload lists."""
        k = len(self.parts)
        return rd.from_arrow(
            pa.table(
                {
                    "part": pa.array(self.parts, pa.int64()),
                    "block_id": pa.array([-1] * k, pa.int64()),
                    "dst": pa.array([[]] * k, pa.list_(pa.int32())),
                    "partial": pa.array([[]] * k, pa.list_(value_type)),
                }
            )
        )


def _csr_rows_for_part(t: pa.Table, target_edges: int,
                       include_weight: bool) -> pa.Table:
    """One grid CELL (all edges with part(src)=i, part(dst)=j) → CSR sub-block
    rows. 2D grid partitioning (src_part x dst_part) is what keeps the
    superstep exchange sub-edge-scale: a cell's per-dst partials cover at most
    V/P distinct dsts no matter how many edges it holds, so per-superstep
    exchange bytes are bounded by P * V * (1 - e^{-E/(P V)}) entries instead
    of E — the denser the graph, the bigger the win (combiner saturation)."""
    part = int(t["src_part"][0].as_py())
    cell = int(t["cell"][0].as_py())
    src = t["src"].to_numpy()
    dst = t["dst"].to_numpy()
    if include_weight and "weight" in t.column_names:
        w = t["weight"].to_numpy().astype(np.float64)
    else:
        w = np.ones(len(src), dtype=np.float64)
    rows = {k: [] for k in
            ("src_part", "block_id", "srcs", "src_index", "dst_unique",
             "dst_index", "weight", "n_edges", "mix")}
    for seq, lo in enumerate(range(0, max(1, len(src)), target_edges)):
        s = src[lo: lo + target_edges]
        d = dst[lo: lo + target_edges]
        ww = w[lo: lo + target_edges]
        srcs, src_index = np.unique(s, return_inverse=True)
        dst_unique, dst_index = np.unique(d, return_inverse=True)
        m = (s.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + d.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        # canonical global sub-block id: drives the deterministic panel
        # accumulation order in the per-partition update tasks
        rows["block_id"].append((cell << 32) | seq)
        rows["src_part"].append(part)
        rows["srcs"].append(srcs)
        rows["src_index"].append(src_index.astype(np.int32))
        rows["dst_unique"].append(dst_unique)
        rows["dst_index"].append(dst_index.astype(np.int32))
        rows["weight"].append(ww)
        rows["n_edges"].append(len(s))
        rows["mix"].append(int(m.sum(dtype=np.uint64)) & _MASK)
    cols = {
        "src_part": pa.array(rows["src_part"], pa.int64()),
        "block_id": pa.array(rows["block_id"], pa.int64()),
        "srcs": pa.array(rows["srcs"], pa.list_(pa.int64())),
        "src_index": pa.array(rows["src_index"], pa.list_(pa.int32())),
        "dst_unique": pa.array(rows["dst_unique"], pa.list_(pa.int64())),
        "dst_index": pa.array(rows["dst_index"], pa.list_(pa.int32())),
        "n_edges": pa.array(rows["n_edges"], pa.int64()),
        "mix": pa.array(rows["mix"], pa.uint64()),
    }
    if include_weight:
        cols["weight"] = pa.array(rows["weight"], pa.list_(pa.float64()))
    return pa.table(cols)


def split_panels(dst_unique: np.ndarray, partial: np.ndarray, P: int):
    """Split one CSR sub-block's per-dst partial vector by part(dst) into
    PANEL segments: returns (parts, dst_segments, partial_segments).

    Panels are the superstep exchange currency: ONE list-payload row per
    (sub-block, dst_part) instead of one scalar row per dst, so the sort-based
    ``groupby("part")`` exchange handles ~blocks x P rows per superstep (the
    payload bytes move either way — the per-row sort/shuffle overhead, which
    dominated at edge scale, does not). ``dst_unique`` is sorted ascending, so
    each stable-sorted segment is itself sorted → canonical within-panel order.
    """
    pk = int_bucket(dst_unique, P)
    order = np.argsort(pk, kind="stable")
    pk_s = pk[order]
    dst_s = dst_unique[order]
    par_s = partial[order]
    bounds = np.flatnonzero(np.diff(pk_s)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(pk_s)]))
    parts = pk_s[starts]
    return (
        parts,
        [dst_s[a:b] for a, b in zip(starts, ends)],
        [par_s[a:b] for a, b in zip(starts, ends)],
    )


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


def build_partitioned_graph(
    edges: rd.Dataset,
    P: int = 16,
    weighted: bool = False,
    target_edges_per_block: int = 1_000_000,
    extra_vertex_ids: np.ndarray | None = None,
) -> PartitionedGraph:
    """Edge table → PartitionedGraph. TWO one-time exchanges (blocks keyed by
    part(src); vertex inventory keyed by part(vertex)); every later superstep
    reuses both materialized datasets."""

    def tag(t: pa.Table) -> pa.Table:
        sp = int_bucket(t["src"].to_numpy(), P)
        dp = int_bucket(t["dst"].to_numpy(), P)
        t = t.append_column("src_part", pa.array(sp))
        return t.append_column("cell", pa.array(sp * P + dp))

    blocks = (
        edges.map_batches(tag, batch_format="pyarrow")
        .repartition(P)  # coalesce read-width blocks: sort cost tracks block count
        .groupby("cell")
        .map_groups(
            lambda t: _csr_rows_for_part(t, target_edges_per_block, weighted),
            batch_format="pyarrow",
        )
        .materialize()
    )

    # edge count + order-independent digest from the tiny per-sub-block scalars
    n_edges, mix, n_rows = 0, 0, 0
    for b in blocks.select_columns(["n_edges", "mix"]).iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        n_rows += b.num_rows
        n_edges += int(b["n_edges"].to_numpy().sum())
        mix = (mix + int(b["mix"].to_numpy().sum(dtype=np.uint64))) & _MASK

    digest = hashlib.blake2b(f"{n_edges}:{mix}".encode(), digest_size=16).hexdigest()

    # vertex inventory: batch-local combine → one exchange keyed part(vertex)
    def vertex_partials(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        if weighted and "weight" in t.column_names:
            w = t["weight"].to_numpy().astype(np.float64)
        else:
            w = np.ones(len(src), dtype=np.float64)
        usrc, inv = np.unique(src, return_inverse=True)
        sdeg = np.zeros(len(usrc), dtype=np.float64)
        np.add.at(sdeg, inv, w)
        udst = np.unique(dst)
        vid = np.concatenate([usrc, udst])
        deg = np.concatenate([sdeg, np.zeros(len(udst))])
        return pa.table(
            {
                "part": pa.array(int_bucket(vid, P)),
                "vertex_id": vid,
                "deg": deg,
            }
        )

    inventory = edges.map_batches(vertex_partials, batch_format="pyarrow")
    if extra_vertex_ids is not None and len(extra_vertex_ids):
        ev = np.asarray(extra_vertex_ids, dtype=np.int64)
        inventory = inventory.union(
            rd.from_arrow(
                pa.table(
                    {
                        "part": pa.array(int_bucket(ev, P)),
                        "vertex_id": ev,
                        "deg": np.zeros(len(ev), np.float64),
                    }
                )
            )
        )

    def static_combine(t: pa.Table) -> pa.Table:
        part = int(t["part"][0].as_py())
        vid = t["vertex_id"].to_numpy()
        deg = t["deg"].to_numpy()
        # canonical (vertex, deg) accumulation → bit-identical weighted sums
        order = np.lexsort((deg, vid))
        vid, deg = vid[order], deg[order]
        ids = np.unique(vid)
        acc = np.zeros(len(ids), dtype=np.float64)
        np.add.at(acc, np.searchsorted(ids, vid), deg)
        return pa.table(
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

    static = (
        inventory.repartition(P)
        .groupby("part")
        .map_groups(static_combine, batch_format="pyarrow")
        .repartition(P)  # compact away empty map_groups blocks
        .materialize()
    )
    static_index, static_scalars = index_state(static, ["n", "n_dangling"])

    # LOCALIZE post-pass (one-time): bake the per-superstep routing into the
    # blocks — dst_unique reordered by part(dst) with segment offsets, dst
    # and src positions resolved against the partition inventories. Each
    # build task reads the inventories of the parts its block touches
    # (zero-copy plasma, shared per node); supersteps then run with ZERO
    # hashing / sorting / searchsorted.
    sidx_ref = ray.put(static_index)

    def localize(batch: pa.Table) -> pa.Table:
        sidx = ray.get(sidx_ref)
        ids_cache: dict[int, np.ndarray] = {}

        def part_ids(p: int) -> np.ndarray:
            if p not in ids_cache:
                ref, row = sidx[p]
                (ids,) = _row_lists(ray.get(ref), row, ["ids"])
                ids_cache[p] = ids
            return ids_cache[p]

        out = {k: [] for k in ("dst_unique", "dst_index", "src_pos",
                               "panel_parts", "panel_offsets", "dst_local")}
        for row in range(batch.num_rows):
            part, srcs, src_index, dst_unique, dst_index, _ = unpack_part_block(
                batch, row
            )
            pk = int_bucket(dst_unique, P)
            order = np.argsort(pk, kind="stable")
            pk_s = pk[order]
            dst_s = dst_unique[order]
            inv = np.empty(len(order), dtype=np.int32)
            inv[order] = np.arange(len(order), dtype=np.int32)
            bounds = np.flatnonzero(np.diff(pk_s)) + 1
            starts = np.concatenate(([0], bounds)).astype(np.int32)
            offsets = np.concatenate((starts, [len(pk_s)])).astype(np.int32)
            panel_parts = pk_s[starts] if len(pk_s) else np.empty(0, np.int64)
            dst_local = np.empty(len(dst_s), dtype=np.int32)
            for j, p in enumerate(panel_parts):
                a, b = offsets[j], offsets[j + 1]
                dst_local[a:b] = np.searchsorted(part_ids(int(p)), dst_s[a:b])
            out["dst_unique"].append(dst_s)
            out["dst_index"].append(inv[dst_index])
            out["src_pos"].append(
                np.searchsorted(part_ids(part), srcs).astype(np.int32)
            )
            out["panel_parts"].append(panel_parts.astype(np.int64))
            out["panel_offsets"].append(offsets)
            out["dst_local"].append(dst_local)
        t = batch.drop_columns(["dst_unique", "dst_index"])
        for name, typ in (
            ("dst_unique", pa.list_(pa.int64())),
            ("dst_index", pa.list_(pa.int32())),
            ("src_pos", pa.list_(pa.int32())),
            ("panel_parts", pa.list_(pa.int64())),
            ("panel_offsets", pa.list_(pa.int32())),
            ("dst_local", pa.list_(pa.int32())),
        ):
            t = t.append_column(name, pa.array(out[name], typ))
        return t

    blocks = blocks.map_batches(localize, batch_format="pyarrow").materialize()

    # per-block routing table for the direct (raw-task) panel exchange: every
    # non-empty block holds CSR rows of exactly ONE grid cell, so all its
    # panels target a single dst part — the driver can route contrib outputs
    # to update tasks by ref, no sort exchange. Only refs + 2 ints per block
    # ever reach the driver.
    refs = _block_refs(blocks)
    metas = ray.get([_scan_panel_meta.remote(r) for r in refs])
    panel_blocks = sorted(
        (
            (ref, parts, min_bid)
            for ref, (nrows, parts, min_bid) in zip(refs, metas)
            if nrows > 0 and parts
        ),
        key=lambda x: x[2],
    )
    return PartitionedGraph(
        blocks, static, static_index, static_scalars, P, n_edges, digest,
        panel_blocks,
    )


# ---------------------------------------------------------------------------
# state construction / collection
# ---------------------------------------------------------------------------

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
