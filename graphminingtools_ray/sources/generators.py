"""Random graph DB generators — engine analog of the reference's ``ggen`` /
``cgen`` (``/root/reference/randomGraphGenerators.c:106-477``): synthesize a
transactional graph DB as a Ray Dataset, deterministically.

Shape: ``ray.data.range(n_graphs)`` → ``map_batches`` with a PER-GRAPH seeded
RNG (``PCG64(seed ^ graph_id)``) so output is independent of batching,
scheduling and ``num_cpus`` (SURVEY §4 determinism row; the reference's
process-global ``srand`` is exactly what we must not copy).

Emits the gdb long-row schema used by ``graph.gdb.graph_measures``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _tables_for_graphs(graph_rows) -> pa.Table:
    g_id, g_v, g_w = [], [], []
    v_id, v_vid = [], []
    for gid, n, edges in graph_rows:
        for v in range(1, n + 1):
            v_id.append(gid)
            v_vid.append(v)
        for v, w in edges:
            g_id.append(gid)
            g_v.append(v + 1)  # aids format is 1-based
            g_w.append(w + 1)
    return pa.table(
        {
            "kind": pa.array(["v"] * len(v_id) + ["e"] * len(g_id)),
            "graph_id": pa.array(v_id + g_id, pa.int64()),
            "a": pa.array(v_vid + g_v, pa.int64()),
            "b": pa.array([None] * len(v_id) + g_w, pa.int64()),
        }
    )


def erdos_renyi_db(
    n_graphs: int, n_vertices: int, edge_prob: float, seed: int = 42
) -> rd.Dataset:
    """G(n, p) per graph (reference ``erdosRenyi``): each of the C(n,2)
    undirected pairs present independently with probability p."""

    def gen(batch: pa.Table) -> pa.Table:
        rows = []
        for gid in batch["id"].to_pylist():
            rng = np.random.default_rng(np.random.PCG64(seed ^ (gid + 1)))
            iu = np.triu_indices(n_vertices, k=1)
            mask = rng.random(len(iu[0])) < edge_prob
            edges = list(zip(iu[0][mask].tolist(), iu[1][mask].tolist()))
            rows.append((gid, n_vertices, edges))
        return _tables_for_graphs(rows)

    return rd.range(n_graphs).map_batches(gen, batch_format="pyarrow")


def barabasi_albert_db(
    n_graphs: int, n_vertices: int, edges_per_vertex: int, seed: int = 42
) -> rd.Dataset:
    """Preferential attachment (reference ``barabasiAlbert``): each new vertex
    attaches to ``edges_per_vertex`` existing vertices, probability
    proportional to current degree."""

    def gen(batch: pa.Table) -> pa.Table:
        rows = []
        for gid in batch["id"].to_pylist():
            rng = np.random.default_rng(np.random.PCG64(seed ^ (gid + 1)))
            m = edges_per_vertex
            edges = []
            targets = list(range(m))  # initial clique-ish seed set
            repeated = []  # degree-weighted pool
            for v in range(m, n_vertices):
                chosen = set()
                pool = repeated if repeated else targets
                while len(chosen) < min(m, len(set(pool))):
                    chosen.add(pool[int(rng.integers(0, len(pool)))])
                for w in chosen:
                    edges.append((min(v, w), max(v, w)))
                    repeated.extend([v, w])
            rows.append((gid, n_vertices, edges))
        return _tables_for_graphs(rows)

    return rd.range(n_graphs).map_batches(gen, batch_format="pyarrow")


def gdb_from_long(long_ds: rd.Dataset):
    """Split the long-row form back into (gdb_vertices, gdb_edges) Datasets."""
    verts = long_ds.filter(expr="kind == 'v'").map_batches(
        lambda t: pa.table(
            {
                "graph_id": t["graph_id"],
                "vertex_id": t["a"].cast(pa.int32()),
                "label": pa.array(["x"] * t.num_rows),
            }
        ),
        batch_format="pyarrow",
    )
    edges = long_ds.filter(expr="kind == 'e'").map_batches(
        lambda t: pa.table(
            {
                "graph_id": t["graph_id"],
                "v": t["a"].cast(pa.int32()),
                "w": t["b"].cast(pa.int32()),
                "label": pa.array(["x"] * t.num_rows),
            }
        ),
        batch_format="pyarrow",
    )
    return verts, edges


def block_chain_db(
    n_graphs: int,
    n_blocks: int,
    block_size: int,
    diagonal_prob: float = 0.0,
    seed: int = 42,
) -> rd.Dataset:
    """Chain-of-blocks cactus-like generator (reference
    ``blockChainGenerator``, ``randomGraphGenerators.c:160-191``): each graph
    is a chain of ``n_blocks`` biconnected blocks of ``block_size`` vertices,
    consecutive blocks sharing one articulation vertex. A block is its
    Hamiltonian cycle (consecutive vertices + closing edge) plus random
    diagonals with probability ``diagonal_prob``. ``diagonal_prob=0`` yields
    a chain of simple cycles — a cactus, and outerplanar — the fixture class
    the cactus/outerplanarity kernels exist for."""

    def gen(batch: pa.Table) -> pa.Table:
        rows = []
        bs = block_size
        n_vertices = n_blocks * bs - n_blocks + 1
        for gid in batch["id"].to_pylist():
            rng = np.random.default_rng(np.random.PCG64(seed ^ (gid + 1)))
            edges = []
            for block_start in range(0, n_vertices - 1, bs - 1):
                have_closing = False
                for v in range(block_start, block_start + bs):
                    for w in range(v + 1, block_start + bs):
                        if (w - v == 1) or (rng.random() <= diagonal_prob):
                            edges.append((v, w))
                            if (v, w) == (block_start, block_start + bs - 1):
                                have_closing = True
                if not have_closing:
                    edges.append((block_start, block_start + bs - 1))
            rows.append((gid, n_vertices, edges))
        return _tables_for_graphs(rows)

    return rd.range(n_graphs).map_batches(gen, batch_format="pyarrow")


def _torus_dist(pts: np.ndarray) -> np.ndarray:
    """Pairwise wrap-around (unit torus) euclidean distances — reference
    ``euclideanDistanceWrap`` (``randomGraphGenerators.c:329``)."""
    d = np.abs(pts[:, None, :] - pts[None, :, :])
    d = np.minimum(d, 1.0 - d)
    return np.sqrt((d ** 2).sum(axis=2))


def overlap_db(
    n_graphs: int, n_vertices: int, d: float, seed: int = 42
) -> rd.Dataset:
    """Random geometric ("overlap") graphs (reference ``randomOverlapGraph``,
    ``randomGraphGenerators.c:353-371``): vertices are uniform points on the
    unit torus; edge iff wrap-around distance < ``d``. Vectorized pairwise
    distance per graph."""

    def gen(batch: pa.Table) -> pa.Table:
        rows = []
        for gid in batch["id"].to_pylist():
            rng = np.random.default_rng(np.random.PCG64(seed ^ (gid + 1)))
            pts = rng.random((n_vertices, 2))
            dist = _torus_dist(pts)
            iu = np.triu_indices(n_vertices, k=1)
            mask = dist[iu] < d
            edges = list(zip(iu[0][mask].tolist(), iu[1][mask].tolist()))
            rows.append((gid, n_vertices, edges))
        return _tables_for_graphs(rows)

    return rd.range(n_graphs).map_batches(gen, batch_format="pyarrow")


def clustered_overlap_db(
    n_graphs: int,
    n_vertices: int,
    d: float,
    n_clusters: int,
    mu: float,
    seed: int = 42,
) -> rd.Dataset:
    """Clustered geometric graphs (reference
    ``randomClusteredOverlapGraphWithLabels``,
    ``randomGraphGenerators.c:412-457``): ``n_clusters`` random centers on
    the unit torus, members = center + gaussian(``mu``) noise mirrored into
    the unit interval; edge iff wrap-around distance < ``d``. Vertex count
    rounds down to a multiple of ``n_clusters`` exactly as the reference
    does."""

    def gen(batch: pa.Table) -> pa.Table:
        per = n_vertices // n_clusters
        n = per * n_clusters
        rows = []
        for gid in batch["id"].to_pylist():
            rng = np.random.default_rng(np.random.PCG64(seed ^ (gid + 1)))
            pts = np.empty((n, 2))
            for c in range(n_clusters):
                center = rng.random(2)
                pts[c * per] = center
                noise = rng.normal(0.0, mu, size=(per - 1, 2))
                members = np.abs(center[None, :] + noise)
                members = np.where(members > 1.0, 2.0 - members, members)
                pts[c * per + 1: (c + 1) * per] = np.clip(members, 0.0, 1.0)
            dist = _torus_dist(pts)
            iu = np.triu_indices(n, k=1)
            mask = dist[iu] < d
            edges = list(zip(iu[0][mask].tolist(), iu[1][mask].tolist()))
            rows.append((gid, n, edges))
        return _tables_for_graphs(rows)

    return rd.range(n_graphs).map_batches(gen, batch_format="pyarrow")
