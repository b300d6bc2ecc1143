"""Single-process NumPy/SciPy oracles implementing the reference semantics
(FIXTURES.md §5). Run on the same edge lists as the engine; the engine must
match exactly (CC/WL/triangles) or allclose 1e-6 (PageRank)."""

from __future__ import annotations

import hashlib

import numpy as np


def _dense(pairs, directed: bool):
    pairs = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    ids = np.unique(pairs)
    n = len(ids)
    idx = {v: i for i, v in enumerate(ids)}
    A = np.zeros((n, n), dtype=np.float64)
    for s, d in pairs:
        A[idx[s], idx[d]] = 1.0
        if not directed:
            A[idx[d], idx[s]] = 1.0
    return ids, A


def pagerank_oracle(pairs, damping=0.85, tol=1e-6, max_iter=200, directed=True):
    ids, A = _dense(pairs, directed)
    n = len(ids)
    out = A.sum(axis=1)
    dangling = out == 0
    P = np.divide(A, np.where(dangling, 1.0, out)[:, None])
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        r2 = (1 - damping) / n + damping * (P.T @ np.where(dangling, 0.0, r)
                                            + r[dangling].sum() / n)
        if np.max(np.abs(r2 - r)) < tol:
            r = r2
            break
        r = r2
    return ids, r


def cc_oracle(pairs, extra_vertices=()):
    """Component id = min vertex id in component (reference normalization)."""
    pairs = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    verts = set(np.unique(pairs).tolist()) | set(extra_vertices)
    parent = {v: v for v in verts}

    def find(v):
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for s, d in pairs:
        if s == d:
            continue
        rs, rd_ = find(s), find(d)
        if rs != rd_:
            parent[max(rs, rd_)] = min(rs, rd_)
    ids = np.array(sorted(verts), dtype=np.int64)
    labels = np.array([find(v) for v in ids], dtype=np.int64)
    return ids, labels


def wl_oracle(pairs, iterations=1):
    """md5-signature WL per graphminingtools_ray.algos.wl (engine contract)."""
    pairs = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    ids = np.unique(pairs)
    neigh = {int(v): set() for v in ids}
    for s, d in pairs:
        if s == d:
            continue
        neigh[int(s)].add(int(d))
        neigh[int(d)].add(int(s))
    labels = {int(v): str(int(v)) for v in ids}
    for _ in range(iterations):
        new = {}
        for v in labels:
            sig = f"{labels[v]}|{','.join(sorted(labels[w] for w in neigh[v]))}"
            new[v] = hashlib.md5(sig.encode()).hexdigest()
        labels = new
    return ids, np.array([labels[int(v)] for v in ids], dtype=object)


def triangles_oracle(pairs):
    ids, A = _dense(pairs, directed=False)
    np.fill_diagonal(A, 0.0)
    A = (A > 0).astype(np.float64)
    per_vertex = (np.linalg.matrix_power(A, 3).diagonal() / 2).astype(np.int64)
    return ids, per_vertex, int(per_vertex.sum() // 3)


def lpa_oracle(pairs, max_iter=20, include_self=True, extra_vertices=()):
    """Synchronous majority-vote label propagation, engine contract
    (algos.labelprop): votes count half-edge multiplicity in the
    symmetrized multigraph (self-loops vote twice for the vertex itself),
    winner = max count then min label, optional self-vote of weight 1."""
    pairs = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    verts = sorted(set(np.unique(pairs).tolist()) | set(extra_vertices))
    half = [(int(s), int(d)) for s, d in pairs] + [
        (int(d), int(s)) for s, d in pairs
    ]
    labels = {v: v for v in verts}
    for _ in range(max_iter):
        votes = {v: {} for v in verts}
        for s, d in half:
            votes[d][labels[s]] = votes[d].get(labels[s], 0) + 1
        if include_self:
            for v in verts:
                votes[v][labels[v]] = votes[v].get(labels[v], 0) + 1
        new = {}
        for v in verts:
            if votes[v]:
                best = max(votes[v].items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
            else:
                new[v] = labels[v]
        if new == labels:
            labels = new
            break
        labels = new
    ids = np.array(verts, dtype=np.int64)
    return ids, np.array([labels[int(v)] for v in ids], dtype=np.int64)
