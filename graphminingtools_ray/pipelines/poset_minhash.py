"""Min-hashing over a pattern poset — the reference's probabilistic
feature-sketching suite (``/root/reference/minhashing.c``):

- ``build_tree_poset`` (minhashing.c:302-331 buildTreePosetFromGraphDB):
  given a downward-closed list of canonical TREE-pattern strings, build the
  DAG F with vertex 0 = the empty pattern and an edge p → q iff
  |V(p)| = |V(q)| − 1 and p is subgraph-isomorphic to q. Edges are found the
  reference's way (minhashing.c:188-278 addEdgesFromSubtrees): remove each
  leaf of q, canonicalize, look the string up in the pattern dictionary.
- ``shrink_permutation`` (minhashing.c:62-95 posetPermutationMark/Shrink):
  drop every position whose pattern is a superpattern of an earlier kept
  one — those can never be the min-hash of a monotone feature set.
- ``build_evaluation_plan`` (minhashing.c:124-168): interleave the K shrunk
  permutations level by level, each level sorted by pattern id, so small
  patterns are probed first.
- ``minhash_sketch_for_graph`` (minhashing.c:444-487 fastMinHashForTrees):
  walk the plan; evaluate the embedding operator only when the poset has not
  already decided the pattern; propagate every result monotonically (match ⇒
  all subpatterns match, minhashing.c:356-369 rayOfLight; non-match ⇒ all
  superpatterns fail, :377-390 rayOfDoom). The sketch entry for permutation
  k is the level of its first match, −1 if none.
- ``bfs_feature_set`` (minhashing.c:583-640 bfsEmbeddingForTrees +
  :426-434 patternPosetInfoToFeatureSet): exact matched-pattern set via a
  BFS over the poset from the minimal patterns, never descending past a
  non-match.

Embedding operators (selectable like the reference's fastMinHashFor* family):
``subtree`` = exact tree-in-graph embedding, ``abs_importance`` /
``rel_importance`` = the component-frequency operators of
``importantSubtrees.c:78-112`` (pattern must embed in ≥ t connected
components of the transaction, absolutely or relatively).

Distributed shape: the pattern set is SMALL (a mined frequent-tree set) — the
poset + evaluation plan are built once on the driver and broadcast with
``ray.put``; the graph DB streams through ONE bucketed exchange keyed on
graph_id and each bucket evaluates its graphs against the broadcast plan
(no shuffle of pattern state, no driver-side per-graph work).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..algos.subtree_iso import tree_in_graph
from ..functions.bucketing import bucketed_group_combine
from ..functions.cstring import canonical_tree_string, parse_cstring


# --- poset construction (driver side, pattern-set scale) ---------------------


class TreePoset:
    """Pattern poset over canonical tree strings. Vertex 0 is the empty
    pattern; pattern ids are 1..n_patterns in order of increasing vertex
    count (ties by string), like the reference's reordering
    (minhashing.c:304-311)."""

    def __init__(self, patterns: list[str]):
        parsed = [(p, *parse_cstring(p)) for p in patterns]
        parsed.sort(key=lambda t: (len(t[1]), t[0]))
        self.strings = [p for p, _, _ in parsed]
        self.vertices = [v for _, v, _ in parsed]
        self.edges = [e for _, _, e in parsed]
        self.n = len(parsed) + 1  # + empty pattern
        ids = {p: i + 1 for i, (p, _, _) in enumerate(parsed)}
        if len(ids) != len(parsed):
            raise ValueError("duplicate patterns in poset input")
        # up[p] = direct superpatterns, down[q] = direct subpatterns
        self.up: list[list[int]] = [[] for _ in range(self.n)]
        self.down: list[list[int]] = [[] for _ in range(self.n)]
        for qid in range(1, self.n):
            qv, qe = self.vertices[qid - 1], self.edges[qid - 1]
            parents: set[int] = set()
            if len(qv) == 1:
                parents.add(0)  # singletons hang off the empty pattern
            else:
                deg: dict = {v: 0 for v in qv}
                for a, b, _ in qe:
                    deg[a] += 1
                    deg[b] += 1
                for leaf in [v for v, d in deg.items() if d == 1]:
                    sv = {v: l for v, l in qv.items() if v != leaf}
                    se = [e for e in qe if leaf not in (e[0], e[1])]
                    c = canonical_tree_string(sv, se)
                    pid = ids.get(c)
                    if pid is not None:
                        parents.add(pid)
            if not parents:
                # minimal pattern not generated from a leaf removal: attach
                # to the empty pattern (minhashing.c:252-259)
                parents.add(0)
            for pid in sorted(parents):
                self.up[pid].append(qid)
                self.down[qid].append(pid)

    def up_set(self, pid: int) -> set[int]:
        """All superpatterns reachable from pid (pid included)."""
        out = {pid}
        stack = [pid]
        while stack:
            v = stack.pop()
            for w in self.up[v]:
                if w not in out:
                    out.add(w)
                    stack.append(w)
        return out


def shrink_permutation(perm: list[int], poset: TreePoset) -> list[int]:
    """Keep position i only if perm[i] is not a superpattern of any earlier
    kept pattern (posetPermutationMark semantics: mark the up-set of every
    kept pattern; marked later positions can never be the min-hash)."""
    marked = np.zeros(poset.n, dtype=bool)
    kept = []
    for pid in perm:
        if not marked[pid]:
            kept.append(pid)
            for w in poset.up_set(pid):
                marked[w] = True
    return kept


def build_evaluation_plan(
    poset: TreePoset, sketch_size: int, seed: int = 42
) -> dict:
    """K seeded random permutations of pattern ids 1..n, shrunk, interleaved
    level-by-level with each level sorted by pattern id
    (minhashing.c:138-155). Returns a plain dict (ray.put-able)."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    shrunk: list[list[int]] = []
    for _ in range(sketch_size):
        perm = list(rng.permutation(poset.n - 1) + 1)
        shrunk.append(shrink_permutation(perm, poset))
    max_len = max((len(s) for s in shrunk), default=0)
    order: list[tuple[int, int]] = []  # (permutation index, level)
    for level in range(max_len):
        batch = [(k, level) for k in range(sketch_size)
                 if level < len(shrunk[k])]
        batch.sort(key=lambda kl: shrunk[kl[0]][kl[1]])
        order.extend(batch)
    return {
        "poset": poset,
        "shrunk": shrunk,
        "order": order,
        "sketch_size": sketch_size,
    }


# --- embedding operators (importantSubtrees.c) --------------------------------


def _components(vertices: dict, edges: list):
    adj: dict = {v: [] for v in vertices}
    for a, b, el in edges:
        adj[a].append(b)
        adj[b].append(a)
    seen: set = set()
    for s in vertices:
        if s in seen:
            continue
        comp = {s}
        seen.add(s)
        stack = [s]
        while stack:
            v = stack.pop()
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    comp.add(w)
                    stack.append(w)
        yield comp


def importance_count(
    p_vertices: dict, p_edges: list, g_vertices: dict, g_edges: list
) -> int:
    """Number of connected components of the host in which the pattern
    embeds (importantSubtrees.c:78-88 importanceCount)."""
    freq = 0
    for comp in _components(g_vertices, g_edges):
        cv = {v: g_vertices[v] for v in comp}
        ce = [e for e in g_edges if e[0] in comp]
        if tree_in_graph(p_vertices, p_edges, cv, ce):
            freq += 1
    return freq


def importance_relative(
    p_vertices: dict, p_edges: list, g_vertices: dict, g_edges: list
) -> float:
    """importanceCount / #components (importantSubtrees.c:90-102)."""
    n_comp = 0
    freq = 0
    for comp in _components(g_vertices, g_edges):
        n_comp += 1
        cv = {v: g_vertices[v] for v in comp}
        ce = [e for e in g_edges if e[0] in comp]
        if tree_in_graph(p_vertices, p_edges, cv, ce):
            freq += 1
    return freq / n_comp if n_comp else 0.0


def make_match_op(operator: str, threshold: float):
    """Embedding operator factory mirroring fastMinHashForTrees /
    ForAbsImportantTrees / ForRelImportantTrees (minhashing.c:444-576) plus
    the ForLocalEasy family (poset_pathCover.c:770-864): ``local_easy`` is
    the sampled SpanningtreeTree operator (``algos.local_easy``; threshold =
    k spanning trees per block, fixed seed ⇒ deterministic and monotone per
    host, so the poset propagation stays sound); one-sided — matches are
    certificates, misses may be false negatives."""
    if operator == "subtree":
        return lambda pv, pe, gv, ge: tree_in_graph(pv, pe, gv, ge)
    if operator == "abs_importance":
        return lambda pv, pe, gv, ge: (
            importance_count(pv, pe, gv, ge) >= threshold
        )
    if operator == "rel_importance":
        return lambda pv, pe, gv, ge: (
            importance_relative(pv, pe, gv, ge) >= threshold
        )
    if operator == "local_easy":
        # the reference's EXACT localEasy (levelwiseGraphMiningHelp.txt:70:
        # "the exact/correct/complete local easy subtree isomorphism
        # algorithm"): exhaustive per-block spanning-tree listing. Only
        # feasible on low-local-easiness hosts — blocks past the listing cap
        # fall back to sampling and the operator degrades to one-sided
        # (the reference would simply take forever there).
        from ..algos.local_easy import local_easy_match

        cache: dict = {}
        return lambda pv, pe, gv, ge: local_easy_match(
            pv, pe, gv, ge, k=64, seed=0, exact_cap=200_000,
            host_cache=cache,
        )[0]
    if operator == "local_easy_sampled":
        # the ts/localEasySampling family (help :110-185): k spanning trees
        # per block, one-sided by design; threshold = k
        from ..algos.local_easy import local_easy_match

        k = int(threshold) if threshold else 8
        cache: dict = {}
        return lambda pv, pe, gv, ge: local_easy_match(
            pv, pe, gv, ge, k=k, seed=0, exact_cap=2, host_cache=cache
        )[0]
    if operator in ("ps", "probabilistic_tree_sampling"):
        # the reference's `lwg -e ps` (initProbabilisticTreeMiningForGraphDB,
        # lwm_initAndCollect.c:728): the transaction is replaced by the
        # forest of k sampled spanning trees per component and the support
        # predicate is exact subtree iso against that forest. One-sided
        # (matches are certificates) and monotone per host (a subpattern of
        # a matching pattern matches the same forest), so poset propagation
        # stays sound.
        from ..algos.subtree_iso import tree_in_graph as _tig
        from ..graph.sampling import sampled_spanning_forest

        k = int(threshold) if threshold else 8
        cache: dict = {}

        def _ps(pv, pe, gv, ge):
            key = (id(gv), id(ge))
            if key not in cache:
                cache[key] = sampled_spanning_forest(gv, ge, k=k, seed=23)
            fv, fe = cache[key]
            return _tig(pv, pe, fv, fe)

        return _ps
    if operator in ("global_tree_enumeration", "exact_global_tree_enumeration"):
        # `lwg -e exactGlobalTreeEnumeration` (lwm_initAndCollect.c:676)
        # expands every transaction into ALL its spanning trees and runs the
        # exact subtree operator on the expansion. A tree pattern embeds in
        # some spanning tree of a connected host iff it embeds in the host
        # (any forest subgraph of a connected graph extends to a spanning
        # tree), so the predicate equals exact subtree iso on the original
        # transaction — evaluated directly instead of materializing the
        # exponential expansion.
        return lambda pv, pe, gv, ge: tree_in_graph(pv, pe, gv, ge)
    if operator == "tree_enumeration":
        # `lwg -e treeEnumeration` (alwaysReturnTrue,
        # levelwiseGraphMiningMain.c:252-257): pure pattern enumeration —
        # support = the full candidate support superset.
        return lambda pv, pe, gv, ge: True
    if operator in ("local_easy_resampled", "bps_resampling"):
        # localEasySubtreeCheckOperatorWithResampling (`lwg -e
        # bps_resampling`): fresh per-block spanning-tree samples on EVERY
        # evaluation instead of one fixed SpanningtreeTree per host — better
        # pattern coverage, but match(q) and match(p ⊑ q) see different
        # trees, so this operator is NOT poset-monotone; it is only for the
        # levelwise miner's direct support counting. Deterministic: the seed
        # derives from the pattern, so reruns resample identically.
        import zlib

        from ..algos.local_easy import local_easy_match

        k = int(threshold) if threshold else 8

        def _ler(pv, pe, gv, ge):
            pkey = repr((sorted(pv.items()), sorted(pe)))
            seed = zlib.crc32(pkey.encode())
            return local_easy_match(
                pv, pe, gv, ge, k=k, seed=seed, exact_cap=2
            )[0]

        return _ler
    if operator in ("hops_matching", "hops_estimate_matching"):
        # the matching-based HOPS family (FKM / the `-e hops` FKF default):
        # joint children embedding via uniformly-drawn saturating matchings
        # with permanent weights — unbiased, lower variance.
        from ..algos.subtree_iso import hops_embedding_estimate_matching

        n = int(threshold) if threshold else 32
        return lambda pv, pe, gv, ge: (
            hops_embedding_estimate_matching(
                pv, pe, gv, ge, n_samples=n, seed=17
            )
            > 0.0
        )
    if operator in ("hops", "hops_simple"):
        # the one-child-at-a-time (FK / `hops_simple`) estimator;
        # rootedHopsOperator shape (lwmr_embeddingOperators.c:52-77 /
        # subtreeIsomorphismSampling.c): repeat a randomized embedding
        # attempt `threshold` times, match on any success — one-sided.
        # hops_embedding_estimate counts successes internally: a nonzero
        # estimate over n_samples trials == at least one sampled embedding.
        from ..algos.subtree_iso import hops_embedding_estimate

        n = int(threshold) if threshold else 32
        return lambda pv, pe, gv, ge: (
            hops_embedding_estimate(pv, pe, gv, ge, n_samples=n, seed=17)
            > 0.0
        )
    raise ValueError(f"unknown embedding operator {operator!r}")


# --- per-graph sketch evaluation ----------------------------------------------


def minhash_sketch_for_graph(
    plan: dict, g_vertices: dict, g_edges: list, match_op=None
) -> tuple[list[int], int]:
    """(sketch, n_evaluations) for one transaction graph
    (minhashing.c:444-487). state[pid] ∈ {0 unknown, 1 match, −1 no-match};
    every explicit evaluation is propagated through the poset so later plan
    entries reuse it.

    Deviation noted for parity auditing: the reference's loop records
    sketch[k] only when it RE-encounters a pattern already marked positive
    (minhashing.c:467-474), so a match discovered by direct evaluation at
    its own (k, level) slot never sets sketch[k]. We implement the evidently
    intended min-hash semantics — sketch[k] = level of the FIRST matching
    pattern in shrunk permutation k — which the brute-force oracle in
    tests/test_poset_minhash.py pins down."""
    poset: TreePoset = plan["poset"]
    match_op = match_op or make_match_op("subtree", 0)
    state = np.zeros(poset.n, dtype=np.int8)
    state[0] = 1  # the empty pattern matches everything
    sketch = [-1] * plan["sketch_size"]
    n_eval = 0
    for k, level in plan["order"]:
        if sketch[k] != -1:
            continue
        pid = plan["shrunk"][k][level]
        if state[pid] == 0:
            pv, pe = poset.vertices[pid - 1], poset.edges[pid - 1]
            n_eval += 1
            if match_op(pv, pe, g_vertices, g_edges):
                _propagate_match(poset, pid, state)
            else:
                _propagate_nonmatch(poset, pid, state)
        if state[pid] == 1:
            sketch[k] = level
    return sketch, n_eval


def _propagate_match(poset: TreePoset, pid: int, state: np.ndarray):
    """rayOfLight: every subpattern of a match is a match."""
    stack = [pid]
    state[pid] = 1
    while stack:
        v = stack.pop()
        for w in poset.down[v]:
            if state[w] != 1:
                state[w] = 1
                stack.append(w)


def _propagate_nonmatch(poset: TreePoset, pid: int, state: np.ndarray):
    """rayOfDoom: every superpattern of a non-match is a non-match."""
    stack = [pid]
    state[pid] = -1
    while stack:
        v = stack.pop()
        for w in poset.up[v]:
            if state[w] != -1:
                state[w] = -1
                stack.append(w)


def bfs_feature_set(
    poset: TreePoset, g_vertices: dict, g_edges: list, match_op=None
) -> set[int]:
    """Exact matched-pattern-id set via monotone BFS from the minimal
    patterns (bfsEmbeddingForTrees): children of a pattern are enqueued only
    when it matches, so the subtree below any non-match is never evaluated."""
    match_op = match_op or make_match_op("subtree", 0)
    state = np.zeros(poset.n, dtype=np.int8)
    state[0] = 1
    out: set[int] = set()
    queue = list(poset.up[0])
    seen = set(queue)
    while queue:
        pid = queue.pop(0)
        if state[pid] == 0:
            pv, pe = poset.vertices[pid - 1], poset.edges[pid - 1]
            if match_op(pv, pe, g_vertices, g_edges):
                _propagate_match(poset, pid, state)
            else:
                _propagate_nonmatch(poset, pid, state)
        if state[pid] == 1:
            out.add(pid)
            for w in poset.up[pid]:
                if w not in seen:
                    seen.add(w)
                    queue.append(w)
    return out


def projection_embedding_for_graph(
    poset: TreePoset,
    projection: list[int],
    g_vertices: dict,
    g_edges: list,
    match_op=None,
) -> tuple[np.ndarray, int]:
    """Dot-product approximation by random projection
    (minhashing.c:747-790 fullEmbeddingProjectionApproximationForTrees):
    evaluate (at most) the patterns in ``projection``, propagate each result
    through the poset, and return the induced PARTIAL embedding of the graph
    into the full pattern space — an int8 array indexed by pattern_id − 1
    with value 1 (known match), −1 (known non-match) or 0 (undecided).
    Propagation means a projection of size s can decide far more than s
    coordinates. Second return: explicit evaluations spent (≤ len(projection),
    less when earlier propagation already decided a projected pattern)."""
    match_op = match_op or make_match_op("subtree", 0)
    state = np.zeros(poset.n, dtype=np.int8)
    state[0] = 1  # the empty pattern matches everything
    n_eval = 0
    for pid in projection:
        if state[pid] == 0:
            pv, pe = poset.vertices[pid - 1], poset.edges[pid - 1]
            n_eval += 1
            if match_op(pv, pe, g_vertices, g_edges):
                _propagate_match(poset, pid, state)
            else:
                _propagate_nonmatch(poset, pid, state)
    return state[1:].copy(), n_eval


def positive_border_size(poset: TreePoset, matched: set[int]) -> int:
    """Number of maximal matched patterns + the empty pattern if nothing
    matched above it (getPositiveBorderSize semantics, minhashing.c:411-421:
    a vertex is in the border iff all its direct superpatterns are
    non-matches — note vertex 0 counts when all its children fail)."""
    border = 0
    for v in range(poset.n):
        if v != 0 and v not in matched:
            continue
        if all(w not in matched for w in poset.up[v]):
            border += 1
    return border


# --- the distributed pipeline --------------------------------------------------


def poset_minhash_sketches(
    graph_edges: rd.Dataset,
    patterns: list[str],
    sketch_size: int = 8,
    seed: int = 42,
    operator: str = "subtree",
    threshold: float = 0,
) -> rd.Dataset:
    """Sketch every transaction graph against a broadcast evaluation plan.

    ``graph_edges`` is the per-order long table of
    ``mining.order_graph_edges_full`` (columns graph_id, va, ba, vb, bb, le).
    Output: one row per (graph_id, perm) with the sketch level, the matched
    pattern id at that level (−1 = no match in that permutation), and the
    number of explicit embedding evaluations spent on the graph (the
    poset's whole point is that this is ≪ n_patterns)."""
    poset = TreePoset(patterns)
    plan = build_evaluation_plan(poset, sketch_size, seed=seed)
    plan_ref = ray.put(plan)

    def sketch_bucket(t: pa.Table) -> pa.Table:
        plan_ = ray.get(plan_ref)
        match_op = make_match_op(operator, threshold)
        df = t.to_pandas()
        gids, perms, levels, pids, evals = [], [], [], [], []
        for gid, g in df.groupby("graph_id", sort=False):
            vertices: dict = {}
            edges = []
            for r in g.itertuples():
                vertices[int(r.va)] = r.ba
                vertices[int(r.vb)] = r.bb
                edges.append((int(r.va), int(r.vb), r.le))
            sketch, n_eval = minhash_sketch_for_graph(
                plan_, vertices, edges, match_op
            )
            for k, level in enumerate(sketch):
                gids.append(int(gid))
                perms.append(k)
                levels.append(level)
                pids.append(
                    plan_["shrunk"][k][level] if level >= 0 else -1
                )
                evals.append(n_eval)
        return pa.table(
            {
                "graph_id": pa.array(gids, pa.int64()),
                "perm": pa.array(perms, pa.int64()),
                "sketch_level": pa.array(levels, pa.int64()),
                "pattern_id": pa.array(pids, pa.int64()),
                "n_evaluations": pa.array(evals, pa.int64()),
            }
        )

    return bucketed_group_combine(graph_edges, ["graph_id"], sketch_bucket)


def poset_projection_embeddings(
    graph_edges: rd.Dataset,
    patterns: list[str],
    projection_size: int = 8,
    seed: int = 42,
    operator: str = "subtree",
    threshold: float = 0,
) -> rd.Dataset:
    """Random-projection approximate embeddings of every transaction graph
    into the full pattern space (minhashing.c:747-790): a seeded random
    subset of ``projection_size`` pattern ids is drawn once on the driver and
    broadcast; each graph evaluates only those patterns and lets poset
    propagation decide the rest. Output is SPARSE — one row per DECIDED
    (graph_id, pattern_id) with value ∈ {1, −1}; undecided coordinates are
    the implicit zeros of the reference's {0,1,−1} output array.
    ``n_evaluations`` (per graph, repeated on its rows) records the explicit
    embedding-operator calls actually spent."""
    poset = TreePoset(patterns)
    rng = np.random.default_rng(seed)
    projection = (
        (rng.permutation(poset.n - 1)[: min(projection_size, poset.n - 1)] + 1)
        .tolist()
        if poset.n > 1
        else []
    )
    plan_ref = ray.put({"poset": poset, "projection": projection})

    def embed_bucket(t: pa.Table) -> pa.Table:
        plan_ = ray.get(plan_ref)
        po, proj = plan_["poset"], plan_["projection"]
        match_op = make_match_op(operator, threshold)
        df = t.to_pandas()
        gids, pids, vals, evals = [], [], [], []
        for gid, g in df.groupby("graph_id", sort=False):
            vertices: dict = {}
            edges = []
            for r in g.itertuples():
                vertices[int(r.va)] = r.ba
                vertices[int(r.vb)] = r.bb
                edges.append((int(r.va), int(r.vb), r.le))
            emb, n_eval = projection_embedding_for_graph(
                po, proj, vertices, edges, match_op
            )
            nz = np.flatnonzero(emb)
            gids.append(np.full(len(nz), int(gid), np.int64))
            pids.append((nz + 1).astype(np.int64))
            vals.append(emb[nz].astype(np.int64))
            evals.append(np.full(len(nz), n_eval, np.int64))
        e = np.empty(0, np.int64)
        return pa.table(
            {
                "graph_id": np.concatenate(gids) if gids else e,
                "pattern_id": np.concatenate(pids) if pids else e,
                "value": np.concatenate(vals) if vals else e,
                "n_evaluations": np.concatenate(evals) if evals else e,
            }
        )

    return bucketed_group_combine(graph_edges, ["graph_id"], embed_bucket)


def sketch_jaccard_estimate(
    sketches: pd.DataFrame, gid_a: int, gid_b: int
) -> float:
    """Jaccard similarity estimate between two graphs' pattern feature sets:
    fraction of permutations whose min-hash PATTERN agrees (the estimator
    the sketches exist for)."""
    a = sketches[sketches["graph_id"] == gid_a].set_index("perm")["pattern_id"]
    b = sketches[sketches["graph_id"] == gid_b].set_index("perm")["pattern_id"]
    perms = a.index.intersection(b.index)
    if len(perms) == 0:
        return 0.0
    both_empty = (a[perms] == -1) & (b[perms] == -1)
    agree = (a[perms] == b[perms]) & ~both_empty
    return float(agree.sum()) / len(perms)


# --- exact full-space embeddings via poset path covers ------------------------
# (the reference's poset_pathCover.c family — the EXACT counterpart that the
# min-hash sketch and random-projection paths above approximate)


def minimum_path_cover(poset: TreePoset) -> list[list[int]]:
    """Minimum vertex-disjoint path cover of the pattern poset DAG
    (vertices 1..n-1; chains follow direct poset edges), via Dilworth /
    König: min cover size = n_patterns − max bipartite matching on the
    split graph (reference ``poset_pathCover.c:250-330``
    getPathCoverOfPoset* computes the same cover with max-flow; Kuhn's
    augmenting paths suffice at pattern scale). Deterministic: vertices and
    neighbors are scanned in ascending id order."""
    n = poset.n
    match_r: dict[int, int] = {}  # right vertex -> matched left vertex
    match_l: dict[int, int] = {}  # left vertex -> matched right vertex

    def try_augment(u: int, seen: set[int]) -> bool:
        for w in poset.up[u]:
            if w in seen:
                continue
            seen.add(w)
            if w not in match_r or try_augment(match_r[w], seen):
                match_r[w] = u
                match_l[u] = w
                return True
        return False

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 2 * n + 100))
    try:
        for u in range(1, n):
            try_augment(u, set())
    finally:
        sys.setrecursionlimit(old_limit)
    heads = [v for v in range(1, n) if v not in match_r]
    paths = []
    for h in heads:
        path = [h]
        while path[-1] in match_l:
            path.append(match_l[path[-1]])
        paths.append(path)
    return paths


def _binary_search_path(
    path: list[int], state: np.ndarray, poset: TreePoset, match_op,
    g_vertices: dict, g_edges: list,
) -> int:
    """Binary-search the match frontier along an ascending poset chain
    (``poset_pathCover.c:505-530`` binarySearchEvaluation): matches form a
    prefix (antitone indicator), every probe propagates through the poset,
    so the whole chain is decided with O(log len) explicit evaluations."""
    n_eval = 0
    lo, hi = 0, len(path) - 1
    while lo <= hi:
        mid = (lo + hi) // 2
        pid = path[mid]
        if state[pid] == 0:
            pv, pe = poset.vertices[pid - 1], poset.edges[pid - 1]
            n_eval += 1
            if match_op(pv, pe, g_vertices, g_edges):
                _propagate_match(poset, pid, state)
            else:
                _propagate_nonmatch(poset, pid, state)
        if state[pid] == 1:
            lo = mid + 1
        else:
            hi = mid - 1
    return n_eval


def exact_embedding_for_graph(
    poset: TreePoset,
    g_vertices: dict,
    g_edges: list,
    strategy: str = "static_path_cover",
    paths: list[list[int]] | None = None,
    match_op=None,
) -> tuple[set[int], int]:
    """EXACT matched-pattern-id set over the full poset for one graph, with
    the number of explicit embedding evaluations spent — the engine analog
    of the reference's exact full-space evaluation strategies
    (``poset_pathCover.c:673-734``):

    - ``static_path_cover`` — binary-search every chain of a precomputed
      minimum path cover (staticPathCoverEmbeddingForTrees; pass ``paths``
      from ``minimum_path_cover`` to amortize it across graphs);
    - ``lattice_path`` — for each undecided pattern in id order, walk a
      greedy maximal chain upward through undecided direct superpatterns
      and binary-search it (latticePathEmbeddingForTrees + getPathInDAG);
    - ``dfs_downward`` — depth-first ray search from the minimal patterns
      (dfsDownwardEmbeddingForTrees + dfsRaySearch);
    - ``bfs`` — the existing monotone BFS (``bfs_feature_set``).

    All strategies return the same exact set; they differ only in the
    number of evaluations (the chain strategies win on deep posets)."""
    match_op = match_op or make_match_op("subtree", 0)
    state = np.zeros(poset.n, dtype=np.int8)
    state[0] = 1
    n_eval = 0

    def evaluate(pid: int):
        nonlocal n_eval
        pv, pe = poset.vertices[pid - 1], poset.edges[pid - 1]
        n_eval += 1
        if match_op(pv, pe, g_vertices, g_edges):
            _propagate_match(poset, pid, state)
        else:
            _propagate_nonmatch(poset, pid, state)

    if strategy == "static_path_cover":
        if paths is None:
            paths = minimum_path_cover(poset)
        for path in paths:
            n_eval += _binary_search_path(
                path, state, poset, match_op, g_vertices, g_edges
            )
    elif strategy == "lattice_path":
        for v in range(1, poset.n):
            if state[v] != 0:
                continue
            path = [v]
            while True:
                nxt = next(
                    (w for w in poset.up[path[-1]] if state[w] == 0), None
                )
                if nxt is None:
                    break
                path.append(nxt)
            n_eval += _binary_search_path(
                path, state, poset, match_op, g_vertices, g_edges
            )
    elif strategy == "dfs_downward":
        def ray(pid: int):
            if state[pid] != 0:
                return
            pv, pe = poset.vertices[pid - 1], poset.edges[pid - 1]
            nonlocal n_eval
            n_eval += 1
            if match_op(pv, pe, g_vertices, g_edges):
                # recurse into superpatterns BEFORE marking, like the
                # reference (updateEvaluationPlan runs after the recursion)
                for w in poset.up[pid]:
                    ray(w)
                _propagate_match(poset, pid, state)
            else:
                _propagate_nonmatch(poset, pid, state)

        for v in range(1, poset.n):
            ray(v)
    elif strategy == "bfs":
        queue = list(poset.up[0])
        seen = set(queue)
        while queue:
            pid = queue.pop(0)
            if state[pid] == 0:
                evaluate(pid)
            if state[pid] == 1:
                for w in poset.up[pid]:
                    if w not in seen:
                        seen.add(w)
                        queue.append(w)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return {int(v) for v in np.flatnonzero(state == 1) if v != 0}, n_eval


def poset_exact_embeddings(
    graph_edges: rd.Dataset,
    patterns: list[str],
    strategy: str = "static_path_cover",
    operator: str = "subtree",
    threshold: float = 0,
) -> pd.DataFrame:
    """Distributed exact full-space pattern embeddings over the poset:
    -> DataFrame (graph_id, pattern_id, pattern) — one row per MATCHED
    (graph, pattern) pair — plus per-graph evaluation counts folded into an
    attrs dict. Poset + minimum path cover built once on the driver
    (pattern-scale) and broadcast; the graph DB streams through one bucketed
    exchange keyed on graph_id (same shape as poset_minhash_sketches)."""
    poset = TreePoset(patterns)
    paths = minimum_path_cover(poset) if strategy == "static_path_cover" else None
    plan_ref = ray.put((poset, paths, strategy, operator, threshold))

    def per_bucket(t: pa.Table) -> pa.Table:
        poset, paths, strategy, operator, threshold = ray.get(plan_ref)
        match_op = make_match_op(operator, threshold)
        df = t.to_pandas()
        gids, pids, evals = [], [], []
        for gid, g in df.groupby("graph_id", sort=True):
            vertices: dict[int, str] = {}
            gedges = []
            for r in g.itertuples():
                vertices[int(r.va)] = r.ba
                vertices[int(r.vb)] = r.bb
                gedges.append((int(r.va), int(r.vb), r.le))
            matched, n_eval = exact_embedding_for_graph(
                poset, vertices, gedges, strategy, paths, match_op
            )
            for pid in sorted(matched):
                gids.append(int(gid))
                pids.append(pid)
                evals.append(n_eval)
        return pa.table(
            {
                "graph_id": pa.array(gids, pa.int64()),
                "pattern_id": pa.array(pids, pa.int64()),
                "n_evaluations": pa.array(evals, pa.int64()),
            }
        )

    out = bucketed_group_combine(
        graph_edges, ["graph_id"], per_bucket
    ).to_pandas()
    poset_strings = {i + 1: s for i, s in enumerate(poset.strings)}
    out["pattern"] = out["pattern_id"].map(poset_strings)
    return out.sort_values(["graph_id", "pattern_id"]).reset_index(drop=True)
