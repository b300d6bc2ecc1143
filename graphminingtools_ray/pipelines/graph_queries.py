"""Link-graph queries over the co-purchase graph derived from the
driver-provided tables (north-star operators, SURVEY §2.11).

Graph: vertices = parts; an edge (src < dst) connects two parts that appear
in the same order; weight = number of such orders. The derivation is the
same keyed co-occurrence self-join the corpus ingest uses for co-commit
edges, so the driver's SQL oracle certifies both paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..algos.components import connected_components
from ..algos.labelprop import label_propagation
from ..algos.pagerank import pagerank
from ..algos.triangles import triangle_counts
from ..algos.wl import wl_relabel
from ..functions.rounding import round_half_away
from ..graph.build import copurchase_edges, symmetrize


def edges_query(sf_dir: str):
    return copurchase_edges(sf_dir)


def degree_query(sf_dir: str):
    """Per-vertex degree in the simple co-purchase graph
    (reference: ``/root/reference/graph.c:611-650`` maxDegree/minDegree)."""
    import pyarrow as pa

    from ..functions.bucketing import bucketed_group_combine

    sym = symmetrize(copurchase_edges(sf_dir).drop_columns(["weight"]))

    def count_by_src(t: pa.Table) -> pa.Table:
        uk, counts = np.unique(t["src"].to_numpy(), return_counts=True)
        return pa.table({"vertex_id": uk, "degree": counts.astype(np.int64)})

    return bucketed_group_combine(sym, ["src"], count_by_src)


def triangles_global_query(sf_dir: str):
    _, _, total = triangle_counts(copurchase_edges(sf_dir))
    return pd.DataFrame({"n_triangles": [total]})


def triangles_per_vertex_query(sf_dir: str):
    ids, per_vertex, _ = triangle_counts(copurchase_edges(sf_dir))
    m = per_vertex > 0  # SQL oracle can't see 0-triangle vertices
    return pd.DataFrame({"vertex_id": ids[m], "triangles": per_vertex[m]})


def components_query(sf_dir: str, min_weight: int = 2):
    """CC on the weight>=2 subgraph (matches the SQL oracle: thresholding
    yields multiple non-trivial components and keeps the transitive-closure
    oracle tractable)."""
    edges = copurchase_edges(sf_dir).filter(
        expr=f"weight >= {min_weight}"
    )
    ids, labels, _ = connected_components(symmetrize(edges))
    return pd.DataFrame({"vertex_id": ids, "component": labels})


def pagerank_query(sf_dir: str, k: int = 5):
    """Exactly ``k`` power-iteration supersteps (tol=0 disables the
    convergence early-exit) — the data-independent iteration count makes the
    update rule SQL-expressible, so the driver hash-checks the full
    arithmetic (uniform 1/n start, r' = (1-d)/n + d*sum(r[src]/outdeg[src]);
    the symmetrized co-purchase graph has no dangling vertices). The
    convergence variant is ``pagerank_fixpoint_query`` (rows-only)."""
    ids, ranks, info = pagerank(
        symmetrize(copurchase_edges(sf_dir).drop_columns(["weight"])), tol=0.0,
        max_iter=k,
    )
    return pd.DataFrame(
        {"vertex_id": ids, "rank": round_half_away(ranks, 9)}
    )


def pagerank_weighted_query(sf_dir: str, k: int = 5):
    """Weighted PageRank over the co-purchase counts: contributions are
    w(u,v)·r(u)/W(u) with W(u) the weighted out-degree (the engine's
    ``weighted=True`` build path — this is its driver-gate row). Fixed k,
    tol=0; SQL mirrors the engine's op order ((r/W)*w) so the float paths
    agree within the round-9 window like the unweighted twin."""
    ids, ranks, info = pagerank(
        symmetrize(copurchase_edges(sf_dir)), tol=0.0, max_iter=k,
        weighted=True,
    )
    return pd.DataFrame(
        {"vertex_id": ids, "rank": round_half_away(ranks, 9)}
    )


def pagerank_fixpoint_query(sf_dir: str):
    """PageRank to L-inf convergence (the north-star fixpoint). No SQL oracle
    (data-dependent iteration count): driver records rows-only; exactness vs
    the NumPy oracle is covered by tests/test_algos_*."""
    ids, ranks, info = pagerank(
        symmetrize(copurchase_edges(sf_dir).drop_columns(["weight"])), tol=1e-6,
        max_iter=200,
    )
    return pd.DataFrame(
        {"vertex_id": ids, "rank": round_half_away(ranks, 9)}
    )


def egonet_query(sf_dir: str, min_weight: int = 3):
    """ngen over the weight>=3 co-purchase subgraph: every closed
    1-neighborhood induced subgraph's edge list (reference ``ngen``,
    neighborhoodGenerator.c)."""
    from ..graph.ngen import egonet_edges

    edges = copurchase_edges(sf_dir).filter(expr=f"weight >= {min_weight}")
    return egonet_edges(edges)


def label_propagation_query(sf_dir: str, min_weight: int = 3):
    """Community LPA to fixpoint (bounded 20 supersteps) on the weight>=3
    co-purchase subgraph (the dense full graph floods to one label; the
    thresholded graph has real community structure). SQL-oracled despite the
    early exit: synchronous voting is idempotent at a fixpoint and exact
    integer arithmetic, so labels after min(fixpoint, 20) supersteps equal
    labels after exactly 20 — the oracle unrolls all 20 (``_lpa_sql`` in
    __ray_entry__). Per-superstep exactness also covered by
    tests/test_algos_micro.py."""
    edges = copurchase_edges(sf_dir).filter(expr=f"weight >= {min_weight}")
    ids, labels, _ = label_propagation(
        symmetrize(edges.drop_columns(["weight"])), max_iter=20
    )
    return pd.DataFrame({"vertex_id": ids, "label": labels})


def label_propagation_2_query(sf_dir: str):
    """Exactly two synchronous LPA supersteps — SQL-expressible (the vote +
    winner rule unrolled twice), so the driver hash-checks the voting
    arithmetic and tie-break exactly."""
    ids, labels, _ = label_propagation(
        symmetrize(copurchase_edges(sf_dir).drop_columns(["weight"])),
        max_iter=2,
    )
    return pd.DataFrame({"vertex_id": ids, "label": labels})


def wl_relabel_query(sf_dir: str):
    ids, labels, _ = wl_relabel(
        symmetrize(copurchase_edges(sf_dir).drop_columns(["weight"])), iterations=1
    )
    return pd.DataFrame({"vertex_id": ids, "label": list(labels)})


def _smallest_vertices(sym, n: int) -> np.ndarray:
    """The n smallest vertex ids of a symmetrized edge Dataset: per-batch
    partial bottom-n (no global sort barrier), tiny final merge."""
    def bottom(t: pa.Table) -> pa.Table:
        u = np.unique(t["src"].to_numpy())
        return pa.table({"v": u[:n]})

    part = sym.map_batches(bottom, batch_format="pyarrow").to_pandas()
    return np.unique(part["v"].to_numpy())[:n]


def clustering_coefficient_query(sf_dir: str):
    """Per-vertex local clustering coefficient over the co-purchase graph:
    cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), 0 when deg < 2. Triangles come
    from the degree-ordered distributed counter (algos.triangles), degrees
    from the keyed-exchange count — both edge-scale distributed; the merge
    is the vertex-scale result delivery every graph query ends with.
    Arithmetic contract with the SQL twin: 2.0·t (float) divided by the
    exact int d·(d−1), rounded half-away to 9 — elementwise IEEE ops on
    identical inputs, so the driver hash-checks values exactly."""
    from ..functions.bucketing import bucketed_group_combine

    edges = copurchase_edges(sf_dir).materialize()  # ONE self-join, reused
    ids, tri, _ = triangle_counts(edges)

    def count_by_src(t: pa.Table) -> pa.Table:
        uk, counts = np.unique(t["src"].to_numpy(), return_counts=True)
        return pa.table({"vertex_id": uk, "degree": counts.astype(np.int64)})

    deg = bucketed_group_combine(
        symmetrize(edges.drop_columns(["weight"])), ["src"], count_by_src
    ).to_pandas().sort_values("vertex_id")
    v = deg["vertex_id"].to_numpy()
    d = deg["degree"].to_numpy().astype(np.int64)
    t = np.zeros(len(v), np.int64)
    pos = np.searchsorted(v, ids)
    t[pos] = tri
    denom = d * (d - 1)
    cc = np.where(denom > 0, round_half_away(
        (2.0 * t) / np.where(denom > 0, denom, 1), 9), 0.0)
    return pd.DataFrame(
        {"vertex_id": v, "degree": d, "triangles": t, "clustering_coeff": cc}
    )


def degree_assortativity_query(sf_dir: str):
    """Degree assortativity (Newman 2002 Pearson r of degrees across edges)
    of the co-purchase graph. Uses the symmetrized-edge identities so no
    per-edge degree pair table is ever materialized:

        M   = Σ_v d(v)          (directed edge count)
        Σx  = Σ_v d(v)²         Σx² = Σ_v d(v)³      (degree-table sums)
        Σxy = Σ_v d(v)·T(v),    T(v) = Σ_{u∈N(v)} d(u)

    so r = (M·Σxy − Σx²) / (M·Σx² − (Σx)²) — all-integer sums (exact,
    order-free) with one final elementwise float division, hash-exact vs
    the HUGEINT SQL twin. T comes from one src-keyed exchange annotating
    edges with d(src) plus one dst-keyed sum — both edge-scale distributed
    with per-bucket partials; the final combine is bucket-count rows."""
    import pyarrow as pa

    from ..functions.bucketing import bucketed_group_combine

    sym = symmetrize(copurchase_edges(sf_dir).drop_columns(["weight"]))
    deg_ds = degree_query(sf_dir)

    def _exact_sum(arr: np.ndarray) -> int:
        """Exact integer sum: int64 fast path when term bounds prove no
        overflow, arbitrary-precision fallback otherwise (hub degrees at
        web scale exceed the int64 cube bound)."""
        if len(arr) == 0:
            return 0
        if float(arr.max()) * len(arr) < 2.0**62:
            return int(arr.sum())
        return int(arr.astype(object).sum())

    # exchange 1: key = src; join d(src) onto edges, emit (dst, c=d(src))
    edges_tag = sym.map_batches(
        lambda tb: pa.table({"key": tb["src"], "other": tb["dst"],
                             "val": pa.nulls(tb.num_rows, pa.int64())}),
        batch_format="pyarrow",
    )
    deg_tag = deg_ds.map_batches(
        lambda tb: pa.table({"key": tb["vertex_id"],
                             "other": pa.nulls(tb.num_rows, pa.int64()),
                             "val": tb["degree"]}),
        batch_format="pyarrow",
    )

    def annotate(tb: pa.Table) -> pa.Table:
        key = tb["key"].to_numpy(zero_copy_only=False)
        other = tb["other"].to_numpy(zero_copy_only=False)
        val = tb["val"].to_numpy(zero_copy_only=False)
        is_deg = ~pd.isna(val)
        dv, dd = key[is_deg], val[is_deg].astype(np.int64)
        order = np.argsort(dv, kind="stable")
        dv, dd = dv[order], dd[order]
        e_src, e_dst = key[~is_deg], other[~is_deg].astype(np.int64)
        c = dd[np.searchsorted(dv, e_src)]
        return pa.table({"dst": e_dst, "c": c})

    annotated = bucketed_group_combine(edges_tag.union(deg_tag), ["key"],
                                       annotate)

    # exchange 2: key = dst; T(v) = Σ c per dst joined with d(v) in-bucket,
    # emitting ONE partial-sums row per bucket (exact ints, hi/lo split so
    # arbitrary-precision partials survive the int64 wire format)
    ann_tag = annotated.map_batches(
        lambda tb: pa.table({"key": tb["dst"], "c": tb["c"],
                             "val": pa.nulls(tb.num_rows, pa.int64())}),
        batch_format="pyarrow",
    )
    deg_tag2 = deg_ds.map_batches(
        lambda tb: pa.table({"key": tb["vertex_id"],
                             "c": pa.nulls(tb.num_rows, pa.int64()),
                             "val": tb["degree"]}),
        batch_format="pyarrow",
    )

    def partials(tb: pa.Table) -> pa.Table:
        key = tb["key"].to_numpy(zero_copy_only=False)
        c = tb["c"].to_numpy(zero_copy_only=False)
        val = tb["val"].to_numpy(zero_copy_only=False)
        is_deg = ~pd.isna(val)
        dv, dd = key[is_deg], val[is_deg].astype(np.int64)
        order = np.argsort(dv, kind="stable")
        dv, dd = dv[order], dd[order]
        e_dst = key[~is_deg]
        e_c = c[~is_deg].astype(np.int64)
        # T per vertex present in this bucket (every vertex's deg row and
        # all its incoming (dst, c) rows hash to the same bucket)
        tpos = np.searchsorted(dv, e_dst)
        if len(e_c) and float(e_c.astype(np.float64).sum()) >= 2.0**62:
            # arbitrary-precision accumulation: T(v) can exceed int64 at
            # hub scale (same regime as the sx/sx2/sxy fallbacks)
            tv = np.zeros(len(dv), object)
            np.add.at(tv, tpos, e_c.astype(object))
        else:
            tv = np.zeros(len(dv), np.int64)
            np.add.at(tv, tpos, e_c)
        sums = {
            "m": _exact_sum(dd),
            "sx": _exact_sum(dd * dd) if dd.max(initial=0) < 3_000_000_000
            else int((dd.astype(object) * dd.astype(object)).sum()),
            "sx2": int((dd.astype(object) ** 3).sum()) if len(dd) else 0,
            "sxy": int((dd.astype(object) * tv.astype(object)).sum())
            if len(dd) else 0,
        }
        cols = {}
        for name, s in sums.items():
            cols[f"{name}_hi"] = [s >> 62]
            cols[f"{name}_lo"] = [s & ((1 << 62) - 1)]
        return pa.table({k: pa.array(vs, pa.int64()) for k, vs in cols.items()})

    part_df = bucketed_group_combine(
        ann_tag.union(deg_tag2), ["key"], partials
    ).to_pandas()

    def unsplit(name: str) -> int:
        return int(sum((int(h) << 62) + int(lo) for h, lo in
                       zip(part_df[f"{name}_hi"], part_df[f"{name}_lo"])))

    m, sx, sx2, sxy = (unsplit(n) for n in ("m", "sx", "sx2", "sxy"))
    numer = m * sxy - sx * sx
    denom = m * sx2 - sx * sx
    r = 0.0 if denom == 0 else float(
        round_half_away(np.float64(numer) / np.float64(denom), 9)
    )
    return pd.DataFrame({"n_directed_edges": [np.int64(m)],
                         "assortativity": [r]})


def k_core_query(sf_dir: str, k: int = 3, min_weight: int = 2):
    """k-core decomposition membership (peel vertices with alive-degree < k
    to fixpoint) on the weight>=2 co-purchase subgraph. Distributed peeling
    on the partitioned superstep substrate (algos.kcore); the SQL twin
    unrolls the peel rounds (idempotent once converged, so a fixed unroll
    ≥ the data's peel depth is exact)."""
    from ..algos.kcore import k_core

    edges = copurchase_edges(sf_dir).filter(expr=f"weight >= {min_weight}")
    ids, in_core, _ = k_core(symmetrize(edges.drop_columns(["weight"])), k=k)
    return pd.DataFrame({"vertex_id": ids,
                         "in_core": in_core.astype(np.int64)})


def ppr_query(sf_dir: str, k: int = 5, n_seeds: int = 8):
    """Personalized PageRank: exactly ``k`` seed-restart supersteps from the
    ``n_seeds`` smallest vertex ids (deterministic seed rule so the SQL twin
    can reproduce it with ORDER BY v LIMIT n). Fixed-k + tol=0 makes the
    arithmetic SQL-expressible, same contract as ``pagerank_query``."""
    from ..algos.ppr import personalized_pagerank

    sym = symmetrize(copurchase_edges(sf_dir).drop_columns(["weight"]))
    seeds = _smallest_vertices(sym, n_seeds)
    ids, ranks, _ = personalized_pagerank(sym, seeds, k=k)
    return pd.DataFrame(
        {"vertex_id": ids, "rank": round_half_away(ranks, 9)}
    )


def sssp_hops_query(sf_dir: str, min_weight: int = 2):
    """Single-source BFS hop distances from the minimum vertex id on the
    weight>=2 co-purchase subgraph (distributed min-plus relaxation,
    algos.sssp); -1 for vertices outside the source's component. The SQL
    twin unrolls the relaxation rounds (idempotent at the fixpoint; sf0.01
    eccentricity is 10, the unroll is 20)."""
    from ..algos.sssp import sssp_hops

    edges = copurchase_edges(sf_dir).filter(expr=f"weight >= {min_weight}")
    ids, dist, _ = sssp_hops(symmetrize(edges.drop_columns(["weight"])))
    return pd.DataFrame({"vertex_id": ids, "hops": dist})


def betweenness_sigma_query(sf_dir: str, min_weight: int = 2):
    """Forward half of one Brandes sweep (source = min vertex id) on the
    weight>=2 co-purchase subgraph: exact hop distances + exact integer
    shortest-path counts sigma. This certifies the forward machinery of
    betweenness_sampled at the driver gate (the fractional backward delta
    sums stay pytest-oracled — no order-free SQL twin exists for them)."""
    from ..algos.betweenness import brandes_forward

    edges = copurchase_edges(sf_dir).filter(expr=f"weight >= {min_weight}")
    ids, dist, sigma, _ = brandes_forward(
        symmetrize(edges.drop_columns(["weight"]))
    )
    return pd.DataFrame({"vertex_id": ids, "hops": dist, "sigma": sigma})


def betweenness_query(sf_dir: str, n_sources: int = 2, min_weight: int = 2):
    """Sampled-source betweenness (Brandes dependencies from the
    ``n_sources`` smallest vertex ids) on the weight>=2 co-purchase
    subgraph. Rows-only at the driver gate (the fractional dependency sums
    have no order-free SQL twin); exactness vs pure-Python Brandes is
    pinned by tests/test_algos_micro.py, and the panel discipline makes
    the float result bit-deterministic run-to-run."""
    from ..algos.betweenness import betweenness_sampled

    sym = symmetrize(
        copurchase_edges(sf_dir).filter(expr=f"weight >= {min_weight}")
        .drop_columns(["weight"])
    )

    def bottom(t: pa.Table) -> pa.Table:
        u = np.unique(t["src"].to_numpy())
        return pa.table({"v": u[:n_sources]})

    part = sym.map_batches(bottom, batch_format="pyarrow").to_pandas()
    sources = np.unique(part["v"].to_numpy())[:n_sources]
    # P=4: the gate graph is small, and betweenness runs ~3 supersteps per
    # BFS level — fewer grid cells cut the per-superstep scheduling floor
    ids, bc, _ = betweenness_sampled(sym, sources, num_state_partitions=4)
    return pd.DataFrame(
        {"vertex_id": ids, "betweenness": round_half_away(bc, 9)}
    )


_HARMONIC_LCM = 5342931457063200  # lcm(1..40): LCM//d exact for any d<=40


def harmonic_centrality_query(sf_dir: str, n_seeds: int = 4,
                              min_weight: int = 2):
    """Seed-set harmonic centrality (Boldi & Vigna 2014 axioms; the
    sampled-source estimator): hc(v) = Σ_{s∈S, 0<d(s,v)} 1/d(s,v) over the
    ``n_seeds`` smallest vertex ids of the weight>=2 co-purchase subgraph.
    One substrate graph build shared across per-seed BFS runs. Exactness:
    the sum is the EXACT integer Σ LCM(1..40)/d (any hop distance ≤ 40
    divides the LCM — asserted loudly), then one elementwise float
    division, hash-exact vs the per-seed-unrolled SQL twin."""
    from ..algos.partitioned import build_partitioned_graph
    from ..algos.sssp import sssp_hops_partitioned, state_to_arrays

    sym = symmetrize(
        copurchase_edges(sf_dir).filter(expr=f"weight >= {min_weight}")
        .drop_columns(["weight"])
    )

    seeds = _smallest_vertices(sym, n_seeds)
    g = build_partitioned_graph(sym, P=8)
    hc_num = None
    ids = None
    for s in seeds:
        state_ds, _, _ = sssp_hops_partitioned(sym, source=int(s), graph=g)
        sids, dist = state_to_arrays(state_ds, g)
        dist = dist.astype(np.int64)
        reach = (dist > 0) & (dist < 41)
        finite = dist[(dist > 0) & (dist < 2**40)]
        if len(finite) and int(finite.max()) > 40:
            # explicit raise (not assert — must survive python -O): beyond
            # 40 hops the LCM-scaled integer sum is no longer exact
            raise ValueError(
                "hop distance exceeds the LCM(1..40) exactness bound"
            )
        if hc_num is None:
            ids = sids
            hc_num = np.zeros(len(ids), np.int64)
        hc_num[reach] += _HARMONIC_LCM // dist[reach]
    return pd.DataFrame({
        "vertex_id": ids,
        "hc_num": hc_num,
        "harmonic": round_half_away(hc_num / float(_HARMONIC_LCM), 9),
    })


def random_walks_query(sf_dir: str, length: int = 4, min_weight: int = 2):
    """Deterministic DeepWalk-style walk corpus (graph/walks.py) on the
    weight>=2 co-purchase subgraph: one L-step walk per vertex, next hop =
    md5-seeded index into the dst-sorted neighbor list — reproducible and
    value-exact vs the md5_number_lower SQL twin."""
    from ..graph.walks import random_walks

    edges = copurchase_edges(sf_dir).filter(expr=f"weight >= {min_weight}")
    walks = random_walks(symmetrize(edges.drop_columns(["weight"])),
                         length=length)
    # gate-scale only: the corpus itself is a streaming Dataset
    return (walks.to_pandas().sort_values(["walk_id", "step"])
            .reset_index(drop=True))


def random_walks_weighted_query(sf_dir: str, length: int = 4,
                                min_weight: int = 2):
    """Weight-proportional deterministic walks (transition ∝ co-purchase
    count): the seeded draw indexes the per-src inclusive weight cumsum —
    r = md5 mod W(v), first neighbor with cum > r. SQL twin uses the
    windowed SUM over the same dst order."""
    from ..graph.walks import random_walks

    edges = copurchase_edges(sf_dir).filter(expr=f"weight >= {min_weight}")
    walks = random_walks(symmetrize(edges), length=length, weighted=True)
    return (walks.to_pandas().sort_values(["walk_id", "step"])
            .reset_index(drop=True))


def node2vec_walks_query(sf_dir: str, length: int = 4,
                         min_weight: int = 2):
    """node2vec second-order biased walks (fixed integer bias p=2, q=0.5:
    weights 1 return / 2 common-neighbor / 4 exploring) on the weight>=2
    co-purchase subgraph — deterministic and hash-exact vs the CASE-weight
    windowed-cumsum SQL twin."""
    from ..graph.walks import node2vec_walks

    edges = copurchase_edges(sf_dir).filter(expr=f"weight >= {min_weight}")
    walks = node2vec_walks(symmetrize(edges.drop_columns(["weight"])),
                           length=length)
    return (walks.to_pandas().sort_values(["walk_id", "step"])
            .reset_index(drop=True))


def skipgram_pairs_query(sf_dir: str, length: int = 4, window: int = 2,
                         neg: int = 2, min_weight: int = 2):
    """Skip-gram (center, context) training pairs + md5-deterministic
    negative samples from the deterministic walk corpus (graph/walks.
    skipgram_pairs) — the missing link between the walk family and an
    embedding trainer. Hash-exact vs a corpus-self-join SQL twin."""
    from ..graph.walks import random_walks, skipgram_pairs

    edges = copurchase_edges(sf_dir).filter(expr=f"weight >= {min_weight}")
    corpus = random_walks(symmetrize(edges.drop_columns(["weight"])),
                          length=length)
    pairs = skipgram_pairs(corpus, window=window, neg=neg)
    out = pairs.to_pandas()
    return (out.sort_values(list(out.columns)).reset_index(drop=True))


def diameter_lb_query(sf_dir: str, min_weight: int = 2):
    """Double-BFS diameter lower bound (the classic 2-sweep heuristic,
    exact as a bound): BFS from the min vertex id, then BFS from the
    deterministic farthest vertex (max dist, tie → min id); its
    eccentricity lower-bounds the diameter. Two relaxation runs on ONE
    substrate graph; SQL twin chains two unrolled BFS with the same
    farthest-vertex rule."""
    from ..algos.partitioned import build_partitioned_graph
    from ..algos.sssp import sssp_hops_partitioned, state_to_arrays

    sym = symmetrize(
        copurchase_edges(sf_dir).filter(expr=f"weight >= {min_weight}")
        .drop_columns(["weight"])
    )
    s0 = int(_smallest_vertices(sym, 1)[0])
    g = build_partitioned_graph(sym, P=8)

    def bfs(src: int):
        state_ds, _, _ = sssp_hops_partitioned(sym, source=src, graph=g)
        ids, dist = state_to_arrays(state_ds, g)
        dist = dist.astype(np.int64)
        reach = (dist > 0) & (dist < 2**40)
        ecc = int(dist[reach].max()) if reach.any() else 0
        far = int(ids[reach][dist[reach] == ecc].min()) if ecc else src
        return ecc, far

    ecc0, s1 = bfs(s0)
    ecc1, _ = bfs(s1)
    return pd.DataFrame({
        "source_0": [np.int64(s0)], "ecc_0": [np.int64(ecc0)],
        "source_1": [np.int64(s1)], "diameter_lb": [np.int64(ecc1)],
    })


def order_graph_measures(sf_dir: str):
    """The `gf` measure table (graph/gdb.py — reference filter.c:386-533
    dispatch) over PARQUET-DERIVED transactions: per-order graphs with
    vertices = the order's distinct parts (all lines, so single-line orders
    are 1-vertex graphs) and edges = the distinct undirected consecutive
    line pairs. Projects the driver-gate-checkable measures — the SQL twin
    computes component counts with a per-order recursive closure (order
    graphs are line-count-bounded, so the closure is tiny per graph); the
    biconnectivity/cycle measures have their own twin in the companion
    ``order_graph_block_measures``; outerplanarity/ST/traceability stay
    pytest-oracled on the generated DBs (gdb_blockchain_measures) where
    those structures actually occur.

    Returns (graph_id, n, m, max_degree, min_degree, n_components,
    connected, is_tree, is_path)."""
    meas = _order_graph_measure_table(sf_dir)
    cols = ["graph_id", "n", "m", "max_degree", "min_degree",
            "n_components", "connected", "is_tree", "is_path"]
    out = meas[cols].sort_values("graph_id").reset_index(drop=True)
    # flags as int64 0/1: the gate's value-hash has only ever seen
    # numeric/string columns, so don't hand it a new logical type
    for c in cols:
        out[c] = out[c].astype(np.int64)
    return out


def _order_graph_measure_table(sf_dir: str) -> pd.DataFrame:
    """Full per-order measure table: vertices = the order's distinct parts,
    edges = distinct undirected consecutive line pairs, kernels =
    graph/gdb.py measures_for_graph."""
    from ..functions.bucketing import bucketed_group_combine
    from ..graph.gdb import graph_measures
    from ..sources.tables import read_table

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_returnflag"],
    )

    def long_rows(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["l_orderkey", "l_linenumber", "l_partkey", "l_returnflag"]
        )
        o = df["l_orderkey"].to_numpy()
        pk = df["l_partkey"].to_numpy()
        vv = pd.DataFrame({"graph_id": o, "a": pk}).drop_duplicates()
        same = o[1:] == o[:-1]
        va, vb = pk[:-1][same], pk[1:][same]
        oo = o[1:][same]
        m = va != vb
        ee = pd.DataFrame(
            {
                "graph_id": oo[m],
                "a": np.minimum(va[m], vb[m]),
                "b": np.maximum(va[m], vb[m]),
            }
        ).drop_duplicates()
        return pa.table(
            {
                "graph_id": np.concatenate(
                    [vv["graph_id"].to_numpy(), ee["graph_id"].to_numpy()]
                ),
                "a": np.concatenate([vv["a"].to_numpy(), ee["a"].to_numpy()]),
                "b": np.concatenate(
                    [np.full(len(vv), -1, np.int64), ee["b"].to_numpy()]
                ),
                "kind": pa.array(["v"] * len(vv) + ["e"] * len(ee)),
            }
        )

    long_ds = bucketed_group_combine(li, ["l_orderkey"], long_rows)
    verts = long_ds.filter(expr="kind == 'v'").map_batches(
        lambda t: pa.table(
            {
                "graph_id": t["graph_id"],
                "vertex_id": t["a"].cast(pa.int64()),
                "label": pa.array(["x"] * t.num_rows),
            }
        ),
        batch_format="pyarrow",
    )
    edges = long_ds.filter(expr="kind == 'e'").map_batches(
        lambda t: pa.table(
            {
                "graph_id": t["graph_id"],
                "v": t["a"].cast(pa.int64()),
                "w": t["b"].cast(pa.int64()),
                "label": pa.array(["x"] * t.num_rows),
            }
        ),
        batch_format="pyarrow",
    )
    return graph_measures(verts, edges).to_pandas()


def order_graph_block_measures(sf_dir: str):
    """The BICONNECTIVITY half of the `gf` measure table
    (graph/gdb.py measures_for_graph — reference listComponents.c:16-191,
    listCycles.c) over the same parquet-derived per-order transactions as
    ``order_graph_measures``: simple-cycle and non-isomorphic-cycle counts,
    bridges, blocks, bridge trees, articulation points, block-degree
    extremes. Driver-gate checkable: the per-order graphs are connected and
    line-count-bounded, so the DuckDB twin enumerates cycle edge-subset
    masks (same machinery as the cyclic-feature twin), derives bridges as
    cycle-free edges, biconnected blocks as the transitive closure of the
    shares-a-cycle relation on cycle edges, criticality = blocks-per-vertex
    + incident bridges (articulation ⇔ criticality > 1 —
    listComponents.c computeCriticality), and n_bridge_trees = n − bridges
    (the bridge forest is acyclic).

    Returns (graph_id, n_simple_cycles, n_noniso_cycles, n_bridges,
    n_blocks, n_bridge_trees, n_articulation_points, max_block_degree,
    min_block_degree)."""
    meas = _order_graph_measure_table(sf_dir)
    cols = ["graph_id", "n_simple_cycles", "n_noniso_cycles", "n_bridges",
            "n_blocks", "n_bridge_trees", "n_articulation_points",
            "max_block_degree", "min_block_degree"]
    out = meas[cols].sort_values("graph_id").reset_index(drop=True)
    for c in cols:
        out[c] = out[c].astype(np.int64)
    return out
