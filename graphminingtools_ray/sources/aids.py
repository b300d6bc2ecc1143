"""Reader/writer for the reference's transactional graph-DB text format
("aids": 3 lines per graph, ``$`` terminator — spec re-derived from
``/root/reference/doc/content/pages/fileformat.md:17-53``; reference parser
``loading.c:333-433``).

Tabular twin (FIXTURES.md §4):
    gdb_graphs   (graph_id: int64, label: int64, n: int32, m: int32)
    gdb_vertices (graph_id: int64, vertex_id: int32, label: string)   # 1-based ids
    gdb_edges    (graph_id: int64, v: int32, w: int32, label: string)

Undirected semantics: each edge stored ONCE here (v, w as written); consumers
needing both half-edges symmetrize (the reference's loader adds both
directions in memory, ``loading.c:407-425``).

Parsing is driver-side for fixture files (they are small by the reference's
own standards); a 100 TB corpus would arrive as parquet, not aids text.
"""

from __future__ import annotations

import pyarrow as pa


def parse_aids_text(text: str) -> dict[str, pa.Table]:
    lines = [ln for ln in text.splitlines() if ln.strip()]
    g_ids, g_labels, g_ns, g_ms = [], [], [], []
    v_gid, v_vid, v_lab = [], [], []
    e_gid, e_v, e_w, e_lab = [], [], [], []
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if line == "$":
            break
        if not line.startswith("#"):
            raise ValueError(f"expected header line, got {line[:40]!r}")
        parts = line.split()
        gid, glabel, n, m = int(parts[1]), int(parts[2]), int(parts[3]), int(parts[4])
        vlabels = lines[i + 1].split()
        if len(vlabels) != n:
            raise ValueError(f"graph {gid}: {len(vlabels)} vertex labels, header n={n}")
        etokens = lines[i + 2].split() if m > 0 else []
        if len(etokens) != 3 * m:
            raise ValueError(f"graph {gid}: {len(etokens)} edge tokens, header m={m}")
        g_ids.append(gid)
        g_labels.append(glabel)
        g_ns.append(n)
        g_ms.append(m)
        for vi, lab in enumerate(vlabels, start=1):
            v_gid.append(gid)
            v_vid.append(vi)
            v_lab.append(lab)
        for j in range(m):
            e_gid.append(gid)
            e_v.append(int(etokens[3 * j]))
            e_w.append(int(etokens[3 * j + 1]))
            e_lab.append(etokens[3 * j + 2])
        i += 3

    return {
        "gdb_graphs": pa.table(
            {
                "graph_id": pa.array(g_ids, pa.int64()),
                "label": pa.array(g_labels, pa.int64()),
                "n": pa.array(g_ns, pa.int32()),
                "m": pa.array(g_ms, pa.int32()),
            }
        ),
        "gdb_vertices": pa.table(
            {
                "graph_id": pa.array(v_gid, pa.int64()),
                "vertex_id": pa.array(v_vid, pa.int32()),
                "label": pa.array(v_lab, pa.string()),
            }
        ),
        "gdb_edges": pa.table(
            {
                "graph_id": pa.array(e_gid, pa.int64()),
                "v": pa.array(e_v, pa.int32()),
                "w": pa.array(e_w, pa.int32()),
                "label": pa.array(e_lab, pa.string()),
            }
        ),
    }


def read_aids(path: str) -> dict[str, pa.Table]:
    with open(path) as f:
        return parse_aids_text(f.read())


def write_aids_text(tables: dict[str, pa.Table]) -> str:
    """Inverse of parse_aids_text (same 3-line layout, ``$`` terminated)."""
    graphs = tables["gdb_graphs"].to_pylist()
    verts = tables["gdb_vertices"].to_pylist()
    edges = tables["gdb_edges"].to_pylist()
    vmap: dict[int, list] = {}
    for r in verts:
        vmap.setdefault(r["graph_id"], []).append(r)
    emap: dict[int, list] = {}
    for r in edges:
        emap.setdefault(r["graph_id"], []).append(r)
    out = []
    for g in graphs:
        gid = g["graph_id"]
        out.append(f"# {gid} {g['label']} {g['n']} {g['m']}")
        vs = sorted(vmap.get(gid, []), key=lambda r: r["vertex_id"])
        out.append(" ".join(r["label"] for r in vs) + " ")
        es = emap.get(gid, [])
        out.append(" ".join(f"{r['v']} {r['w']} {r['label']}" for r in es) + " ")
    out.append("$")
    return "\n".join(out)
