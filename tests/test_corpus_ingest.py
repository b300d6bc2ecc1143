"""Corpus generator determinism + ingest correctness vs brute-force oracles
(FIXTURES.md §1-2; sha256 invariant from BASELINE.json input_hint)."""

import hashlib
import re
from collections import Counter

import numpy as np
import pytest
import ray.data as rd

from graphminingtools_ray.functions.hashing import stable_id64
from graphminingtools_ray.graph import corpus_ingest
from graphminingtools_ray.sources.corpus import CorpusSpec, generate_corpus

IMPORT_RE = re.compile(r"^import\s+(\S+)$", re.MULTILINE)
PATH_RE = re.compile(r"^src/(pkg\d+)/(mod\d+)\.\w+$")


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(seed=42, spec=CorpusSpec.for_scale("t1"))


@pytest.fixture(scope="module")
def ingested(corpus):
    out = corpus_ingest(rd.from_arrow(corpus), check_collisions=True)
    return {
        "files": out["files"].to_pandas(),
        "vertices": out["vertices"].to_pandas(),
        "edges": out["edges"].to_pandas(),
    }


def test_generator_deterministic(corpus):
    again = generate_corpus(seed=42, spec=CorpusSpec.for_scale("t1"))
    assert corpus.equals(again)
    other = generate_corpus(seed=7, spec=CorpusSpec.for_scale("t1"))
    assert not corpus.equals(other)


def test_sha256_invariant(corpus, ingested):
    files = ingested["files"]
    want = {
        (r, p, c): hashlib.sha256(t.encode()).hexdigest()
        for r, p, c, t in zip(
            corpus["repo"].to_pylist(),
            corpus["path"].to_pylist(),
            corpus["commit"].to_pylist(),
            corpus["content"].to_pylist(),
        )
    }
    assert len(files) == corpus.num_rows
    for row in files.itertuples():
        assert want[(row.repo, row.path, row.commit)] == row.sha256


def _brute_force_edges(corpus, cap=64):
    """Python re-implementation of the ingest edge semantics."""
    rows = list(
        zip(
            corpus["repo"].to_pylist(),
            corpus["path"].to_pylist(),
            corpus["commit"].to_pylist(),
            corpus["content"].to_pylist(),
        )
    )
    # file-grained: max commit wins
    by_vertex = {}
    for r, p, c, t in rows:
        key = f"{r}:{p}"
        if key not in by_vertex or c > by_vertex[key][0]:
            by_vertex[key] = (c, r, p, t)
    vid = {k: int(stable_id64([k])[0]) for k in by_vertex}

    defs = {}
    for k, (_, r, p, t) in by_vertex.items():
        m = PATH_RE.match(p)
        if m:
            defs.setdefault(f"{m.group(1)}.{m.group(2)}", []).append(vid[k])
    defs = {k: sorted(v)[:32] for k, v in defs.items()}  # max_targets_per_module

    imports = Counter()
    for k, (_, r, p, t) in by_vertex.items():
        mk_self = None
        m = PATH_RE.match(p)
        if m:
            mk_self = f"{m.group(1)}.{m.group(2)}"
        for mk in IMPORT_RE.findall(t):
            for target in defs.get(mk, []):
                if target != vid[k]:
                    imports[(vid[k], target)] += 1

    def pair_group(groups):
        out = Counter()
        for members in groups.values():
            ms = sorted(set(members))[:cap]
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    out[(ms[i], ms[j])] += 1
        return out

    cocommit_groups, copath_groups = {}, {}
    for r, p, c, t in rows:
        cocommit_groups.setdefault(f"{r}@{c}", []).append(vid[f"{r}:{p}"])
        copath_groups.setdefault(p, []).append(vid[f"{r}:{p}"])
    return imports, pair_group(cocommit_groups), pair_group(copath_groups)


def test_edges_match_bruteforce(corpus, ingested):
    edges = ingested["edges"]
    want_imports, want_cocommit, want_copath = _brute_force_edges(corpus)
    for kind, want in [
        ("import", want_imports),
        ("cocommit", want_cocommit),
        ("copath", want_copath),
    ]:
        got = {
            (int(r.src), int(r.dst)): int(r.weight)
            for r in edges[edges["kind"] == kind].itertuples()
        }
        assert got == dict(want), f"{kind}: {len(got)} vs {len(want)}"


def test_vertices_unique(ingested):
    v = ingested["vertices"]
    assert v["vertex_id"].is_unique
    keys = v["repo"] + ":" + v["path"]
    assert keys.is_unique
