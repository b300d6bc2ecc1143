"""Deterministic source-code corpus generator (FIXTURES.md §1).

Produces the ``input_hint`` table ``(repo, path, commit, lang, content)`` —
the engine's only external-facing input schema — byte-stable for a given
(seed, spec) across runs and platforms (``numpy.random.Generator(PCG64)``,
never wall-clock or salted ``hash()``).

Design choices that drive the graph workload downstream:
- package names are Zipf-distributed and shared ACROSS repos → shared-path /
  import hub skew (the ``stdio.h`` effect, SURVEY §7.4);
- each file's content contains import-like lines referencing other modules'
  keys, so edge extraction (graph/build.py) is exactly recomputable by a
  brute-force oracle;
- content embeds ``repo:path`` itself so sha256 is row-unique;
- each commit touches a deterministic random subset of the repo's paths →
  co-commit co-occurrence edges.

The reference's analog is its random graph DB generators
(``/root/reference/randomGraphGenerators.c:106-477``): a seeded synthesizer
used as a fixture source. This generator plays that role for the link-graph
workload.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_EXT_TO_LANG = {"py": "py", "c": "c", "js": "js", "go": "go"}
_EXTS = ["py", "c", "js", "go"]


@dataclass(frozen=True)
class CorpusSpec:
    n_repos: int = 20
    files_per_repo: int = 20  # mean; actual per-repo count varies ±50%
    n_packages: int = 40  # global package-name pool (Zipf-shared across repos)
    mods_per_package: int = 8
    commits_per_repo: int = 4
    imports_per_file: int = 3  # mean number of import lines
    zipf_a: float = 1.5  # skew of package popularity (hub strength)
    body_lines: int = 1  # deterministic filler body lines per file

    @staticmethod
    def for_scale(scale: str) -> "CorpusSpec":
        # t1/t2/bench scales from FIXTURES.md §1
        if scale == "t1":
            return CorpusSpec(n_repos=20, files_per_repo=20)
        if scale == "t2":
            return CorpusSpec(n_repos=200, files_per_repo=50, n_packages=120)
        if scale == "bench":
            return CorpusSpec(
                n_repos=2000, files_per_repo=100, n_packages=400, commits_per_repo=6
            )
        raise ValueError(f"unknown scale {scale!r}")


def _module_key(pkg: int, mod: int) -> str:
    return f"pkg{pkg}.mod{mod}"


def generate_corpus(seed: int = 42, spec: CorpusSpec | None = None) -> pa.Table:
    """Build the corpus table in one deterministic pass.

    Generation is driver-side on purpose: fixtures must be byte-stable and
    small (≤ a few hundred k rows); real 10^12-file corpora arrive as parquet
    and never pass through this function.
    """
    spec = spec or CorpusSpec()
    rng = np.random.default_rng(np.random.PCG64(seed))

    repos, paths, commits, langs, contents = [], [], [], [], []

    # Popularity ranks for packages — low rank = popular = shared hub.
    pkg_pop = rng.permutation(spec.n_packages)

    for r in range(spec.n_repos):
        repo = f"org{r // 10}/repo{r}"
        n_files = max(
            2, int(spec.files_per_repo * (0.5 + rng.random()))
        )
        # which packages this repo uses: Zipf over popularity ranks
        ranks = np.minimum(
            rng.zipf(spec.zipf_a, size=n_files) - 1, spec.n_packages - 1
        )
        pkgs = pkg_pop[ranks]
        mods = rng.integers(0, spec.mods_per_package, size=n_files)
        exts = rng.integers(0, len(_EXTS), size=n_files)

        file_paths = []
        seen = set()
        for i in range(n_files):
            p = f"src/pkg{pkgs[i]}/mod{mods[i]}.{_EXTS[exts[i]]}"
            if p in seen:
                continue
            seen.add(p)
            file_paths.append((p, int(pkgs[i]), int(mods[i]), _EXTS[exts[i]]))

        # commit ids: hex digest of (repo, commit_idx)
        repo_commits = [
            hashlib.sha1(f"{repo}@{c}".encode()).hexdigest()[:12]
            for c in range(spec.commits_per_repo)
        ]
        # each commit touches a deterministic random subset of paths
        touch = rng.random((spec.commits_per_repo, len(file_paths))) < 0.5
        touch[0, :] = True  # initial commit touches everything

        for fi, (p, pkg, mod, ext) in enumerate(file_paths):
            n_imp = max(0, int(rng.poisson(spec.imports_per_file)))
            imp_ranks = np.minimum(
                rng.zipf(spec.zipf_a, size=n_imp) - 1, spec.n_packages - 1
            )
            imp_pkgs = pkg_pop[imp_ranks]
            imp_mods = rng.integers(0, spec.mods_per_package, size=n_imp)
            lines = [f"// {repo}:{p}"]
            for j in range(n_imp):
                key = _module_key(int(imp_pkgs[j]), int(imp_mods[j]))
                if key == _module_key(pkg, mod):
                    continue  # no self-import
                lines.append(f"import {key}")
            for bl in range(spec.body_lines):
                words = rng.integers(0, 9999, size=8)
                lines.append(
                    f"def body_{fi}_{bl}(): "
                    + " ".join(f"w{int(w)}" for w in words)
                )
            content = "\n".join(lines)

            commit_rows = [
                c for ci, c in enumerate(repo_commits) if touch[ci, fi]
            ]
            # one corpus row per (file, commit) that touches it — the raw
            # table is commit-grained, like a real repo export
            for c in commit_rows:
                repos.append(repo)
                paths.append(p)
                commits.append(c)
                langs.append(_EXT_TO_LANG[ext])
                contents.append(content)

    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def write_corpus_parquet(
    path: str, seed: int = 42, spec: CorpusSpec | None = None,
    row_group_size: int = 4096,
) -> str:
    """Row groups are the parquet read-parallelism unit (Ray splits reads at
    row-group granularity, and fused read→map stages inherit that width), so
    a single-row-group file silently serializes every downstream pipeline —
    keep groups small enough that any num_cpus can be saturated."""
    t = generate_corpus(seed=seed, spec=spec)
    pq.write_table(t, path, row_group_size=row_group_size)
    return path


def write_corpus_parquet_dir(
    path: str, seed: int = 42, spec: CorpusSpec | None = None,
    num_files: int = 64, row_group_size: int = 4096,
) -> str:
    """Shard the corpus into a directory of parquet files.

    This is the shape a real 10^12-file corpus arrives in (thousands of
    objects), and the shape Ray's read fan-out needs: the parquet reader
    issues ONE read task per file, so a single mid-size file serializes the
    fused read→decode→map stage regardless of ``override_num_blocks`` (which
    only splits blocks *after* the read). Shards are deterministic: the table
    is generated once and sliced contiguously."""
    t = generate_corpus(seed=seed, spec=spec)
    os.makedirs(path, exist_ok=True)
    n = t.num_rows
    per = (n + num_files - 1) // num_files
    for i in range(num_files):
        lo = i * per
        if lo >= n:
            break
        pq.write_table(
            t.slice(lo, min(per, n - lo)),
            os.path.join(path, f"part-{i:05d}.parquet"),
            row_group_size=row_group_size,
        )
    return path
