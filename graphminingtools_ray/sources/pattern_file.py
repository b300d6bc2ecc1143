"""Pattern-table file I/O — the reference's search-tree pattern dump/load
(``/root/reference/searchTree.c:972-1061``: ``streamBuildSearchTree`` /
``streamReadPatternsAndTheirNumber``; written by
``printStringsInSearchTree``).

Format (one transaction block):

    # <transaction_id> <n_patterns>
    <multiplicity>\t<id>\t<canonical string tokens>
    ...

The engine analog of "load pattern file once, thread through every graph"
(``gpe -c/-f``, patternExtractorHelp.txt:169-175) is: parse driver-side
(pattern tables are small by contract), ``ray.put`` the list once, probe
inside the bucketed per-graph exchange (pipelines.patterns).
"""

from __future__ import annotations


def write_pattern_file(
    patterns: list[tuple[int, int, str]], transaction_id: int = 0
) -> str:
    """``[(multiplicity, id, cstring), ...]`` → one transaction block."""
    lines = [f"# {transaction_id} {len(patterns)}"]
    for mult, pid, cs in patterns:
        lines.append(f"{mult}\t{pid}\t{cs}")
    return "\n".join(lines) + "\n"


def parse_pattern_file(text: str) -> list[dict]:
    """All transaction blocks of a pattern file →
    ``[{transaction_id, multiplicity, pattern_id, cstring}, ...]``.
    Tolerates the 2-column ``streamBuildSearchTree`` layout (no id column)
    by assigning sequential ids within the block."""
    out: list[dict] = []
    tid = None
    remaining = 0
    seq = 0
    for raw in text.splitlines():
        line = raw.rstrip("\n")
        if not line.strip():
            continue
        if line.startswith("#"):
            parts = line.split()
            tid, remaining = int(parts[1]), int(parts[2])
            seq = 0
            continue
        if tid is None or remaining <= 0:
            raise ValueError(f"pattern line outside a transaction block: {line[:40]!r}")
        cols = line.split("\t")
        if len(cols) >= 3:
            mult, pid, cs = int(cols[0]), int(cols[1]), cols[2]
        elif len(cols) == 2:
            mult, pid, cs = int(cols[0]), seq, cols[1]
        else:
            raise ValueError(f"bad pattern line: {line[:40]!r}")
        out.append(
            {
                "transaction_id": tid,
                "multiplicity": mult,
                "pattern_id": pid,
                "cstring": cs,  # verbatim: reference cstrings end with a space
            }
        )
        seq += 1
        remaining -= 1
    return out


def load_pattern_file(path: str) -> list[dict]:
    with open(path) as f:
        return parse_pattern_file(f.read())
