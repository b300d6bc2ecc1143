"""Readers for the driver-provided parquet tables (TESTDATA.md).

Always prune at the read: pass ``columns=`` so only needed columns leave
storage (a read that loads all columns for a 2-column transform is wrong at
100 TB).
"""

from __future__ import annotations

import os

import ray.data as rd


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    path = os.path.join(sf_dir, f"{name}.parquet")
    return rd.read_parquet(path, columns=columns)
