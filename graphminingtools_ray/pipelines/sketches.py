"""Cardinality sketches: HyperLogLog-style distinct-count registers.

Flajolet et al. 2007 (HyperLogLog): hash each value to 64 bits, low p bits
pick a register, the rank (leading-zero count + 1) of the remaining
64-p bits updates the register's max. Registers are tiny (m = 2^p ints),
merge by elementwise max, and estimate distinct counts with relative error
~1.04/sqrt(m) — the mergeable distinct-count primitive a 100-TB ingest
needs (per-shard sketches union for free; the exact-count groupby it
replaces is an all-to-all exchange of every distinct key).

Base hash = the lower-64 little-endian word of MD5 (exactly DuckDB's
``md5_number_lower``, see stages/dedup_md5.md5_u64), so the register table
AND the estimate arithmetic have value-exact DuckDB twins and the driver
gate hash-checks the full sketch. Per-batch register partials are combined
by max — order-free, so the distributed result is deterministic by
construction. The rank uses an exact integer bit-length (6-step binary
reduction), not float log2, whose rounding can misplace values adjacent to
powers of two.

Reference: the reference has no cardinality sketch; this extends the
minhashing.c-family sketch surface (SURVEY §2.9) with the distinct-count
member, per the round-2 brief's LLM-data-pipeline operator list.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.tables import read_table
from ..stages.dedup_md5 import md5_u64

_P = 8
_M = 1 << _P  # 256 registers
_WBITS = 64 - _P  # 56-bit rank window; empty-window rank = 57


def bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (binary reduction — no float
    log2: w spans 56 bits > float64's 53-bit mantissa, so log2 rounding can
    flip the floor at power-of-two boundaries)."""
    w = w.copy()
    r = np.zeros(len(w), np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        t = w >> np.uint64(s)
        gt = t > 0
        r[gt] += s
        w[gt] = t[gt]
    r[w > 0] += 1
    return r


def _register_partials(values: np.ndarray) -> np.ndarray:
    """m-length max-rank array for one batch of (string) values."""
    regs = np.zeros(_M, np.int64)
    if len(values) == 0:
        return regs
    h = md5_u64(values)
    reg = (h & np.uint64(_M - 1)).astype(np.int64)
    w = h >> np.uint64(_P)
    rank = (_WBITS + 1) - bit_length_u64(w)  # w=0 -> bit_length 0 -> 57
    np.maximum.at(regs, reg, rank)
    return regs


def _registers(sf_dir: str) -> np.ndarray:
    """Distributed sketch build: per-batch register partials inside
    map_batches (the combiner — each batch ships 256 ints, not its keys),
    final elementwise max over batch-count partial rows."""
    li = read_table(sf_dir, "lineitem", columns=["l_partkey"])

    def batch_regs(t: pa.Table) -> pa.Table:
        vals = t["l_partkey"].to_numpy(zero_copy_only=False)
        strs = vals.astype(np.int64).astype("U").astype(object)
        regs = _register_partials(strs)
        return pa.table({"register": pa.array(np.arange(_M), pa.int64()),
                         "max_rank": pa.array(regs, pa.int64())})

    part = li.map_batches(batch_regs, batch_format="pyarrow").to_pandas()
    regs = np.zeros(_M, np.int64)
    np.maximum.at(regs, part["register"].to_numpy(),
                  part["max_rank"].to_numpy())
    return regs


def hll_registers(sf_dir: str) -> pd.DataFrame:
    """The full register table (m=256 rows) for distinct l_partkey over
    lineitem — the mergeable sketch itself, hash-checked by the SQL twin."""
    regs = _registers(sf_dir)
    return pd.DataFrame({"register": np.arange(_M, dtype=np.int64),
                         "max_rank": regs})


def hll_estimate(sf_dir: str) -> pd.DataFrame:
    """Raw HLL estimate from the registers. Exactness contract with the SQL
    twin: the harmonic denominator is the EXACT integer
    S = sum_j 2^(57 - M_j) (scaled by 2^57 so empty registers contribute
    2^57), shipped as hi/lo int64 halves; the estimate is one elementwise
    float expression over S — alpha_256 * m^2 * 2^57 / S — so both sides
    round identically. Small/large-range corrections are a client-side
    post-process on the same registers (kept out to stay value-exact)."""
    regs = _registers(sf_dir)
    s = int(sum(1 << (_WBITS + 1 - int(m)) for m in regs))
    n_zero = int(np.count_nonzero(regs == 0))
    alpha = 0.7213 / (1.0 + 1.079 / _M)
    est = alpha * float(_M) * float(_M) * float(1 << (_WBITS + 1)) / float(s)
    from ..functions.rounding import round_half_away

    return pd.DataFrame({
        "m": [np.int64(_M)],
        "n_zero_registers": [np.int64(n_zero)],
        "s_hi": [np.int64(s >> 62)],
        "s_lo": [np.int64(s & ((1 << 62) - 1))],
        "estimate": [float(round_half_away(est, 6))],
    })
