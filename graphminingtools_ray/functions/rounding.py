"""Rounding that matches DuckDB's ROUND (half away from zero).

numpy's ``np.round`` is banker's rounding (half to even); DuckDB rounds half
away from zero. Every float column that flows into the driver's value-hash
comparison must be rounded with THIS function on the engine side and with
``ROUND(x, d)`` on the SQL side, so both engines emit the same doubles.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 6) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0**decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
