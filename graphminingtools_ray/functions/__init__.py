from .hashing import sha256_hex, stable_id64, md5_hex
from .rounding import round_half_away

__all__ = ["sha256_hex", "stable_id64", "md5_hex", "round_half_away"]
