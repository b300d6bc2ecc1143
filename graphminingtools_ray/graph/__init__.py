from .build import (
    copurchase_edges,
    corpus_ingest,
    symmetrize,
    pairs_within_lists,
)
from .csr import build_csr_blocks

__all__ = [
    "copurchase_edges",
    "corpus_ingest",
    "symmetrize",
    "pairs_within_lists",
    "build_csr_blocks",
]
