from .corpus import (
    generate_corpus,
    write_corpus_parquet,
    write_corpus_parquet_dir,
    CorpusSpec,
)
from .tables import read_table

__all__ = [
    "generate_corpus",
    "write_corpus_parquet",
    "write_corpus_parquet_dir",
    "CorpusSpec",
    "read_table",
]
