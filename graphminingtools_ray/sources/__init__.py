from .corpus import generate_corpus, write_corpus_parquet, CorpusSpec
from .tables import read_table

__all__ = ["generate_corpus", "write_corpus_parquet", "CorpusSpec", "read_table"]
