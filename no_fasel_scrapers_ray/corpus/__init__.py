from .schema import SPAN_TYPE, CORPUS_SCHEMA, FRONTIER_SCHEMA, RECORD_SCHEMA
from .storage import write_corpus, read_corpus, corpus_path

__all__ = [
    "SPAN_TYPE", "CORPUS_SCHEMA", "FRONTIER_SCHEMA", "RECORD_SCHEMA",
    "write_corpus", "read_corpus", "corpus_path",
]
