from legalrag_tpu.index.bm25_index import BM25Index
from legalrag_tpu.index.bundle import IndexBundle
from legalrag_tpu.index.dense_index import DenseIndex
from legalrag_tpu.index.registry import IndexRegistry
from legalrag_tpu.index.token_index import TokenIndex

__all__ = ["BM25Index", "DenseIndex", "IndexBundle", "IndexRegistry", "TokenIndex"]
