"""legalrag_tpu — a TPU-native legal RAG framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of the
Legal-RAG reference system (see SURVEY.md): bilingual statutory corpus
preprocessing, a device-resident hybrid index (dense / BM25 / late
interaction / law graph), query routing, fusion + rerank, LLM answer
generation with SSE streaming, online PDF ingestion with incremental
indexing, evaluation and data synthesis.

Architecture stance (SURVEY.md §7.1): one process owns a JAX device mesh;
indexes live in HBM as sharded arrays; a query batch is a single jitted
program (encode → channel scores → fusion → top-k). Host code tokenizes,
hydrates chunk metadata, walks the law graph, and serves HTTP.
"""

from legalrag_tpu.version import __version__

__all__ = ["__version__"]
