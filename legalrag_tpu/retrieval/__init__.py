from legalrag_tpu.retrieval.by_lang import BundleCache, ByLangRetriever
from legalrag_tpu.retrieval.channels import (
    BM25Retriever,
    DenseRetriever,
    GraphRetriever,
    LateInteractionRetriever,
)
from legalrag_tpu.retrieval.fusion import ChannelResult, FusedCandidate, fuse
from legalrag_tpu.retrieval.hybrid import HybridRetriever, dedup_keep_best
from legalrag_tpu.retrieval.rerankers import (
    CrossEncoderReranker,
    LLMReranker,
    MaxSimReranker,
    Reranker,
    RerankerFactory,
    rerank_candidates,
)

__all__ = [
    "BM25Retriever", "BundleCache", "ByLangRetriever", "ChannelResult",
    "CrossEncoderReranker", "DenseRetriever", "FusedCandidate",
    "GraphRetriever", "HybridRetriever", "LLMReranker",
    "LateInteractionRetriever", "MaxSimReranker", "Reranker",
    "RerankerFactory", "dedup_keep_best", "fuse", "rerank_candidates",
]
