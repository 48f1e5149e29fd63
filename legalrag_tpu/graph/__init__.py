from legalrag_tpu.graph.builder import GraphBuilder
from legalrag_tpu.graph.store import LawGraphStore

__all__ = ["GraphBuilder", "LawGraphStore"]
