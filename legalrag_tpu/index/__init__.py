from legalrag_tpu.index.registry import IndexRegistry

__all__ = ["IndexRegistry"]
