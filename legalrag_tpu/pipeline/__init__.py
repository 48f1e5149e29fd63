from legalrag_tpu.pipeline.rag_pipeline import RagPipeline

__all__ = ["RagPipeline"]
