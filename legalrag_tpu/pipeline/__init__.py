from legalrag_tpu.pipeline.multistep import MultistepPipeline
from legalrag_tpu.pipeline.rag_pipeline import RagPipeline

__all__ = ["MultistepPipeline", "RagPipeline"]
