from legalrag_tpu.ops.topk import dense_topk, dense_topk_pallas, dense_topk_xla, full_scores

__all__ = ["dense_topk", "dense_topk_pallas", "dense_topk_xla", "full_scores"]
