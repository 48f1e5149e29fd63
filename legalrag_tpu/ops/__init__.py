from legalrag_tpu.ops.topk import (
    dense_topk,
    dense_topk_2pass,
    dense_topk_pallas,
    dense_topk_xla,
    full_scores,
    topk_2pass,
    topk_large,
)

__all__ = ["dense_topk", "dense_topk_2pass", "dense_topk_pallas",
           "dense_topk_xla", "full_scores", "topk_2pass", "topk_large"]
