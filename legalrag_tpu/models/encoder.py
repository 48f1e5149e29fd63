"""Encoder backend protocol + factory.

The reference delegates embedding to FlagEmbedding/torch (BGE models,
``vector_store.py:131-155``): queries get an instruction prefix, passages are
encoded bare, outputs are L2-normalized. This module states that contract for
the TPU framework and selects an implementation:

- ``hash``: self-contained deterministic hashed-feature encoder (no weights
  needed; always available — the default in weight-less environments).
- ``bert``: JAX/Flax BERT-family encoder loading HF safetensors (BGE et al.)
  when model files are present locally.
"""

from __future__ import annotations

from typing import List, Protocol, Tuple

import numpy as np


class EncoderBackend(Protocol):
    """Contract: float32, L2-normalized outputs; deterministic."""

    dim: int
    token_dim: int

    def encode_passages(self, texts: List[str]) -> np.ndarray:
        """[n, dim], L2-normalized."""
        ...

    def encode_queries(self, texts: List[str]) -> np.ndarray:
        """[n, dim], L2-normalized; may apply a query instruction."""
        ...

    def encode_tokens(self, texts: List[str], maxlen: int,
                      query: bool = False
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """([n, maxlen, token_dim] f32 per-token L2-normed, [n, maxlen] bool mask).
        ``query=True`` marks query-side featurization (the hash encoder
        emits bare section-ref tokens liberally there; subword encoders
        ignore it)."""
        ...


def get_encoder(cfg, lang: str, device=None) -> EncoderBackend:
    """Build the configured encoder for one language."""
    backend = cfg.retrieval.embedding_backend
    if backend == "hash":
        from legalrag_tpu.models.hash_encoder import HashEncoder

        return HashEncoder(lang=lang, dim=cfg.retrieval.embedding_dim,
                           token_dim=cfg.engine.late_dim, device=device)
    if backend == "bert":
        from legalrag_tpu.models.bert import FlaxBertEncoder

        model = (cfg.retrieval.embedding_model_zh if lang == "zh"
                 else cfg.retrieval.embedding_model_en)
        instruction = (cfg.retrieval.query_instruction_zh if lang == "zh"
                       else cfg.retrieval.query_instruction_en)
        return FlaxBertEncoder.from_pretrained(model, instruction=instruction,
                                               device=device,
                                               token_dim=cfg.engine.late_dim)
    raise ValueError(f"unknown embedding backend: {backend}")
