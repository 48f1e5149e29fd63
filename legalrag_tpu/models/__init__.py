from legalrag_tpu.models.encoder import EncoderBackend, get_encoder

__all__ = ["EncoderBackend", "get_encoder"]
