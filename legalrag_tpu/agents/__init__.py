from legalrag_tpu.agents.legal_agent import LegalAgent

__all__ = ["LegalAgent"]
