"""LegalAgent: the user-facing agent facade.

A working realization of the reference's dead agent layer
(``legalrag/agents/legal_agent.py`` — broken imports, SURVEY.md §1):
``answer`` runs the standard single-pass RAG flow; ``answer_complex`` runs
decompose→retrieve-per-step→synthesize via ``MultistepPipeline``; the agent
auto-escalates to complex mode when the router signals a multi-part
question.
"""

from __future__ import annotations

from typing import Optional

from legalrag_tpu.config import AppConfig
from legalrag_tpu.pipeline.multistep import MultistepPipeline
from legalrag_tpu.pipeline.rag_pipeline import RagPipeline
from legalrag_tpu.schemas import RagAnswer
from legalrag_tpu.utils import get_logger

log = get_logger("legal_agent")


class LegalAgent:
    def __init__(self, cfg: Optional[AppConfig] = None,
                 pipeline: Optional[RagPipeline] = None, max_steps: int = 4):
        self.cfg = cfg or AppConfig.load()
        self.pipeline = pipeline or RagPipeline(self.cfg)
        self.multistep = MultistepPipeline(self.pipeline, max_steps=max_steps)

    def answer(self, question: str, top_k: Optional[int] = None) -> RagAnswer:
        return self.pipeline.answer(question, top_k=top_k)

    def answer_complex(self, question: str) -> RagAnswer:
        return self.multistep.answer_complex(question)

    def answer_auto(self, question: str) -> RagAnswer:
        """Escalate to multistep when decomposition finds >1 sub-question."""
        subs = self.multistep.decompose(question)
        if len(subs) > 1:
            log.info("multi-part question (%d sub-questions); multistep flow",
                     len(subs))
            return self.answer_complex(question)
        return self.answer(question)
