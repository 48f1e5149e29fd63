"""In-suite algorithm-level parity gate (VERDICT r1 #7): the fused device
engine must match the pure-NumPy oracle (exact dense + verbatim BM25Okapi +
exact MaxSim + reference host fusion) on real-corpus slices, both languages.
The full-corpus CLI gate is ``python -m scripts.parity_gate``.
"""

import pytest

from legalrag_tpu.config import AppConfig
from legalrag_tpu.index.bundle import IndexBundle


def _bundle(chunks, lang):
    cfg = AppConfig()
    cfg.engine.capacity_round = 256
    cfg.engine.late_doc_maxlen = 64
    return IndexBundle.build_from_chunks(chunks, cfg.with_lang(lang), lang), cfg


@pytest.mark.parametrize("lang", ["zh", "en"])
def test_engine_matches_numpy_oracle(lang, zh_chunks, en_chunks):
    from scripts.parity_gate import run_gate

    chunks = (zh_chunks if lang == "zh" else en_chunks)[:150]
    bundle, cfg = _bundle(chunks, lang)
    out = run_gate(lang=lang, n=40, bundle=bundle, cfg=cfg)
    assert out["ok"], out
    assert out["top10_overlap"] >= 0.9
