"""Speculation over block tables (models/paged_decoder.py, spec_k > 0):
the batched speculative rounds run through the paged KV pool — greedy
streams must stay token-identical to the single-stream ``JaxDecoderLM``
while prompt prefixes are shared by REFERENCE through the radix tree
and every verify forward writes its k+1 candidate rows through the
slot's block table. Tiny random-init config, CPU.

vLLM/SGLang-class serving composes paged attention WITH speculative
decoding; the reference has neither (per-request HF ``model.generate``,
reference ``llm/client.py:306-369``)."""

import json
import threading

import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.constrain import (SECTIONS_SCHEMA, JsonConstraint,
                                           build_schema_dfa)
from legalrag_tpu.models.decoder import DecoderConfig, JaxDecoderLM
from legalrag_tpu.models.ngram_draft import NgramDraftTable
from legalrag_tpu.models.paged_decoder import PagedDecoderLM


def _mk(cfg, seed, scale=0.3):
    rng = np.random.default_rng(seed)

    def mat(i, o, s=scale):
        return jnp.asarray(rng.standard_normal((i, o)) * s, jnp.float32)

    h, ff, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    hkv = cfg.num_key_value_heads
    embed = mat(cfg.vocab_size, h, 0.5)
    return {
        "embed": embed, "lm_head": embed.T,
        "final_norm": jnp.ones(h, jnp.float32),
        "layers": [
            {"input_norm": jnp.ones(h, jnp.float32),
             "q": {"kernel": mat(h, h), "bias": jnp.zeros(h)},
             "k": {"kernel": mat(h, hkv * d), "bias": jnp.zeros(hkv * d)},
             "v": {"kernel": mat(h, hkv * d), "bias": jnp.zeros(hkv * d)},
             "o": {"kernel": mat(h, h)},
             "post_norm": jnp.ones(h, jnp.float32),
             "gate": {"kernel": mat(h, ff)},
             "up": {"kernel": mat(h, ff)},
             "down": {"kernel": mat(ff, h)}}
            for _ in range(cfg.num_hidden_layers)
        ],
    }


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=128,
                        tie_word_embeddings=True)
    return cfg, _mk(cfg, 23, 0.3)


PROMPTS = [[5, 6, 7, 5, 6, 7, 5, 6],      # bigram structure: accepts
           [22, 81, 14, 60, 33],           # varied: rejections
           [12, 41, 3, 3, 3, 9],
           [2, 2],
           [9, 10, 11, 9, 10]]


@pytest.fixture(scope="module")
def refs(tiny):
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    refs = {tuple(p): list(lm.generate_stream(p, max_new_tokens=12))
            for p in PROMPTS}
    assert any(len(set(r)) >= 4 for r in refs.values()), \
        "fixture collapsed; token-parity tests would be vacuous"
    return refs


def _run_concurrent(engine, prompts, **kw):
    results = {}

    def go(p):
        results[tuple(p)] = list(engine.generate_stream(p, **kw))

    threads = [threading.Thread(target=go, args=(p,)) for p in prompts]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    return results


def _engine(tiny, **kw):
    cfg, params = tiny
    kw.setdefault("max_len", 96)
    kw.setdefault("block_size", 16)
    kw.setdefault("spec_k", 4)
    kw.setdefault("spec_steps", 2)
    return PagedDecoderLM(params, cfg, **kw)


def test_concurrent_spec_greedy_matches_single_stream(tiny, refs):
    engine = _engine(tiny, n_slots=3)
    try:
        got = _run_concurrent(engine, PROMPTS[:3], max_new_tokens=12)
        for p in PROMPTS[:3]:
            assert got[tuple(p)] == refs[tuple(p)], p
    finally:
        engine.close()


def test_spec_slot_reuse(tiny, refs):
    engine = _engine(tiny, n_slots=2)
    try:
        got = _run_concurrent(engine, PROMPTS, max_new_tokens=12)
        for p in PROMPTS:
            assert got[tuple(p)] == refs[tuple(p)], p
    finally:
        engine.close()


def test_spec_eos(tiny, refs):
    ref = refs[tuple(PROMPTS[0])]
    eos = ref[4]
    engine = _engine(tiny, n_slots=2)
    try:
        got = list(engine.generate_stream(PROMPTS[0], max_new_tokens=12,
                                          eos_id=eos))
        assert got == ref[:ref.index(eos)]
    finally:
        engine.close()


def test_spec_budget_exact(tiny):
    engine = _engine(tiny, n_slots=2, spec_steps=3)
    try:
        for n in (1, 2, 5, 11):
            got = list(engine.generate_stream(PROMPTS[2],
                                              max_new_tokens=n))
            assert len(got) == n, n
    finally:
        engine.close()


def test_spec_mixed_greedy_and_sampled(tiny, refs):
    """A greedy slot must stay token-identical while a sampled slot runs
    in the same spec batch."""
    cfg, params = tiny
    engine = _engine(tiny, n_slots=2)
    try:
        out = {}

        def greedy():
            out["g"] = list(engine.generate_stream(PROMPTS[0],
                                                   max_new_tokens=12))

        def sampled():
            out["s"] = list(engine.generate_stream(
                PROMPTS[1], max_new_tokens=10, temperature=0.9, seed=7))

        ts = [threading.Thread(target=greedy),
              threading.Thread(target=sampled)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        assert out["g"] == refs[tuple(PROMPTS[0])]
        assert len(out["s"]) == 10
        assert all(0 <= t < cfg.vocab_size for t in out["s"])
    finally:
        engine.close()


def test_spec_headroom_budget_clamp(tiny):
    engine = _engine(tiny, max_len=32, block_size=8, n_slots=1)
    try:
        p = list(range(1, 13))  # 12 tokens; budget = 32 - 12 - 4 = 16
        got = list(engine.generate_stream(p, max_new_tokens=100))
        assert len(got) == 16
        with pytest.raises(ValueError):
            next(engine.generate_stream(list(range(1, 29)),
                                        max_new_tokens=4))
    finally:
        engine.close()


def test_spec_radix_reuse_keeps_parity(tiny):
    """Radix prefix sharing composes with speculation: the second
    admission of a shared-prefix prompt attaches published blocks by
    reference (zero prefill for them) and the output stays identical."""
    cfg, params = tiny
    base = list(np.random.default_rng(3).integers(1, 90, 37))
    prompts = [base + [7, 8], base + [9]]
    ref_lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    want = {tuple(p): list(ref_lm.generate_stream(p, max_new_tokens=10))
            for p in prompts}
    engine = _engine(tiny, n_slots=1)
    try:
        for p in prompts:
            assert list(engine.generate_stream(p, max_new_tokens=10)) \
                == want[tuple(p)], p
        stats = engine.paged_stats()
        # 37-token shared prefix = 2 full 16-token blocks reused
        assert stats["reused_blocks"] >= 2, stats
    finally:
        engine.close()


def test_spec_ngram_table_parity(tiny, refs):
    """Correctness is unconditional in draft quality: a corpus table
    built from streams unrelated to the model changes nothing."""
    rng = np.random.default_rng(3)
    streams = [rng.integers(0, 97, 64).tolist() for _ in range(8)]
    table = NgramDraftTable.from_streams(streams, k=4, log2_size=10)
    engine = _engine(tiny, n_slots=2, ngram_draft=table)
    try:
        got = _run_concurrent(engine, PROMPTS[:3], max_new_tokens=12)
        for p in PROMPTS[:3]:
            assert got[tuple(p)] == refs[tuple(p)], p
    finally:
        engine.close()


def test_spec_draft_model_parity(tiny, refs):
    """Draft-MODEL speculation over block tables: any draft params give
    token-identical greedy output (quality only affects acceptance)."""
    cfg, params = tiny
    dcfg = DecoderConfig(vocab_size=97, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, num_key_value_heads=1,
                         intermediate_size=32, max_position_embeddings=128)
    engine = _engine(tiny, n_slots=2, draft=(_mk(dcfg, 99), dcfg))
    try:
        got = _run_concurrent(engine, PROMPTS[:3], max_new_tokens=12)
        for p in PROMPTS[:3]:
            assert got[tuple(p)] == refs[tuple(p)], p
    finally:
        engine.close()


def test_spec_draft_requires_spec_k(tiny):
    cfg, params = tiny
    dcfg = DecoderConfig(vocab_size=97, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, num_key_value_heads=1,
                         intermediate_size=32, max_position_embeddings=128)
    with pytest.raises(ValueError):
        PagedDecoderLM(params, cfg, max_len=96, block_size=16,
                       draft=(_mk(dcfg, 99), dcfg))


def test_spec_chunked_admission_matches_single_stream(tiny):
    """Spec-mode chunked admission through the table: long prompts
    prefill in chunk forwards, then the first token samples from the
    last chunk's logits — token-identical to the plain engine."""
    cfg, params = tiny
    rng = np.random.default_rng(47)
    prompts = [list(rng.integers(1, 90, 12)) * 3,
               list(rng.integers(1, 90, 21))]
    ref_lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    want = {tuple(p): list(ref_lm.generate_stream(p, max_new_tokens=10))
            for p in prompts}
    engine = _engine(tiny, n_slots=2, prefill_chunk=16)
    try:
        got = _run_concurrent(engine, prompts, max_new_tokens=10)
        for p in prompts:
            assert got[tuple(p)] == want[tuple(p)], len(p)
    finally:
        engine.close()


def test_client_plumbs_paged_spec(monkeypatch):
    """llm.paged_kv + llm.spec_k compose: the client routes speculation
    to the paged engine (no silent fallback to the contiguous one)."""
    import legalrag_tpu.models.paged_decoder as pd
    from legalrag_tpu.config import LLMConfig
    from legalrag_tpu.llm.client import LLMClient

    captured = {}

    def fake(name, **kw):
        captured.update(kw)
        return object()

    monkeypatch.setattr(pd.PagedDecoderLM, "from_pretrained",
                        staticmethod(fake))
    c = LLMClient(LLMConfig(provider="local-jax", batch_slots=2, spec_k=4,
                            paged_kv=True, draft_model="tiny-draft"))
    c._load_jax_lm()
    assert captured["spec_k"] == 4 and captured["n_slots"] == 2
    assert captured["draft_model"] == "tiny-draft"
    assert "prefix_cache" not in captured   # subsumed by the radix tree


# ------------------------------------------------- constrained decoding

def _toy_vocab():
    texts = [None,
             '{"sections"', ': [', '{"heading"', ': "', 'law',
             '第五百条', '", "items": ["', '", "', '"]}', ', ', ']}',
             ' ', 'b', '[]}']
    return texts


def test_spec_constrained_stream_valid(tiny):
    """A constrained stream through paged speculation emits a prefix of
    a schema-valid document (complete on EOS), with a free stream
    sharing the batch untouched."""
    texts = _toy_vocab()
    cfg = DecoderConfig(vocab_size=len(texts), hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, intermediate_size=64,
                        max_position_embeddings=128)
    params = _mk(cfg, 83)
    tb = [t.encode("utf-8") if t else None for t in texts]
    jc = JsonConstraint.from_schema(SECTIONS_SCHEMA, tb)
    plain_ref = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    free_want = list(plain_ref.generate_stream([12, 14], max_new_tokens=12))
    engine = PagedDecoderLM(params, cfg, max_len=96, block_size=16,
                            n_slots=2, spec_k=4, spec_steps=2,
                            json_constraint=jc)
    try:
        got = {}
        ts = [threading.Thread(target=lambda: got.__setitem__(
                  "c", list(engine.generate_stream(
                      [12, 14, 12], max_new_tokens=40, eos_id=0,
                      constrain=True)))),
              threading.Thread(target=lambda: got.__setitem__(
                  "f", list(engine.generate_stream(
                      [12, 14], max_new_tokens=12))))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        assert got["f"] == free_want
        trans, acc = build_schema_dfa(SECTIONS_SCHEMA)
        text = "".join(texts[t] for t in got["c"] if texts[t])
        st = 0
        for bt in text.encode("utf-8"):
            st = trans[st, bt]
            assert st >= 0, f"invalid constrained output: {text!r}"
        if len(got["c"]) < 40:   # finished via EOS → complete document
            assert bool(acc[st]), text
            assert "sections" in json.loads(text)
    finally:
        engine.close()
