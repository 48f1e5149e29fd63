"""Batched speculative decoding: concurrent greedy streams must be
token-identical to the single-stream ``JaxDecoderLM`` with per-slot
drafts/acceptance in play — tiny random-init config."""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.batched_decoder import BatchedDecoderLM
from legalrag_tpu.models.decoder import DecoderConfig, JaxDecoderLM


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=128,
                        tie_word_embeddings=True)
    rng = np.random.default_rng(23)

    # 0.3/0.5 init keeps the greedy stream DIVERSE: at the earlier 0.05
    # init this tiny model collapsed to repeating the prompt's last token,
    # making every token-parity assertion in this file near-vacuous.
    def mat(i, o, scale=0.3):
        return jnp.asarray(rng.standard_normal((i, o)) * scale, jnp.float32)

    h, ff, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    hkv = cfg.num_key_value_heads
    embed = mat(cfg.vocab_size, h, 0.5)
    params = {
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
    return cfg, params


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


def test_concurrent_spec_greedy_matches_single_stream(tiny, refs):
    cfg, params = tiny
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=3,
                              spec_k=4, spec_steps=2)
    try:
        got = _run_concurrent(engine, PROMPTS[:3], max_new_tokens=12)
        for p in PROMPTS[:3]:
            assert got[tuple(p)] == refs[tuple(p)], p
    finally:
        engine.close()


def test_spec_slot_reuse(tiny, refs):
    cfg, params = tiny
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              spec_k=4, spec_steps=2)
    try:
        got = _run_concurrent(engine, PROMPTS, max_new_tokens=12)
        for p in PROMPTS:
            assert got[tuple(p)] == refs[tuple(p)], p
    finally:
        engine.close()


def test_spec_eos(tiny, refs):
    cfg, params = tiny
    ref = refs[tuple(PROMPTS[0])]
    eos = ref[4]
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              spec_k=4, spec_steps=2)
    try:
        got = list(engine.generate_stream(PROMPTS[0], max_new_tokens=12,
                                          eos_id=eos))
        assert got == ref[:ref.index(eos)]
    finally:
        engine.close()


def test_spec_budget_exact(tiny):
    cfg, params = tiny
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              spec_k=4, spec_steps=3)
    try:
        for n in (1, 2, 5, 11):
            got = list(engine.generate_stream(PROMPTS[2],
                                              max_new_tokens=n))
            assert len(got) == n, n
    finally:
        engine.close()


def test_spec_mixed_greedy_and_sampled(tiny, refs):
    """A greedy slot must stay token-identical while a sampled slot runs
    in the same batch."""
    cfg, params = tiny
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              spec_k=4, spec_steps=2)
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
    cfg, params = tiny
    engine = BatchedDecoderLM(params, cfg, max_len=24, n_slots=1,
                              spec_k=4, spec_steps=2)
    try:
        p = list(range(1, 13))  # 12 tokens; budget = 24 - 12 - 4 = 8
        got = list(engine.generate_stream(p, max_new_tokens=100))
        assert len(got) == 8
        with pytest.raises(ValueError):
            next(engine.generate_stream(list(range(1, 21)),
                                        max_new_tokens=4))
    finally:
        engine.close()


def test_spec_chunked_admission_matches_single_stream(tiny):
    """Spec-mode chunked admission: long prompts prefill in chunk
    forwards, then the first token samples from the last chunk's logits
    — token-identical to the plain single-stream engine."""
    cfg, params = tiny
    rng = np.random.default_rng(47)
    # repetition in the tail so the spec drafts have bigrams to match
    prompts = [list(rng.integers(1, 90, 12)) * 3,
               list(rng.integers(1, 90, 21))]
    ref_lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    want = {tuple(p): list(ref_lm.generate_stream(p, max_new_tokens=10))
            for p in prompts}
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              spec_k=4, spec_steps=2, prefill_chunk=16)
    try:
        got = _run_concurrent(engine, prompts, max_new_tokens=10)
        for p in prompts:
            assert got[tuple(p)] == want[tuple(p)], len(p)
    finally:
        engine.close()
