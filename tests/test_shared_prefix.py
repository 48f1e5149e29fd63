"""Physically shared system-prefix segment (BatchedDecoderLM
shared_prefix): ONE pinned copy of the prefix's KV rows serves every
slot — token-parity with the single-stream engine on full prompts,
non-matching prompts, mixed batches, speculation, quantization, and the
capacity accounting the design promises. Tiny random-init config, CPU.

Replaces the per-slot prefix copies of PrefixKVCache for the RAG
serving shape (every request = shared template + per-request suffix);
the reference has no KV management at all (HF ``model.generate``,
reference ``llm/client.py:306-369``).
"""

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
                        intermediate_size=64, max_position_embeddings=128)
    rng = np.random.default_rng(71)

    # 0.3/0.5 init keeps the greedy stream diverse (see the note in
    # test_batched_decoder.py)
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


SHARED = list(range(40, 60)) + [3, 9, 3, 9]     # 24-token "system template"
SUFFIXES = [[70, 71, 72], [80, 81, 82, 83, 84], [7, 9, 3, 9]]
PROMPTS = [SHARED + sfx for sfx in SUFFIXES]


def _run_concurrent(engine, prompts, **kw):
    got = {}

    def go(p):
        got[tuple(p)] = list(engine.generate_stream(p, **kw))

    ts = [threading.Thread(target=go, args=(p,)) for p in prompts]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=180)
    return got


@pytest.fixture(scope="module")
def refs(tiny):
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    refs = {tuple(p): list(lm.generate_stream(p, max_new_tokens=12))
            for p in PROMPTS}
    assert any(len(set(r)) >= 4 for r in refs.values()), \
        "fixture collapsed; token-parity tests would be vacuous"
    return refs


def test_shared_slots_match_single_stream(tiny, refs):
    cfg, params = tiny
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=3,
                              decode_chunk=4, shared_prefix=SHARED)
    try:
        got = _run_concurrent(engine, PROMPTS, max_new_tokens=12)
        for p in PROMPTS:
            assert got[tuple(p)] == refs[tuple(p)], p
    finally:
        engine.close()


def test_cache_capacity_shrinks(tiny):
    """Slot rows shrink by the shared length; the pinned segment is one
    copy, not one per slot."""
    cfg, params = tiny
    plain = BatchedDecoderLM(params, cfg, max_len=96, n_slots=3)
    shared = BatchedDecoderLM(params, cfg, max_len=96, n_slots=3,
                              shared_prefix=SHARED)
    try:
        nb = lambda c: sum(a.nbytes for l in c for a in l)
        assert shared._cache[0][0].shape[1] == 96 - len(SHARED)
        pinned = nb(shared._shared_kv)
        assert nb(shared._cache) + pinned < nb(plain._cache)
        # one pinned copy ≈ 1/n_slots of the per-slot alternative
        per_slot = nb(plain._cache) * len(SHARED) // 96 // 3
        assert pinned <= per_slot * 1.01
    finally:
        plain.close()
        shared.close()


def test_nonmatching_prompt_correct_with_reduced_budget(tiny, refs):
    cfg, params = tiny
    other = [11, 12, 13, 14, 15]                # does not start with SHARED
    lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    want = list(lm.generate_stream(other, max_new_tokens=12))
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              decode_chunk=4, shared_prefix=SHARED)
    try:
        got = list(engine.generate_stream(other, max_new_tokens=12))
        assert got == want
        # capacity for non-matching prompts is max_len - shared_len
        slot_cap = 96 - len(SHARED)
        huge = list(engine.generate_stream(other, max_new_tokens=1000))
        assert len(huge) == slot_cap - len(other)
    finally:
        engine.close()


def test_mixed_shared_and_plain_batch(tiny, refs):
    cfg, params = tiny
    other = [11, 12, 13, 14, 15]
    lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    want_other = list(lm.generate_stream(other, max_new_tokens=12))
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              decode_chunk=4, shared_prefix=SHARED)
    try:
        got = _run_concurrent(engine, [PROMPTS[0], other],
                              max_new_tokens=12)
        assert got[tuple(PROMPTS[0])] == refs[tuple(PROMPTS[0])]
        assert got[tuple(other)] == want_other
    finally:
        engine.close()


def test_spec_mode_shared_matches(tiny, refs):
    cfg, params = tiny
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              spec_k=4, spec_steps=2, shared_prefix=SHARED)
    try:
        got = _run_concurrent(engine, PROMPTS[:2], max_new_tokens=12)
        for p in PROMPTS[:2]:
            assert got[tuple(p)] == refs[tuple(p)], p
    finally:
        engine.close()


def test_shared_with_kv_quant_matches_quant_single(tiny):
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=96, kv_quant=True)
    want = {tuple(p): list(lm.generate_stream(p, max_new_tokens=10))
            for p in PROMPTS[:2]}
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              decode_chunk=4, kv_quant=True,
                              shared_prefix=SHARED)
    try:
        got = _run_concurrent(engine, PROMPTS[:2], max_new_tokens=10)
        assert got == want
        assert engine._shared_kv[0][0].dtype == jnp.int8
    finally:
        engine.close()


def test_long_suffix_chunks_and_penalty_compose(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(5)
    prompt = SHARED + list(rng.integers(1, 90, 40))  # suffix > chunk
    lm = JaxDecoderLM(params, cfg, max_len=128, decode_chunk=1)
    want = list(lm.generate_stream(prompt, max_new_tokens=10,
                                   repetition_penalty=1.5))
    engine = BatchedDecoderLM(params, cfg, max_len=128, n_slots=2,
                              decode_chunk=4, prefill_chunk=16,
                              shared_prefix=SHARED)
    try:
        got = list(engine.generate_stream(prompt, max_new_tokens=10,
                                          repetition_penalty=1.5))
        assert got == want
    finally:
        engine.close()


def test_shared_prefix_too_long_raises(tiny):
    cfg, params = tiny
    with pytest.raises(ValueError):
        BatchedDecoderLM(params, cfg, max_len=32,
                         shared_prefix=list(range(1, 31)))


# ------------------------------------------- composition with prefix LRU

CAND = [33, 34, 35, 36] * 5               # 20-token "candidate block"
TAILS = [[70, 71], [80, 81, 82], [7, 9]]
LRU_PROMPTS = [SHARED + CAND + t for t in TAILS]


def test_shared_composes_with_prefix_cache(tiny):
    """shared_prefix + prefix_cache on one engine: requests matching the
    pinned segment reuse the suffix-keyed LRU (the repeated candidate
    block prefills once, rows stored relative to position P) and stay
    token-identical to the plain single-stream engine."""
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    refs = {tuple(p): list(lm.generate_stream(p, max_new_tokens=12))
            for p in LRU_PROMPTS}
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              decode_chunk=4, shared_prefix=SHARED,
                              prefix_cache=4)
    try:
        for p in LRU_PROMPTS:                    # sequential: LRU warms
            got = list(engine.generate_stream(p, max_new_tokens=12))
            assert got == refs[tuple(p)], p
        st = engine._prefix_sfx.stats
        assert st["hits"] >= 2 and st["saved_tokens"] >= 2 * len(CAND), st
    finally:
        engine.close()


def test_shared_composes_with_prefix_cache_spec(tiny):
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    refs = {tuple(p): list(lm.generate_stream(p, max_new_tokens=12))
            for p in LRU_PROMPTS}
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              spec_k=4, spec_steps=2, shared_prefix=SHARED,
                              prefix_cache=4)
    try:
        for p in LRU_PROMPTS:
            got = list(engine.generate_stream(p, max_new_tokens=12))
            assert got == refs[tuple(p)], p
        assert engine._prefix_sfx.stats["hits"] >= 2
    finally:
        engine.close()


def test_nonmatching_prompts_use_full_lru(tiny):
    """In a shared+LRU engine, prompts that do NOT start with the pinned
    segment fall back to the full-prompt LRU — and never cross-match the
    suffix-keyed entries."""
    cfg, params = tiny
    base = [61, 62] + CAND                       # does not start with SHARED
    prompts = [base + t for t in TAILS[:2]]
    lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    refs = {tuple(p): list(lm.generate_stream(p, max_new_tokens=10))
            for p in prompts}
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              decode_chunk=4, shared_prefix=SHARED,
                              prefix_cache=4)
    try:
        for p in prompts:
            got = list(engine.generate_stream(p, max_new_tokens=10))
            assert got == refs[tuple(p)], p
        assert engine._prefix.stats["hits"] >= 1
        assert engine._prefix_sfx.stats["hits"] == 0
    finally:
        engine.close()
