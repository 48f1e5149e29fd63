"""Repetition penalty: HF-exact semantics, identity at 1.0, consistent
across engines — tiny random-init config."""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.batched_decoder import BatchedDecoderLM
from legalrag_tpu.models.decoder import (DecoderConfig, JaxDecoderLM,
                                         apply_repetition_penalty)
from legalrag_tpu.models.spec_decode import SpecLookupDecoderLM


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=128)
    rng = np.random.default_rng(53)

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


def test_matches_hf_processor():
    """apply_repetition_penalty must be bit-compatible with transformers'
    RepetitionPenaltyLogitsProcessor."""
    torch = pytest.importorskip("torch")
    from transformers import RepetitionPenaltyLogitsProcessor

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((1, 50)).astype(np.float32)
    history = [3, 7, 7, 11, 42]
    penalty = 1.3
    want = RepetitionPenaltyLogitsProcessor(penalty)(
        torch.tensor([history]), torch.tensor(logits)).numpy()
    mask = np.zeros((1, 50), bool)
    mask[0, history] = True
    got = np.asarray(apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(mask), jnp.float32(penalty)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_identity_at_one(tiny):
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=64)
    p = [5, 6, 7, 5, 6]
    base = list(lm.generate_stream(p, max_new_tokens=10))
    same = list(lm.generate_stream(p, max_new_tokens=10,
                                   repetition_penalty=1.0))
    assert same == base


def test_penalized_greedy_matches_oracle(tiny):
    """Engine output with a penalty must equal a step-by-step oracle: full
    forward each step + HF-semantics penalty over prompt+generated."""
    from legalrag_tpu.models.decoder import decoder_forward

    cfg, params = tiny
    p = [5, 6, 7, 8]
    penalty = 1.8
    seq = list(p)
    want = []
    for _ in range(12):
        ids = jnp.asarray([seq], jnp.int32)
        pos = jnp.arange(len(seq), dtype=jnp.int32)[None, :]
        logits, _ = decoder_forward(params, cfg, ids, pos)
        last = np.asarray(logits[0, -1])
        seen = np.zeros_like(last, bool)
        seen[list(set(seq))] = True
        scored = np.where(seen, np.where(last > 0, last / penalty,
                                         last * penalty), last)
        tok = int(np.argmax(scored))
        want.append(tok)
        seq.append(tok)
    lm = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=4)
    got = list(lm.generate_stream(p, max_new_tokens=12,
                                  repetition_penalty=penalty))
    assert got == want
    base = list(lm.generate_stream(p, max_new_tokens=12))
    assert got != base  # the penalty visibly changed the trajectory


def test_batched_matches_single_stream_with_penalty(tiny):
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=1)
    prompts = [[5, 6, 7, 8], [9, 10, 11]]
    want = {tuple(p): list(lm.generate_stream(p, max_new_tokens=10,
                                              repetition_penalty=1.5))
            for p in prompts}
    engine = BatchedDecoderLM(params, cfg, max_len=64, n_slots=2,
                              decode_chunk=4)
    try:
        got = {}

        def go(p):
            got[tuple(p)] = list(engine.generate_stream(
                p, max_new_tokens=10, repetition_penalty=1.5))

        ts = [threading.Thread(target=go, args=(p,)) for p in prompts]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert got == want
    finally:
        engine.close()


def test_mixed_penalties_in_one_batch(tiny):
    """A penalized and an unpenalized stream share the batch without
    cross-contamination."""
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=1)
    p1, p2 = [5, 6, 7, 8], [9, 10, 11]
    want1 = list(lm.generate_stream(p1, max_new_tokens=10,
                                    repetition_penalty=1.8))
    want2 = list(lm.generate_stream(p2, max_new_tokens=10))
    engine = BatchedDecoderLM(params, cfg, max_len=64, n_slots=2,
                              decode_chunk=4)
    try:
        got = {}
        ts = [threading.Thread(target=lambda: got.__setitem__(
                  1, list(engine.generate_stream(
                      p1, max_new_tokens=10, repetition_penalty=1.8)))),
              threading.Thread(target=lambda: got.__setitem__(
                  2, list(engine.generate_stream(p2, max_new_tokens=10))))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert got[1] == want1 and got[2] == want2
    finally:
        engine.close()


SPEC_PROMPTS = [[5, 6, 7, 5, 6, 7, 5, 6],   # bigram structure: accepts
                [9, 10, 11, 9, 10]]


def test_spec_engine_exact_with_penalty(tiny):
    """Penalized SPECULATIVE decoding is exact: verify position i's
    seen-set is the emitted set plus that round's drafts before i, so the
    greedy stream is token-identical to the plain penalized engine."""
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=1)
    spec = SpecLookupDecoderLM(params, cfg, max_len=64, spec_k=4,
                               spec_steps=2)
    for p in SPEC_PROMPTS:
        want = list(lm.generate_stream(p, max_new_tokens=12,
                                       repetition_penalty=1.5))
        got = list(spec.generate_stream(p, max_new_tokens=12,
                                        repetition_penalty=1.5))
        assert got == want, p
        assert got != list(lm.generate_stream(p, max_new_tokens=12)), \
            "penalty did not change the trajectory; parity is vacuous"


def test_batched_spec_exact_with_penalty(tiny):
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=1)
    want = {tuple(p): list(lm.generate_stream(p, max_new_tokens=12,
                                              repetition_penalty=1.5))
            for p in SPEC_PROMPTS}
    engine = BatchedDecoderLM(params, cfg, max_len=64, n_slots=2,
                              spec_k=4, spec_steps=2)
    try:
        got = {}

        def go(p):
            got[tuple(p)] = list(engine.generate_stream(
                p, max_new_tokens=12, repetition_penalty=1.5))

        ts = [threading.Thread(target=go, args=(p,)) for p in SPEC_PROMPTS]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert got == want
    finally:
        engine.close()


def test_batched_spec_mixed_penalties(tiny):
    """Penalized and unpenalized streams share the spec batch without
    cross-contamination."""
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=1)
    p1, p2 = SPEC_PROMPTS
    want1 = list(lm.generate_stream(p1, max_new_tokens=12,
                                    repetition_penalty=1.8))
    want2 = list(lm.generate_stream(p2, max_new_tokens=12))
    engine = BatchedDecoderLM(params, cfg, max_len=64, n_slots=2,
                              spec_k=4, spec_steps=2)
    try:
        got = {}
        ts = [threading.Thread(target=lambda: got.__setitem__(
                  1, list(engine.generate_stream(
                      p1, max_new_tokens=12, repetition_penalty=1.8)))),
              threading.Thread(target=lambda: got.__setitem__(
                  2, list(engine.generate_stream(p2, max_new_tokens=12))))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert got[1] == want1 and got[2] == want2
    finally:
        engine.close()
