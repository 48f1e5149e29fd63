"""Continuous-batching generation engine: greedy streams must be
token-identical to the single-stream ``JaxDecoderLM`` across concurrent
submission, mid-flight joins, slot reuse, EOS, budget, and cancellation
— tiny random-init config (no weights needed)."""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.batched_decoder import BatchedDecoderLM
from legalrag_tpu.models.decoder import DecoderConfig, JaxDecoderLM


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=64,
                        tie_word_embeddings=True)
    rng = np.random.default_rng(7)

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


PROMPTS = [[1, 2, 3], [4, 5, 6, 7, 8], [9, 10], [11, 12, 13, 14],
           [15, 16, 17, 18, 19, 20]]


@pytest.fixture(scope="module")
def reference_outputs(tiny):
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=48, decode_chunk=1)
    refs = {tuple(p): list(lm.generate_stream(p, max_new_tokens=10))
            for p in PROMPTS}
    assert any(len(set(r)) >= 4 for r in refs.values()), \
        "fixture collapsed; token-parity tests would be vacuous"
    return refs


def _collect_concurrently(engine, prompts, **kw):
    """Run one generate_stream per prompt on its own thread."""
    results = {}

    def run(p):
        results[tuple(p)] = list(engine.generate_stream(p, **kw))

    threads = [threading.Thread(target=run, args=(p,)) for p in prompts]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    return results


def test_concurrent_greedy_matches_single_stream(tiny, reference_outputs):
    cfg, params = tiny
    engine = BatchedDecoderLM(params, cfg, max_len=48, n_slots=3,
                              decode_chunk=4)
    try:
        got = _collect_concurrently(engine, PROMPTS[:3], max_new_tokens=10)
        for p in PROMPTS[:3]:
            assert got[tuple(p)] == reference_outputs[tuple(p)], p
    finally:
        engine.close()


def test_slot_reuse_more_requests_than_slots(tiny, reference_outputs):
    cfg, params = tiny
    engine = BatchedDecoderLM(params, cfg, max_len=48, n_slots=2,
                              decode_chunk=4)
    try:
        got = _collect_concurrently(engine, PROMPTS, max_new_tokens=10)
        for p in PROMPTS:
            assert got[tuple(p)] == reference_outputs[tuple(p)], p
    finally:
        engine.close()


def test_mid_flight_join(tiny):
    """A stream joining while another is decoding must not disturb it."""
    cfg, params = tiny
    ref_lm = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=1)
    ref_a = list(ref_lm.generate_stream(PROMPTS[0], max_new_tokens=24))
    ref_b = list(ref_lm.generate_stream(PROMPTS[1], max_new_tokens=10))
    engine = BatchedDecoderLM(params, cfg, max_len=64, n_slots=2,
                              decode_chunk=2)
    try:
        first, second = [], []
        gen_a = engine.generate_stream(PROMPTS[0], max_new_tokens=24)
        first.append(next(gen_a))  # A is decoding: B joins now
        th = threading.Thread(
            target=lambda: second.extend(
                engine.generate_stream(PROMPTS[1], max_new_tokens=10)))
        th.start()
        first.extend(gen_a)
        th.join(timeout=120)
        assert first == ref_a
        assert second == ref_b
    finally:
        engine.close()


def test_eos_stops_stream(tiny, reference_outputs):
    cfg, params = tiny
    ref = reference_outputs[tuple(PROMPTS[0])]
    eos = ref[4]  # stop at this token's FIRST occurrence in the stream
    engine = BatchedDecoderLM(params, cfg, max_len=48, n_slots=2,
                              decode_chunk=4)
    try:
        got = list(engine.generate_stream(PROMPTS[0], max_new_tokens=10,
                                          eos_id=eos))
        assert got == ref[:ref.index(eos)]
    finally:
        engine.close()


def test_budget_and_prompt_validation(tiny):
    cfg, params = tiny
    engine = BatchedDecoderLM(params, cfg, max_len=16, n_slots=1,
                              decode_chunk=4)
    try:
        with pytest.raises(ValueError):
            list(engine.generate_stream(list(range(1, 20)),
                                        max_new_tokens=4))
        got = list(engine.generate_stream([1, 2, 3, 4, 5, 6, 7, 8, 9, 10,
                                           11, 12], max_new_tokens=100))
        assert len(got) == 4  # clamped to the 16-token cache
    finally:
        engine.close()


def test_sampled_streams_deterministic_and_valid(tiny):
    cfg, params = tiny
    engine = BatchedDecoderLM(params, cfg, max_len=48, n_slots=2,
                              decode_chunk=4)
    try:
        kw = dict(max_new_tokens=8, temperature=0.8, top_p=0.9, seed=3)
        out1 = list(engine.generate_stream(PROMPTS[2], **kw))
        out2 = list(engine.generate_stream(PROMPTS[2], **kw))
        assert out1 == out2
        assert len(out1) == 8
        assert all(0 <= t < cfg.vocab_size for t in out1)
    finally:
        engine.close()


def test_cancellation_frees_slot(tiny, reference_outputs):
    cfg, params = tiny
    engine = BatchedDecoderLM(params, cfg, max_len=48, n_slots=1,
                              decode_chunk=2)
    try:
        gen = engine.generate_stream(PROMPTS[0], max_new_tokens=10)
        assert next(gen) == reference_outputs[tuple(PROMPTS[0])][0]
        gen.close()  # client disconnect mid-generation
        # the single slot must free up for the next request
        got = list(engine.generate_stream(PROMPTS[1], max_new_tokens=10))
        assert got == reference_outputs[tuple(PROMPTS[1])]
    finally:
        engine.close()


def test_chunked_admission_matches_single_shot(tiny):
    """Prompts longer than prefill_chunk admit in sequential chunk
    forwards at slot-row offsets — token-identical to one-shot admission
    (and to the single-stream engine), incl. a non-multiple tail chunk."""
    cfg, params = tiny
    rng = np.random.default_rng(41)
    prompts = [list(rng.integers(1, 90, n)) for n in (17, 33, 45)]
    ref_lm = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=1)
    want = {tuple(p): list(ref_lm.generate_stream(p, max_new_tokens=8))
            for p in prompts}
    engine = BatchedDecoderLM(params, cfg, max_len=64, n_slots=2,
                              decode_chunk=4, prefill_chunk=16)
    try:
        got = _collect_concurrently(engine, prompts, max_new_tokens=8)
        for p in prompts:
            assert got[tuple(p)] == want[tuple(p)], len(p)
    finally:
        engine.close()


def test_chunked_admission_skips_short_prefix_hits(tiny):
    """A prefix hit whose suffix exceeds prefill_chunk falls back to the
    chunked cold path (mirrors JaxDecoderLM._prefill_prompt)."""
    cfg, params = tiny
    rng = np.random.default_rng(43)
    donor = list(rng.integers(1, 90, 40))
    probe = donor[:20] + list(rng.integers(1, 90, 25))  # 25-token suffix
    ref_lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    want = list(ref_lm.generate_stream(probe, max_new_tokens=8))
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=1,
                              decode_chunk=4, prefill_chunk=16,
                              prefix_cache=2)
    try:
        list(engine.generate_stream(donor, max_new_tokens=2))  # store rows
        got = list(engine.generate_stream(probe, max_new_tokens=8))
        assert got == want
    finally:
        engine.close()


def test_close_is_idempotent_and_rejects_new_streams(tiny):
    cfg, params = tiny
    engine = BatchedDecoderLM(params, cfg, max_len=32, n_slots=1)
    engine.close()
    engine.close()
    with pytest.raises(RuntimeError):
        next(engine.generate_stream([1, 2], max_new_tokens=2))
