"""int8 KV cache (models/decoder.py quantize_kv): error bound, engine
parity, and the exactness properties the design claims — prefix reuse,
chunked prefill, batched and speculative engines all quantize the same
rows from the same values, so they stay token-identical to EACH OTHER
under quantization (and close to the dense-cache engine).

Replaces the KV-memory surface the reference leaves to HF defaults
(reference ``llm/client.py:306-369``); tiny random-init config, CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.batched_decoder import BatchedDecoderLM
from legalrag_tpu.models.decoder import (DecoderConfig, JaxDecoderLM,
                                         dequantize_kv, quantize_kv)
from legalrag_tpu.models.spec_decode import SpecLookupDecoderLM


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=64,
                        tie_word_embeddings=True)
    rng = np.random.default_rng(11)

    # Scales chosen so the greedy stream is DIVERSE (9 distinct tokens in
    # the first 12) — at the 0.05 init other engine tests use, the tiny
    # model collapses to one repeated token and every token-parity
    # assertion here would be vacuous.
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


PROMPT = [5, 9, 2, 9, 2, 7, 1, 4, 9, 2, 7, 3]  # repeated bigrams for spec


# ------------------------------------------------------------ quantizer

def test_roundtrip_error_bounded_by_half_scale():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 8, 2, 16)) * 3.0, jnp.float32)
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == x.shape[:-1] + (1,)
    err = jnp.abs(dequantize_kv(q, s, jnp.float32) - x)
    # symmetric rounding: |err| <= scale/2 = amax/254 per element
    assert bool(jnp.all(err <= s / 2 + 1e-6))


def test_zero_rows_quantize_to_zero():
    q, s = quantize_kv(jnp.zeros((1, 4, 2, 8), jnp.float32))
    assert bool(jnp.all(q == 0))
    assert bool(jnp.all(dequantize_kv(q, s, jnp.float32) == 0.0))


# ------------------------------------------------------ engine behavior

def test_quant_cache_memory_nearly_halved(tiny):
    cfg, params = tiny
    dense = JaxDecoderLM(params, cfg, max_len=48)._empty_cache(1)
    quant = JaxDecoderLM(params, cfg, max_len=48,
                         kv_quant=True)._empty_cache(1)
    nb = lambda c: sum(a.nbytes for layer in c for a in layer)
    # f32 dense halves to int8+scale; bf16 checkpoints see ~1.9×
    assert nb(quant) < 0.65 * nb(dense)


def test_quant_greedy_tracks_dense(tiny):
    """Logits after prefill stay close; the greedy streams of this fixture
    agree (deterministic — any divergence would be a near-tie artifact,
    so the stream check guards regressions, the logit check the error)."""
    cfg, params = tiny
    dense = JaxDecoderLM(params, cfg, max_len=48)
    quant = JaxDecoderLM(params, cfg, max_len=48, kv_quant=True)
    bucket = 16
    padded = jnp.asarray([PROMPT + [0] * (bucket - len(PROMPT))], jnp.int32)
    ld, _ = dense._prefill_fn(dense.params, padded, jnp.int32(len(PROMPT)))
    lq, _ = quant._prefill_fn(quant.params, padded, jnp.int32(len(PROMPT)))
    scale = float(jnp.max(jnp.abs(ld)))
    assert float(jnp.max(jnp.abs(ld - lq))) < 0.05 * max(scale, 1.0)
    td = list(dense.generate_stream(PROMPT, max_new_tokens=12))
    tq = list(quant.generate_stream(PROMPT, max_new_tokens=12))
    assert len(set(td)) >= 5, "fixture collapsed; parity would be vacuous"
    assert td == tq


def test_prefix_reuse_exact_under_quant(tiny):
    """Prefix rows are stored already-quantized; reusing them is exact
    against a cold quantized prefill (same quantized values either way)."""
    cfg, params = tiny
    cold = JaxDecoderLM(params, cfg, max_len=48, kv_quant=True)
    warm = JaxDecoderLM(params, cfg, max_len=48, kv_quant=True,
                        prefix_cache=4)
    donor = list(range(1, 25))               # ≥ _PREFIX_MIN shared tokens
    probe = donor[:20] + [40, 41, 42]
    list(warm.generate_stream(donor, max_new_tokens=2))  # stores rows
    got = list(warm.generate_stream(probe, max_new_tokens=10))
    assert warm.prefix_stats["hits"] >= 1
    assert got == list(cold.generate_stream(probe, max_new_tokens=10))


def test_chunked_prefill_exact_under_quant(tiny):
    """Within-forward attention reads the dequantized cache, so chunked
    prefill quantizes and attends the same rows as single-shot."""
    cfg, params = tiny
    prompt = list(np.random.default_rng(3).integers(1, 96, 30))
    one = JaxDecoderLM(params, cfg, max_len=64, kv_quant=True,
                       prefill_chunk=1024)
    chunked = JaxDecoderLM(params, cfg, max_len=64, kv_quant=True,
                           prefill_chunk=16)
    a = list(one.generate_stream(prompt, max_new_tokens=10))
    b = list(chunked.generate_stream(prompt, max_new_tokens=10))
    assert a == b


def test_batched_quant_matches_single_quant(tiny):
    cfg, params = tiny
    single = JaxDecoderLM(params, cfg, max_len=48, kv_quant=True)
    want = list(single.generate_stream(PROMPT, max_new_tokens=10))
    engine = BatchedDecoderLM(params, cfg, max_len=48, n_slots=2,
                              decode_chunk=4, kv_quant=True)
    try:
        got = list(engine.generate_stream(PROMPT, max_new_tokens=10))
    finally:
        engine.close()
    assert got == want


def test_spec_quant_matches_plain_quant(tiny):
    cfg, params = tiny
    plain = JaxDecoderLM(params, cfg, max_len=48, kv_quant=True)
    want = list(plain.generate_stream(PROMPT, max_new_tokens=10))
    spec = SpecLookupDecoderLM(params, cfg, max_len=48, kv_quant=True,
                               spec_k=4, spec_steps=2)
    got = list(spec.generate_stream(PROMPT, max_new_tokens=10))
    assert got == want


def test_batched_spec_quant_matches_plain_quant(tiny):
    cfg, params = tiny
    plain = JaxDecoderLM(params, cfg, max_len=48, kv_quant=True)
    want = list(plain.generate_stream(PROMPT, max_new_tokens=10))
    engine = BatchedDecoderLM(params, cfg, max_len=48, n_slots=2,
                              decode_chunk=4, spec_k=4, spec_steps=2,
                              kv_quant=True)
    try:
        got = list(engine.generate_stream(PROMPT, max_new_tokens=10))
    finally:
        engine.close()
    assert got == want


def test_sampled_quant_stream_reproducible(tiny):
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=48, kv_quant=True)
    a = list(lm.generate_stream(PROMPT, max_new_tokens=8, temperature=0.8,
                                seed=7))
    b = list(lm.generate_stream(PROMPT, max_new_tokens=8, temperature=0.8,
                                seed=7))
    assert a == b and len(a) == 8


def test_client_plumbs_kv_quant_and_prefill_chunk(monkeypatch):
    """LLMConfig.kv_quant / prefill_chunk reach every engine constructor
    through the local-jax provider seam."""
    import legalrag_tpu.models.batched_decoder as bd
    import legalrag_tpu.models.decoder as dec
    from legalrag_tpu.config import LLMConfig
    from legalrag_tpu.llm.client import LLMClient

    captured = {}

    def fake(name, **kw):
        captured.clear()
        captured.update(kw)
        return object()

    monkeypatch.setattr(bd.BatchedDecoderLM, "from_pretrained",
                        staticmethod(fake))
    monkeypatch.setattr(dec.JaxDecoderLM, "from_pretrained",
                        staticmethod(fake))
    c = LLMClient(LLMConfig(provider="local-jax", batch_slots=2,
                            kv_quant=True, prefill_chunk=256))
    c._load_jax_lm()
    assert captured["kv_quant"] is True
    assert captured["prefill_chunk"] == 256
    assert captured["n_slots"] == 2

    c = LLMClient(LLMConfig(provider="local-jax", kv_quant=True,
                            prefill_chunk=128))
    c._load_jax_lm()
    assert captured["kv_quant"] is True and captured["prefill_chunk"] == 128
