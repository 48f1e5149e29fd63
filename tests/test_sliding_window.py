"""Sliding-window attention (Mistral-class band, Gemma-class alternating
layers) through the SERVING engines: the banding lives in
``decoder_forward``'s mask (decoder.py), so batched slot offsets,
speculation verify positions, shared-prefix absolute positions, and KV
quantization must all preserve it. Greedy parity across engines pins
that. CPU, tiny random config.

Reference analogue: HF applies the band inside ``model.generate``
(reference ``llm/client.py:306-369``); here the engines own it."""

import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.batched_decoder import BatchedDecoderLM
from legalrag_tpu.models.decoder import DecoderConfig, JaxDecoderLM
from legalrag_tpu.models.spec_decode import SpecLookupDecoderLM


def _params(cfg, seed=23):
    rng = np.random.default_rng(seed)

    def mat(i, o, scale=0.3):
        return jnp.asarray(rng.standard_normal((i, o)) * scale, jnp.float32)

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
def mistral_band():
    """Every layer banded at window 8 (Mistral v0.1 class)."""
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=128,
                        sliding_window=8, model_type="mistral")
    assert cfg.layer_types == ["sliding_attention"] * 2
    return cfg, _params(cfg)


# prompts LONGER than the window so the band actually truncates history
PROMPTS = [list(range(5, 25)), [7, 9] * 9, [3] * 12 + [60, 61, 62]]


def test_band_actually_matters(mistral_band):
    """Sanity: the banded model decodes differently from the full-attention
    model on long prompts — otherwise the parity tests prove nothing."""
    cfg, params = mistral_band
    full_cfg = DecoderConfig(vocab_size=97, hidden_size=32,
                             num_hidden_layers=2, num_attention_heads=4,
                             num_key_value_heads=2, intermediate_size=64,
                             max_position_embeddings=128)
    banded = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    full = JaxDecoderLM(params, full_cfg, max_len=96, decode_chunk=1)
    outs_b = [list(banded.generate_stream(p, max_new_tokens=16))
              for p in PROMPTS]
    outs_f = [list(full.generate_stream(p, max_new_tokens=16))
              for p in PROMPTS]
    assert outs_b != outs_f


def test_sliding_engines_token_identical(mistral_band):
    cfg, params = mistral_band
    plain = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    spec = SpecLookupDecoderLM(params, cfg, max_len=96, spec_k=4,
                               spec_steps=2)
    eng = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                           decode_chunk=4)
    try:
        for p in PROMPTS:
            want = list(plain.generate_stream(p, max_new_tokens=16))
            assert list(spec.generate_stream(p, max_new_tokens=16)) == want
            assert list(eng.generate_stream(p, max_new_tokens=16)) == want
    finally:
        eng.close()


def test_sliding_with_shared_prefix_and_kv_quant(mistral_band):
    """The band crosses the pinned-segment boundary (shared prefix longer
    than the window) and survives int8 KV quantization."""
    cfg, params = mistral_band
    shared = list(range(1, 13))                 # 12 > window 8
    prompts = [shared + [70, 71, 72], shared + [7, 9] * 4]
    plain = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1,
                         kv_quant=True)
    eng = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                           decode_chunk=4, shared_prefix=shared,
                           kv_quant=True)
    try:
        for p in prompts:
            want = list(plain.generate_stream(p, max_new_tokens=14))
            assert list(eng.generate_stream(p, max_new_tokens=14)) == want, p
    finally:
        eng.close()


def test_sliding_gemma_alternating_layers():
    """Gemma-2 class: banded/full alternate by layer index."""
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=128,
                        sliding_window=8, model_type="gemma2")
    assert cfg.layer_types == ["sliding_attention", "full_attention"]
    params = _params(cfg, seed=5)
    plain = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    eng = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                           decode_chunk=4)
    try:
        for p in PROMPTS[:2]:
            want = list(plain.generate_stream(p, max_new_tokens=14))
            assert list(eng.generate_stream(p, max_new_tokens=14)) == want
    finally:
        eng.close()
