"""top-k sampling (llm.top_k): HF TopKLogitsWarper bit-parity, the
``top_k=1 == greedy`` invariant across every engine, and per-slot mixing
in the batched engine. The reference inherits top-k silently through HF
``model.generate``'s generation_config defaults (reference
``llm/client.py:336-338``); here it is explicit and tested."""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.batched_decoder import BatchedDecoderLM
from legalrag_tpu.models.decoder import (DecoderConfig, JaxDecoderLM,
                                         _top_k_filter, _warp_filter)
from legalrag_tpu.models.spec_decode import SpecLookupDecoderLM


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=128)
    rng = np.random.default_rng(61)

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


PROMPT = [5, 6, 7, 5, 6, 7, 5, 6]


def test_top_k_filter_matches_hf_warper():
    """_top_k_filter must keep/mask exactly the tokens HF's
    TopKLogitsWarper keeps/masks (incl. ties at the threshold)."""
    torch = pytest.importorskip("torch")
    from transformers import TopKLogitsWarper

    rng = np.random.default_rng(0)
    logits = rng.standard_normal(50).astype(np.float32)
    logits[7] = logits[11]  # tie at a potential threshold
    for k in (1, 5, 11, 50, 80):
        want = TopKLogitsWarper(k)(None, torch.tensor(logits[None]))[0]
        got = np.asarray(_top_k_filter(jnp.asarray(logits), jnp.int32(k)))
        keep_w = np.isfinite(want.numpy())
        keep_g = got > -1e29
        np.testing.assert_array_equal(keep_g, keep_w, err_msg=f"k={k}")
        np.testing.assert_allclose(got[keep_g], logits[keep_w], atol=0)


def test_warp_chain_matches_hf_order():
    """top-k then top-p, the HF warper order: the kept set must equal
    chaining TopKLogitsWarper then TopPLogitsWarper."""
    torch = pytest.importorskip("torch")
    from transformers import TopKLogitsWarper, TopPLogitsWarper

    rng = np.random.default_rng(3)
    logits = rng.standard_normal(50).astype(np.float32) * 2.0
    for k, p in ((5, 0.8), (20, 0.95), (0, 0.9)):
        t = torch.tensor(logits[None])
        if k:
            t = TopKLogitsWarper(k)(None, t)
        t = TopPLogitsWarper(p)(None, t)
        keep_w = np.isfinite(t[0].numpy())
        got = np.asarray(_warp_filter(jnp.asarray(logits), jnp.float32(p),
                                      jnp.int32(k)))
        np.testing.assert_array_equal(got > -1e29, keep_w,
                                      err_msg=f"k={k} p={p}")


def test_top_k_zero_is_identity():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal(64), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_top_k_filter(logits, jnp.int32(0))), np.asarray(logits))


def test_top_k_one_reproduces_greedy_all_engines(tiny):
    """top_k=1 at temperature 0.8 collapses sampling to argmax — every
    engine's stream must equal the greedy stream."""
    cfg, params = tiny
    plain = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=4)
    greedy = list(plain.generate_stream(PROMPT, max_new_tokens=12))
    assert len(set(greedy)) >= 4
    kw = dict(max_new_tokens=12, temperature=0.8, top_k=1, seed=9)
    assert list(plain.generate_stream(PROMPT, **kw)) == greedy
    spec = SpecLookupDecoderLM(params, cfg, max_len=64, spec_k=4,
                               spec_steps=2)
    assert list(spec.generate_stream(PROMPT, **kw)) == greedy
    engine = BatchedDecoderLM(params, cfg, max_len=64, n_slots=2,
                              decode_chunk=4)
    try:
        assert list(engine.generate_stream(PROMPT, **kw)) == greedy
    finally:
        engine.close()
    engine = BatchedDecoderLM(params, cfg, max_len=64, n_slots=2,
                              spec_k=4, spec_steps=2)
    try:
        assert list(engine.generate_stream(PROMPT, **kw)) == greedy
    finally:
        engine.close()


def test_mixed_top_k_slots_no_cross_contamination(tiny):
    """A top_k=1 (greedy-equivalent) and an unrestricted sampled stream
    share the batch; the top_k=1 stream must still equal greedy."""
    cfg, params = tiny
    plain = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=1)
    p1, p2 = PROMPT, [9, 10, 11, 9, 10]
    want1 = list(plain.generate_stream(p1, max_new_tokens=12))
    engine = BatchedDecoderLM(params, cfg, max_len=64, n_slots=2,
                              decode_chunk=4)
    try:
        got = {}
        ts = [threading.Thread(target=lambda: got.__setitem__(
                  1, list(engine.generate_stream(
                      p1, max_new_tokens=12, temperature=0.8, top_k=1)))),
              threading.Thread(target=lambda: got.__setitem__(
                  2, list(engine.generate_stream(
                      p2, max_new_tokens=12, temperature=0.8, top_k=5,
                      seed=4))))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
        assert got[1] == want1
        assert len(got[2]) == 12
        assert all(0 <= t < cfg.vocab_size for t in got[2])
    finally:
        engine.close()


def test_sampled_top_k_deterministic(tiny):
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=4)
    kw = dict(max_new_tokens=10, temperature=0.9, top_k=8, seed=3)
    a = list(lm.generate_stream(PROMPT, **kw))
    b = list(lm.generate_stream(PROMPT, **kw))
    assert a == b and len(a) == 10


def test_min_p_filter_matches_hf_warper():
    torch = pytest.importorskip("torch")
    try:
        from transformers import MinPLogitsWarper
    except ImportError:
        pytest.skip("transformers without MinPLogitsWarper")
    from legalrag_tpu.models.decoder import _min_p_filter

    rng = np.random.default_rng(5)
    logits = rng.standard_normal(50).astype(np.float32) * 2.0
    for mp in (0.05, 0.2, 0.5):
        want = MinPLogitsWarper(mp)(
            torch.tensor([[1]]), torch.tensor(logits[None]))[0]
        keep_w = np.isfinite(want.numpy())
        got = np.asarray(_min_p_filter(jnp.asarray(logits),
                                       jnp.float32(mp)))
        np.testing.assert_array_equal(got > -1e29, keep_w,
                                      err_msg=f"min_p={mp}")


def test_min_p_one_reproduces_greedy_all_engines(tiny):
    """min_p=1.0 keeps only the max-probability token — every engine's
    sampled stream must equal the greedy stream."""
    cfg, params = tiny
    plain = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=4)
    greedy = list(plain.generate_stream(PROMPT, max_new_tokens=12))
    kw = dict(max_new_tokens=12, temperature=0.8, min_p=1.0, seed=11)
    assert list(plain.generate_stream(PROMPT, **kw)) == greedy
    spec = SpecLookupDecoderLM(params, cfg, max_len=64, spec_k=4,
                               spec_steps=2)
    assert list(spec.generate_stream(PROMPT, **kw)) == greedy
    engine = BatchedDecoderLM(params, cfg, max_len=64, n_slots=2,
                              spec_k=4, spec_steps=2)
    try:
        assert list(engine.generate_stream(PROMPT, **kw)) == greedy
    finally:
        engine.close()


def test_min_p_zero_is_identity():
    from legalrag_tpu.models.decoder import _min_p_filter

    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.standard_normal(64), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_min_p_filter(logits, jnp.float32(0.0))),
        np.asarray(logits))
