"""Automatic prefix caching: a prompt sharing a token prefix with a
recent one prefills only its suffix, with output token-identical to a
cold engine — tiny random-init config."""

import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.decoder import DecoderConfig, JaxDecoderLM
from legalrag_tpu.models.spec_decode import SpecLookupDecoderLM


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=128)
    rng = np.random.default_rng(31)

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


SYSTEM = list(range(40, 64)) + list(range(1, 9))  # 32-token shared "system"


def test_shared_prefix_hit_identical(tiny):
    cfg, params = tiny
    cold = JaxDecoderLM(params, cfg, max_len=96)
    warm = JaxDecoderLM(params, cfg, max_len=96, prefix_cache=4)
    qa = SYSTEM + [70, 71, 72]
    qb = SYSTEM + [80, 81, 82, 83, 84]
    want_a = list(cold.generate_stream(qa, max_new_tokens=10))
    want_b = list(cold.generate_stream(qb, max_new_tokens=10))
    assert list(warm.generate_stream(qa, max_new_tokens=10)) == want_a
    assert warm.prefix_stats == {"hits": 0, "misses": 1,
                                 "saved_tokens": 0}
    assert list(warm.generate_stream(qb, max_new_tokens=10)) == want_b
    assert warm.prefix_stats["hits"] == 1
    assert warm.prefix_stats["saved_tokens"] >= 32
    # full re-ask: everything but the forced last suffix token reused
    assert list(warm.generate_stream(qa, max_new_tokens=10)) == want_a
    assert warm.prefix_stats["hits"] == 2


def test_short_prefix_misses(tiny):
    cfg, params = tiny
    warm = JaxDecoderLM(params, cfg, max_len=96, prefix_cache=4)
    list(warm.generate_stream([1, 2, 3, 4, 5], max_new_tokens=4))
    list(warm.generate_stream([1, 2, 3, 4, 9], max_new_tokens=4))
    assert warm.prefix_stats["hits"] == 0  # LCP 4 < threshold 16


def test_lru_eviction(tiny):
    cfg, params = tiny
    warm = JaxDecoderLM(params, cfg, max_len=96, prefix_cache=1)
    qa = SYSTEM + [70]
    qb = list(range(2, 36)) + [71]  # disjoint prefix
    list(warm.generate_stream(qa, max_new_tokens=3))
    list(warm.generate_stream(qb, max_new_tokens=3))  # evicts qa's entry
    list(warm.generate_stream(qa, max_new_tokens=3))
    assert warm.prefix_stats["hits"] == 0
    assert warm.prefix_stats["misses"] == 3


def test_spec_engine_with_prefix_cache(tiny):
    cfg, params = tiny
    cold = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    warm = SpecLookupDecoderLM(params, cfg, max_len=96, spec_k=4,
                               spec_steps=2, prefix_cache=4)
    qa = SYSTEM + [70, 71, 72]
    qb = SYSTEM + [88, 89]
    want_b = list(cold.generate_stream(qb, max_new_tokens=12))
    list(warm.generate_stream(qa, max_new_tokens=12))
    got_b = list(warm.generate_stream(qb, max_new_tokens=12))
    assert got_b == want_b
    assert warm.prefix_stats["hits"] == 1


def test_sampled_with_prefix_cache_deterministic(tiny):
    cfg, params = tiny
    warm = JaxDecoderLM(params, cfg, max_len=96, prefix_cache=4)
    cold = JaxDecoderLM(params, cfg, max_len=96)
    q = SYSTEM + [77, 78]
    kw = dict(max_new_tokens=8, temperature=0.7, seed=11)
    want = list(cold.generate_stream(q, **kw))
    list(warm.generate_stream(SYSTEM + [60], max_new_tokens=2))  # seed cache
    assert list(warm.generate_stream(q, **kw)) == want
    assert warm.prefix_stats["hits"] >= 1


def test_batched_engine_prefix_cache(tiny):
    """Continuous batching with prefix reuse at admission: warm == cold,
    across both plain and speculative modes."""
    import threading

    from legalrag_tpu.models.batched_decoder import BatchedDecoderLM

    cfg, params = tiny
    cold = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    prompts = [SYSTEM + [70, 71, 72], SYSTEM + [80, 81],
               SYSTEM + [90, 91, 92, 93]]
    want = {tuple(p): list(cold.generate_stream(p, max_new_tokens=10))
            for p in prompts}
    for spec_k in (0, 4):
        engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                                  decode_chunk=4, spec_k=spec_k,
                                  spec_steps=2, prefix_cache=4)
        try:
            got = {}

            def go(p):
                got[tuple(p)] = list(engine.generate_stream(
                    p, max_new_tokens=10))

            ts = [threading.Thread(target=go, args=(p,)) for p in prompts]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout=180)
            for p in prompts:
                assert got[tuple(p)] == want[tuple(p)], (spec_k, p)
            assert engine._prefix.stats["hits"] >= 1, spec_k
        finally:
            engine.close()


def test_store_dedups_nested_prefix_entries(tiny):
    """Prefix-nested entries collapse into one LRU slot: re-serving the
    same prompt refreshes instead of duplicating, an extension replaces
    its own prefix entry, and a covered (shorter) prompt never evicts the
    longer entry that subsumes it — lossless for match()."""
    cfg, params = tiny
    warm = JaxDecoderLM(params, cfg, max_len=96, prefix_cache=4)
    qa = SYSTEM + [70, 71, 72]
    list(warm.generate_stream(qa, max_new_tokens=2))
    list(warm.generate_stream(qa, max_new_tokens=2))        # refresh
    assert len(warm._prefix.entries) == 1
    qa_ext = qa + [73, 74]
    list(warm.generate_stream(qa_ext, max_new_tokens=2))    # replaces qa
    assert len(warm._prefix.entries) == 1
    assert warm._prefix.entries[0][0] == qa_ext
    list(warm.generate_stream(qa, max_new_tokens=2))        # covered: hit,
    assert len(warm._prefix.entries) == 1                   # no new entry
    assert warm._prefix.entries[0][0] == qa_ext
    # correctness after all the dedup churn
    cold = JaxDecoderLM(params, cfg, max_len=96)
    probe = SYSTEM + [90, 91]
    assert list(warm.generate_stream(probe, max_new_tokens=8)) == \
        list(cold.generate_stream(probe, max_new_tokens=8))
