"""Tensor-parallel decoder: generation with TP-sharded params must be
token-identical to single-device generation — 8 virtual CPU devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.decoder import DecoderConfig, JaxDecoderLM
from legalrag_tpu.parallel.decoder_tp import (shard_decoder_params,
                                              tp_kv_cache_sharding)
from legalrag_tpu.parallel.mesh import MODEL_AXIS, make_mesh


def _tiny_params(cfg, seed=0, moe=False):
    rng = np.random.default_rng(seed)

    def mat(i, o, scale=0.05):
        return jnp.asarray(rng.standard_normal((i, o)) * scale, jnp.float32)

    h, ff, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    embed = mat(cfg.vocab_size, h, 0.1)

    def mlp():
        if moe:
            mi = cfg.moe_intermediate_size
            e = cfg.num_experts
            return {"moe": {
                "router": mat(h, e),
                "gate": jnp.stack([mat(h, mi) for _ in range(e)]),
                "up": jnp.stack([mat(h, mi) for _ in range(e)]),
                "down": jnp.stack([mat(mi, h) for _ in range(e)]),
            }}
        return {"gate": {"kernel": mat(h, ff)},
                "up": {"kernel": mat(h, ff)},
                "down": {"kernel": mat(ff, h)}}

    return {
        "embed": embed, "lm_head": embed.T,
        "final_norm": jnp.ones(h, jnp.float32),
        "layers": [
            {"input_norm": jnp.ones(h, jnp.float32),
             "q": {"kernel": mat(h, hq * d), "bias": jnp.zeros(hq * d)},
             "k": {"kernel": mat(h, hkv * d), "bias": jnp.zeros(hkv * d)},
             "v": {"kernel": mat(h, hkv * d), "bias": jnp.zeros(hkv * d)},
             "o": {"kernel": mat(hq * d, h)},
             "post_norm": jnp.ones(h, jnp.float32),
             **mlp()}
            for _ in range(cfg.num_hidden_layers)
        ],
    }


@pytest.fixture(scope="module")
def cpu8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return devs[:8]


def test_tp_generation_matches_single_device(cpu8):
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=64)
    params = _tiny_params(cfg, seed=2)
    want = list(JaxDecoderLM(params, cfg, max_len=48)
                .generate_stream([5, 6, 7, 5, 6], max_new_tokens=10))

    mesh = make_mesh(cpu8[:4], data=1, model=4)
    sharded = shard_decoder_params(params, cfg, mesh)
    # q/o/gate/up/down sharded 4-way; kv 16%4==0 sharded; vocab 97 -> lm
    # head replicated (fallback path)
    q = sharded["layers"][0]["q"]["kernel"]
    assert not q.sharding.is_fully_replicated
    assert sharded["lm_head"].sharding.is_fully_replicated
    got = list(JaxDecoderLM(sharded, cfg, max_len=48)
               .generate_stream([5, 6, 7, 5, 6], max_new_tokens=10))
    assert got == want


def test_tp_moe_expert_parallel_matches(cpu8):
    cfg = DecoderConfig(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=4,
                        intermediate_size=64, max_position_embeddings=64,
                        model_type="mixtral", num_local_experts=4,
                        num_experts_per_tok=2, moe_intermediate_size=32)
    params = _tiny_params(cfg, seed=3, moe=True)
    prompt = [9, 10, 11, 12]
    want = list(JaxDecoderLM(params, cfg, max_len=32)
                .generate_stream(prompt, max_new_tokens=8))

    mesh = make_mesh(cpu8[:2], data=1, model=2)
    sharded = shard_decoder_params(params, cfg, mesh)
    moe = sharded["layers"][0]["moe"]
    assert not moe["gate"].sharding.is_fully_replicated   # EP
    assert not sharded["lm_head"].sharding.is_fully_replicated  # 96 % 2
    got = list(JaxDecoderLM(sharded, cfg, max_len=32)
               .generate_stream(prompt, max_new_tokens=8))
    assert got == want


def test_tp_indivisible_heads_replicate(cpu8):
    """3 kv-heads on a 2-way mesh: k/v fall back to replication, q still
    shards; generation stays correct."""
    cfg = DecoderConfig(vocab_size=97, hidden_size=48, num_hidden_layers=1,
                        num_attention_heads=6, num_key_value_heads=3,
                        intermediate_size=64, max_position_embeddings=64)
    params = _tiny_params(cfg, seed=4)
    want = list(JaxDecoderLM(params, cfg, max_len=32)
                .generate_stream([1, 2, 3], max_new_tokens=6))
    mesh = make_mesh(cpu8[:2], data=1, model=2)
    sharded = shard_decoder_params(params, cfg, mesh)
    assert sharded["layers"][0]["k"]["kernel"].sharding.is_fully_replicated
    assert not sharded["layers"][0]["q"]["kernel"].sharding \
        .is_fully_replicated
    assert tp_kv_cache_sharding(cfg, mesh) is None
    got = list(JaxDecoderLM(sharded, cfg, max_len=32)
               .generate_stream([1, 2, 3], max_new_tokens=6))
    assert got == want


def test_tp_spec_decode_matches(cpu8):
    """Speculative decoding on TP-sharded params."""
    from legalrag_tpu.models.spec_decode import SpecLookupDecoderLM

    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=64)
    params = _tiny_params(cfg, seed=5)
    p = [7, 8, 9, 7, 8, 9, 7]
    want = list(JaxDecoderLM(params, cfg, max_len=48)
                .generate_stream(p, max_new_tokens=10))
    mesh = make_mesh(cpu8[:4], data=1, model=4)
    sharded = shard_decoder_params(params, cfg, mesh)
    got = list(SpecLookupDecoderLM(sharded, cfg, max_len=48, spec_k=4)
               .generate_stream(p, max_new_tokens=10))
    assert got == want


def test_tp_batched_engine_matches(cpu8):
    """Continuous batching on TP-sharded params — the engines are
    sharding-agnostic, so the batched decode loop must run tensor-parallel
    unchanged."""
    import threading

    from legalrag_tpu.models.batched_decoder import BatchedDecoderLM

    cfg = DecoderConfig(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=64)
    params = _tiny_params(cfg, seed=6)
    prompts = [[5, 6, 7, 5, 6], [9, 10, 11]]
    want = {tuple(p): list(JaxDecoderLM(params, cfg, max_len=48)
                           .generate_stream(p, max_new_tokens=8))
            for p in prompts}
    mesh = make_mesh(cpu8[:2], data=1, model=2)
    sharded = shard_decoder_params(params, cfg, mesh)
    engine = BatchedDecoderLM(sharded, cfg, max_len=48, n_slots=2,
                              decode_chunk=4, spec_k=4, spec_steps=2)
    try:
        got = {}

        def go(p):
            got[tuple(p)] = list(engine.generate_stream(p,
                                                        max_new_tokens=8))

        ts = [threading.Thread(target=go, args=(p,)) for p in prompts]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        assert got == want
    finally:
        engine.close()


def test_apply_tp_to_engine_places_batched_cache(cpu8):
    """apply_tp_to_engine shards params AND places the batched engine's
    persistent slot cache kv-head-parallel; streams stay token-identical
    to the unsharded engine (dense and int8-quantized caches)."""
    from legalrag_tpu.models.batched_decoder import BatchedDecoderLM
    from legalrag_tpu.parallel.decoder_tp import apply_tp_to_engine

    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=64)
    params = _tiny_params(cfg, seed=2)
    prompt = [5, 6, 7, 5, 6]
    want = list(JaxDecoderLM(params, cfg, max_len=48)
                .generate_stream(prompt, max_new_tokens=10))
    mesh = make_mesh(cpu8[:2], data=1, model=2)
    for kv_quant in (False, True):
        engine = BatchedDecoderLM(params, cfg, max_len=48, n_slots=2,
                                  decode_chunk=4, kv_quant=kv_quant)
        try:
            apply_tp_to_engine(engine, mesh)
            assert not engine.params["layers"][0]["q"]["kernel"] \
                .sharding.is_fully_replicated
            for a in engine._cache[0]:
                assert not a.sharding.is_fully_replicated, a.shape
            got = list(engine.generate_stream(prompt, max_new_tokens=10))
        finally:
            engine.close()
        assert got == want, f"kv_quant={kv_quant}"


def test_apply_tp_to_engine_single_stream_noop_cache(cpu8):
    """Single-stream engines have no persistent cache; apply_tp_to_engine
    still shards params and generation stays exact."""
    from legalrag_tpu.parallel.decoder_tp import apply_tp_to_engine

    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=64)
    params = _tiny_params(cfg, seed=5)
    prompt = [3, 4, 5]
    want = list(JaxDecoderLM(params, cfg, max_len=32)
                .generate_stream(prompt, max_new_tokens=6))
    lm = JaxDecoderLM(params, cfg, max_len=32)
    apply_tp_to_engine(lm, make_mesh(cpu8[:2], data=1, model=2))
    got = list(lm.generate_stream(prompt, max_new_tokens=6))
    assert got == want


def test_apply_tp_to_engine_places_paged_pools(cpu8):
    """apply_tp_to_engine places the paged engine's block POOLS
    kv-head-parallel ([NB, BS, Hkv, *] per layer); radix-reused and
    freshly prefilled streams stay token-identical to the unsharded
    single-stream engine (dense and int8-quantized pools)."""
    from legalrag_tpu.models.paged_decoder import PagedDecoderLM
    from legalrag_tpu.parallel.decoder_tp import apply_tp_to_engine

    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=64)
    params = _tiny_params(cfg, seed=3)
    rng = np.random.default_rng(23)
    shared = list(rng.integers(1, 90, 8))
    a = shared + list(rng.integers(1, 90, 4))
    b = shared + list(rng.integers(1, 90, 5))
    mesh = make_mesh(cpu8[:2], data=1, model=2)
    for kv_quant in (False, True):
        ref = JaxDecoderLM(params, cfg, max_len=48, kv_quant=kv_quant)
        want_a = list(ref.generate_stream(a, max_new_tokens=8))
        want_b = list(ref.generate_stream(b, max_new_tokens=8))
        engine = PagedDecoderLM(params, cfg, max_len=48, n_slots=2,
                                decode_chunk=4, block_size=8,
                                kv_quant=kv_quant)
        try:
            apply_tp_to_engine(engine, mesh)
            for arr in engine._pools[0]:
                assert not arr.sharding.is_fully_replicated, arr.shape
            got_a = list(engine.generate_stream(a, max_new_tokens=8))
            s = engine.paged_stats()
            got_b = list(engine.generate_stream(b, max_new_tokens=8))
            # stream B attached A's published full prefix block by
            # reference — reuse survives the sharded pool
            assert engine.paged_stats()["reused_blocks"] \
                > s["reused_blocks"]
        finally:
            engine.close()
        assert got_a == want_a, f"kv_quant={kv_quant}"
        assert got_b == want_b, f"kv_quant={kv_quant}"
