"""Data-parallel decode serving (parallel/decoder_dp.py): replica
engines behind one least-busy admission front — token parity with a
single engine, both replicas exercised under concurrency, DP×TP
composition on the virtual CPU mesh, client plumbing.

Replaces the reference's docker-compose HTTP replica scale-out
(reference ``docker-compose.yml:1-23``) with in-process device-level
replication."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.batched_decoder import BatchedDecoderLM
from legalrag_tpu.models.decoder import DecoderConfig, JaxDecoderLM
from legalrag_tpu.parallel.decoder_dp import DPDecoderRouter
from legalrag_tpu.parallel.mesh import local_devices


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=128)
    rng = np.random.default_rng(17)

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


PROMPTS = [[5, 6, 7, 5, 6, 7, 5, 6], [12, 41, 3, 3, 3, 3, 9],
           [2, 2], [33, 34, 35, 36, 33, 34]]


def _replica_engines(cfg, params, n, **kw):
    devs = local_devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} CPU devices")
    return [BatchedDecoderLM(jax.device_put(params, devs[i]), cfg,
                             device=devs[i], **kw) for i in range(n)]


def test_dp_router_token_parity_and_balance(tiny):
    cfg, params = tiny
    ref = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    want = {tuple(p): list(ref.generate_stream(p, max_new_tokens=12))
            for p in PROMPTS}
    router = DPDecoderRouter(_replica_engines(cfg, params, 2, max_len=96,
                                              n_slots=2, decode_chunk=4))
    try:
        got, errors = {}, []

        def run(p):
            try:
                got[tuple(p)] = list(
                    router.generate_stream(p, max_new_tokens=12))
            except Exception as e:  # surface in the main thread
                errors.append(e)

        threads = [threading.Thread(target=run, args=(p,)) for p in PROMPTS]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        for p in PROMPTS:
            assert got[tuple(p)] == want[tuple(p)], p
        # least-busy admission: 4 concurrent streams over 2 replicas must
        # have touched both (each replica has 2 slots)
        assert router.active_per_replica == [0, 0]
    finally:
        router.close()


def test_dp_router_sequential_uses_one_then_balances(tiny):
    cfg, params = tiny
    router = DPDecoderRouter(_replica_engines(cfg, params, 2, max_len=96,
                                              n_slots=2, decode_chunk=4))
    try:
        seen = []
        orig = router._acquire

        def spy():
            i = orig()
            seen.append(i)
            return i

        router._acquire = spy
        for p in PROMPTS[:2]:
            list(router.generate_stream(p, max_new_tokens=4))
        # sequential streams: each admission sees an idle pool and takes
        # the first replica (argmin of equal loads)
        assert seen == [0, 0]
    finally:
        router.close()


def test_dp_tp_composition(tiny):
    """2 replicas × 2-way TP over 4 CPU devices: the router builds each
    replica on its own submesh and streams stay token-identical."""
    devs = local_devices()
    if len(devs) < 4:
        pytest.skip("needs 4 CPU devices")
    cfg, params = tiny

    from legalrag_tpu.parallel.decoder_tp import apply_tp_to_engine
    from legalrag_tpu.parallel.mesh import make_mesh

    ref = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    want = list(ref.generate_stream(PROMPTS[0], max_new_tokens=10))

    engines = []
    for r in range(2):
        sub = devs[r * 2:(r + 1) * 2]
        eng = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                               decode_chunk=4)
        apply_tp_to_engine(eng, make_mesh(sub, data=1, model=2))
        engines.append(eng)
    router = DPDecoderRouter(engines)
    try:
        for _ in range(2):  # one per replica via round-robin-ish argmin
            got = list(router.generate_stream(PROMPTS[0],
                                              max_new_tokens=10))
            assert got == want
        # params of the two replicas live on disjoint submeshes
        d0 = engines[0].params["lm_head"].devices()
        d1 = engines[1].params["lm_head"].devices()
        assert d0 and d1 and not (d0 & d1)
    finally:
        router.close()


def test_dp_router_needs_devices(tiny):
    cfg, params = tiny
    with pytest.raises(ValueError):
        DPDecoderRouter([])
    with pytest.raises(ValueError):
        DPDecoderRouter.from_pretrained(BatchedDecoderLM, "x",
                                        replicas=99, tp_shards=4)


def test_client_plumbs_dp_replicas(monkeypatch):
    from legalrag_tpu.config import LLMConfig
    from legalrag_tpu.llm.client import LLMClient
    from legalrag_tpu.models.batched_decoder import BatchedDecoderLM
    from legalrag_tpu.parallel import decoder_dp

    captured = {}

    def fake(engine_cls, name, replicas, tp_shards=0, **kw):
        captured.update(kw, engine_cls=engine_cls, replicas=replicas,
                        tp_shards=tp_shards)
        return object()

    monkeypatch.setattr(decoder_dp.DPDecoderRouter, "from_pretrained",
                        staticmethod(fake))
    c = LLMClient(LLMConfig(provider="local-jax", batch_slots=2,
                            dp_replicas=2, tp_shards=2, weight_quant=True))
    c._load_jax_lm()
    assert captured["replicas"] == 2 and captured["tp_shards"] == 2
    assert captured["engine_cls"] is BatchedDecoderLM
    assert captured["n_slots"] == 2 and captured["weight_quant"] is True
