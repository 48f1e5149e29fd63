"""int8 weight quantization (models/decoder.py quantize_weights_int8 +
W8A8 _qdot): per-channel error bounds, forward fidelity, cross-engine
token-parity under quantization, composition with int8 KV cache, and TP
sharding rules for the quantized leaves. CPU, tiny random config.

The reference serves full-precision HF ``model.generate`` only
(reference ``llm/client.py:306-369``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.batched_decoder import BatchedDecoderLM
from legalrag_tpu.models.decoder import (DecoderConfig, JaxDecoderLM,
                                         _qdot, decoder_forward,
                                         quantize_weights_int8)
from legalrag_tpu.models.spec_decode import SpecLookupDecoderLM


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=128)
    rng = np.random.default_rng(29)

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


# ----------------------------------------------------------- quantization

def test_weight_roundtrip_error_bound(tiny):
    """Dequantized weights are within channel-amax/254 per element, and
    the structure transform preserves everything else."""
    cfg, params = tiny
    qp = quantize_weights_int8(params)
    layer, qlayer = params["layers"][0], qp["layers"][0]
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        w = np.asarray(layer[name]["kernel"], np.float64)
        deq = (np.asarray(qlayer[name]["kernel_q"], np.float64)
               * np.asarray(qlayer[name]["kernel_scale"], np.float64))
        bound = np.abs(w).max(axis=0) / 254.0 + 1e-12
        assert (np.abs(w - deq) <= bound[None, :] + 1e-9).all(), name
        assert "kernel" not in qlayer[name]
    assert (np.asarray(qlayer["q"]["bias"])
            == np.asarray(layer["q"]["bias"])).all()
    assert isinstance(qp["lm_head"], dict)
    assert (np.asarray(qp["embed"]) == np.asarray(params["embed"])).all()


def test_qdot_matches_dense_within_tolerance():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((4, 48)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((48, 32)), jnp.float32)
    from legalrag_tpu.models.decoder import _quant_channel

    q, s = _quant_channel(w)
    got = np.asarray(_qdot(x, {"kernel_q": q, "kernel_scale": s}))
    want = np.asarray(x @ w)
    rel = np.abs(got - want) / (np.abs(want).max() + 1e-9)
    assert rel.max() < 0.02, rel.max()


def test_forward_fidelity(tiny):
    """Quantized logits track the full-precision logits: same top-1 on
    most positions, high cosine similarity everywhere."""
    cfg, params = tiny
    qp = quantize_weights_int8(params)
    ids = jnp.asarray([[5, 6, 7, 5, 6, 7, 12, 41, 3, 9]], jnp.int32)
    pos = jnp.arange(ids.shape[1])[None, :]
    full, _ = decoder_forward(params, cfg, ids, pos)
    quant, _ = decoder_forward(qp, cfg, ids, pos)
    f, q = np.asarray(full[0], np.float64), np.asarray(quant[0], np.float64)
    cos = (f * q).sum(-1) / (np.linalg.norm(f, axis=-1)
                             * np.linalg.norm(q, axis=-1) + 1e-9)
    assert cos.min() > 0.99, cos.min()
    agree = (f.argmax(-1) == q.argmax(-1)).mean()
    assert agree >= 0.8, agree


# -------------------------------------------------------- engine parity

PROMPTS = [[5, 6, 7, 5, 6, 7, 5, 6], [12, 41, 3, 3, 3, 3, 9], [2, 2]]


def test_engines_token_identical_under_quant(tiny):
    """The serving contract under weight_quant: every engine decodes the
    SAME quantized model, so greedy streams stay token-identical across
    plain / speculative / batched engines."""
    cfg, params = tiny
    qp = quantize_weights_int8(params)
    plain = JaxDecoderLM(qp, cfg, max_len=96, decode_chunk=1)
    spec = SpecLookupDecoderLM(qp, cfg, max_len=96, spec_k=4, spec_steps=2)
    eng = BatchedDecoderLM(qp, cfg, max_len=96, n_slots=2, decode_chunk=4)
    try:
        for p in PROMPTS:
            want = list(plain.generate_stream(p, max_new_tokens=14))
            assert list(spec.generate_stream(p, max_new_tokens=14)) == want
            assert list(eng.generate_stream(p, max_new_tokens=14)) == want
    finally:
        eng.close()


def test_quant_composes_with_kv_quant_and_prefix(tiny):
    cfg, params = tiny
    qp = quantize_weights_int8(params)
    a = JaxDecoderLM(qp, cfg, max_len=96, decode_chunk=2, kv_quant=True,
                     prefix_cache=2)
    b = JaxDecoderLM(qp, cfg, max_len=96, decode_chunk=2, kv_quant=True)
    p = [5, 6, 7, 5, 6, 7, 5, 6] * 3
    want = list(b.generate_stream(p, max_new_tokens=10))
    assert list(a.generate_stream(p, max_new_tokens=10)) == want
    assert list(a.generate_stream(p, max_new_tokens=10)) == want  # warm LRU


# ------------------------------------------------------------------- TP

def test_tp_sharding_rules_for_quant_leaves(tiny):
    from jax.sharding import PartitionSpec as P

    from legalrag_tpu.parallel.decoder_tp import _spec_for

    cfg, _ = tiny
    tp = 2
    assert _spec_for("layers.0.q.kernel_q", 2, cfg, tp) == P(None, "model")
    assert _spec_for("layers.0.q.kernel_scale", 1, cfg, tp) == P("model")
    assert _spec_for("layers.0.o.kernel_q", 2, cfg, tp) == P("model", None)
    assert _spec_for("layers.0.o.kernel_scale", 1, cfg, tp) == P()
    assert _spec_for("layers.0.down.kernel_q", 2, cfg, tp) == P("model",
                                                                None)
    assert _spec_for("layers.0.down.kernel_scale", 1, cfg, tp) == P()
    assert _spec_for("lm_head.kernel_q", 2, cfg, tp) == P()  # 97 % 2 != 0
    v64 = DecoderConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64,
                        max_position_embeddings=64)
    assert _spec_for("lm_head.kernel_q", 2, v64, tp) == P(None, "model")
    assert _spec_for("lm_head.kernel_scale", 1, v64, tp) == P("model")


def test_tp_forward_matches_unsharded_quant(tiny):
    """Quantized params shard over the 8-device CPU mesh and the TP
    forward agrees with the single-device quantized forward."""
    from legalrag_tpu.parallel.decoder_tp import shard_decoder_params
    from legalrag_tpu.parallel.mesh import local_devices, make_mesh

    cfg, params = tiny
    qp = quantize_weights_int8(params)
    devs = local_devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = make_mesh(devs[:2], data=1, model=2)
    sp = shard_decoder_params(qp, cfg, mesh)
    ids = jnp.asarray([[5, 6, 7, 5, 6, 7]], jnp.int32)
    pos = jnp.arange(ids.shape[1])[None, :]
    want, _ = decoder_forward(qp, cfg, ids, pos)
    got, _ = decoder_forward(sp, cfg, ids, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


# ------------------------------------------------------------------ MoE

@pytest.fixture(scope="module")
def tiny_moe():
    """Mixtral-style: every layer a 4-expert top-2 sparse MLP."""
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, moe_intermediate_size=32,
                        num_experts=4, num_experts_per_tok=2,
                        max_position_embeddings=128)
    rng = np.random.default_rng(31)

    def mat(i, o, scale=0.3):
        return jnp.asarray(rng.standard_normal((i, o)) * scale, jnp.float32)

    h, d = cfg.hidden_size, cfg.head_dim
    hkv, mi, e = cfg.num_key_value_heads, cfg.moe_intermediate_size, 4
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
             "moe": {"router": mat(h, e),
                     "gate": jnp.stack([mat(h, mi) for _ in range(e)]),
                     "up": jnp.stack([mat(h, mi) for _ in range(e)]),
                     "down": jnp.stack([mat(mi, h) for _ in range(e)])}}
            for _ in range(cfg.num_hidden_layers)
        ],
    }
    return cfg, params


def test_moe_stack_roundtrip_error_bound(tiny_moe):
    cfg, params = tiny_moe
    qm = quantize_weights_int8(params)["layers"][0]["moe"]
    m = params["layers"][0]["moe"]
    for name in ("gate", "up", "down"):
        w = np.asarray(m[name], np.float64)               # [E, I, O]
        deq = (np.asarray(qm[name + "_q"], np.float64)
               * np.asarray(qm[name + "_scale"], np.float64)[:, None, :])
        bound = np.abs(w).max(axis=1) / 254.0 + 1e-12     # [E, O]
        assert (np.abs(w - deq) <= bound[:, None, :] + 1e-9).all(), name
        assert name not in qm
    assert (np.asarray(qm["router"]) == np.asarray(m["router"])).all()


def test_moe_quant_forward_fidelity(tiny_moe):
    cfg, params = tiny_moe
    qp = quantize_weights_int8(params)
    ids = jnp.asarray([[5, 6, 7, 5, 6, 7, 12, 41, 3, 9]], jnp.int32)
    pos = jnp.arange(ids.shape[1])[None, :]
    full, _ = decoder_forward(params, cfg, ids, pos)
    quant, _ = decoder_forward(qp, cfg, ids, pos)
    f, q = np.asarray(full[0], np.float64), np.asarray(quant[0], np.float64)
    cos = (f * q).sum(-1) / (np.linalg.norm(f, axis=-1)
                             * np.linalg.norm(q, axis=-1) + 1e-9)
    assert cos.min() > 0.99, cos.min()


def test_moe_quant_engines_token_identical(tiny_moe):
    cfg, params = tiny_moe
    qp = quantize_weights_int8(params)
    plain = JaxDecoderLM(qp, cfg, max_len=96, decode_chunk=1)
    spec = SpecLookupDecoderLM(qp, cfg, max_len=96, spec_k=4, spec_steps=2)
    eng = BatchedDecoderLM(qp, cfg, max_len=96, n_slots=2, decode_chunk=4)
    try:
        for p in PROMPTS:
            want = list(plain.generate_stream(p, max_new_tokens=12))
            assert list(spec.generate_stream(p, max_new_tokens=12)) == want
            assert list(eng.generate_stream(p, max_new_tokens=12)) == want
    finally:
        eng.close()


def test_moe_quant_shared_expert(tiny_moe):
    """Qwen2-MoE shared expert quantizes to flat *_q leaves and the
    forward stays faithful."""
    cfg, params = tiny_moe
    rng = np.random.default_rng(7)

    def mat(i, o, scale=0.3):
        return jnp.asarray(rng.standard_normal((i, o)) * scale, jnp.float32)

    h = cfg.hidden_size
    params = dict(params)
    params["layers"] = [dict(l) for l in params["layers"]]
    for layer in params["layers"]:
        layer["moe"] = dict(layer["moe"])
        layer["moe"]["shared"] = {"gate": mat(h, 48), "up": mat(h, 48),
                                  "down": mat(48, h)}
        layer["moe"]["shared_gate"] = mat(h, 1)
    qp = quantize_weights_int8(params)
    sh = qp["layers"][0]["moe"]["shared"]
    assert set(sh) == {"gate_q", "gate_scale", "up_q", "up_scale",
                       "down_q", "down_scale"}
    assert isinstance(qp["layers"][0]["moe"]["shared_gate"], jax.Array)
    ids = jnp.asarray([[5, 6, 7, 12, 41, 3]], jnp.int32)
    pos = jnp.arange(ids.shape[1])[None, :]
    full, _ = decoder_forward(params, cfg, ids, pos)
    quant, _ = decoder_forward(qp, cfg, ids, pos)
    f, q = np.asarray(full[0], np.float64), np.asarray(quant[0], np.float64)
    cos = (f * q).sum(-1) / (np.linalg.norm(f, axis=-1)
                             * np.linalg.norm(q, axis=-1) + 1e-9)
    assert cos.min() > 0.99, cos.min()


def test_tp_sharding_rules_for_moe_quant_leaves(tiny_moe):
    from jax.sharding import PartitionSpec as P

    from legalrag_tpu.parallel.decoder_tp import _spec_for

    cfg, _ = tiny_moe
    tp = 2                                   # 4 experts % 2 == 0
    assert _spec_for("layers.0.moe.gate_q", 3, cfg, tp) == \
        P("model", None, None)
    assert _spec_for("layers.0.moe.down_q", 3, cfg, tp) == \
        P("model", None, None)
    assert _spec_for("layers.0.moe.gate_scale", 2, cfg, tp) == \
        P("model", None)
    assert _spec_for("layers.0.moe.down_scale", 2, cfg, tp) == \
        P("model", None)
    # shared-expert quant leaves replicate (intermediate differs)
    assert _spec_for("layers.0.moe.shared.gate_q", 2, cfg, tp) == P()
    assert _spec_for("layers.0.moe.shared.gate_scale", 1, cfg, tp) == P()
    assert _spec_for("layers.0.moe.router", 2, cfg, tp) == P()


def test_tp_forward_matches_unsharded_moe_quant(tiny_moe):
    from legalrag_tpu.parallel.decoder_tp import shard_decoder_params
    from legalrag_tpu.parallel.mesh import local_devices, make_mesh

    cfg, params = tiny_moe
    qp = quantize_weights_int8(params)
    devs = local_devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = make_mesh(devs[:2], data=1, model=2)
    sp = shard_decoder_params(qp, cfg, mesh)
    assert not sp["layers"][0]["moe"]["gate_q"].sharding.is_fully_replicated
    ids = jnp.asarray([[5, 6, 7, 5, 6, 7]], jnp.int32)
    pos = jnp.arange(ids.shape[1])[None, :]
    want, _ = decoder_forward(qp, cfg, ids, pos)
    got, _ = decoder_forward(sp, cfg, ids, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


# ----------------------------------------------------------------- int4

def test_int4_roundtrip_error_bound(tiny):
    """Grouped int4: error ≤ group-amax/14 per element; the PYTREE holds
    the nibble-packed int8 carrier (transfer-safe — the relay backend
    cannot device_put s4) and every program unpacks to XLA-native int4
    on entry (decoder.unpack_weights4)."""
    from legalrag_tpu.models.decoder import quantize_weights, \
        unpack_weights4

    cfg, params = tiny
    qp = quantize_weights(params, bits=4, group=16)
    layer = params["layers"][0]
    packed = qp["layers"][0]
    qlayer = unpack_weights4(qp)["layers"][0]
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        w = np.asarray(layer[name]["kernel"], np.float64)   # [I, O]
        pn = packed[name]
        assert pn["kernel_q4p"].dtype == jnp.int8, name
        assert pn["kernel_q4p"].shape == (w.shape[0] // 2, w.shape[1])
        qn = qlayer[name]
        assert qn["kernel_q"].dtype == jnp.int4, name
        i = w.shape[0]
        g = 16 if i % 16 == 0 else i
        scale = np.asarray(qn["kernel_scale"], np.float64)  # [I/g, O]
        assert scale.shape == (i // g, w.shape[1]), name
        deq = (np.asarray(qn["kernel_q"], np.float64).reshape(i // g, g, -1)
               * scale[:, None, :]).reshape(w.shape)
        wg = np.abs(w).reshape(i // g, g, -1).max(axis=1)
        bound = wg / 14.0 + 1e-12
        err = np.abs(w - deq).reshape(i // g, g, -1).max(axis=1)
        assert (err <= bound + 1e-9).all(), name


def test_qdot4_matches_dense_within_tolerance():
    from legalrag_tpu.models.decoder import (_qdot2, _quant_group4,
                                             _unpack_nibbles4)

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((4, 48)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((48, 32)), jnp.float32)
    q, s = _quant_group4(w, 16)
    assert q.dtype == jnp.int8 and q.shape == (24, 32)  # packed carrier
    q4 = _unpack_nibbles4(q)
    assert q4.dtype == jnp.int4 and s.shape == (3, 32)
    got = np.asarray(_qdot2(x, q4, s))
    want = np.asarray(x @ w)
    rel = np.abs(got - want) / (np.abs(want).max() + 1e-9)
    assert rel.max() < 0.12, rel.max()  # int4: error ≤ group-amax/14


def test_int4_forward_fidelity(tiny):
    """The int4 fast path equals the mathematically-dequantized dense
    model up to int8 ACTIVATION quantization (the only other error
    source); fidelity vs the full-precision model is sanity-checked
    loosely — an N(0,1)-random tiny model is the quantizer's worst case
    (real checkpoints have far lower per-group kurtosis)."""
    from legalrag_tpu.models.decoder import quantize_weights, \
        unpack_weights4

    cfg, params = tiny
    qp = unpack_weights4(quantize_weights(params, bits=4, group=16))

    def deq_node(qn):
        q = np.asarray(qn["kernel_q"], np.float64)
        s = np.asarray(qn["kernel_scale"], np.float64)
        i = q.shape[0]
        g = i // s.shape[0]
        w = (q.reshape(i // g, g, -1) * s[:, None, :]).reshape(q.shape)
        out = {k: v for k, v in qn.items()
               if k not in ("kernel_q", "kernel_scale")}
        out["kernel"] = jnp.asarray(w, jnp.float32)
        return out

    dq = dict(qp)
    dq["layers"] = [{k: (deq_node(v) if isinstance(v, dict)
                         and "kernel_q" in v else v)
                     for k, v in layer.items()} for layer in qp["layers"]]
    dq["lm_head"] = deq_node(qp["lm_head"])["kernel"]
    ids = jnp.asarray([[5, 6, 7, 5, 6, 7, 12, 41, 3, 9]], jnp.int32)
    pos = jnp.arange(ids.shape[1])[None, :]
    full, _ = decoder_forward(params, cfg, ids, pos)
    deq, _ = decoder_forward(dq, cfg, ids, pos)
    quant, _ = decoder_forward(qp, cfg, ids, pos)

    def cosines(a, b):
        a = np.asarray(a[0], np.float64)
        b = np.asarray(b[0], np.float64)
        return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                                  * np.linalg.norm(b, axis=-1) + 1e-9)

    impl = cosines(quant, deq)          # implementation vs the math
    assert impl.min() > 0.995, impl.min()
    sanity = cosines(quant, full)       # quantization loss itself
    assert sanity.mean() > 0.9, sanity.mean()


def test_int4_engines_token_identical(tiny):
    from legalrag_tpu.models.decoder import quantize_weights

    cfg, params = tiny
    qp = quantize_weights(params, bits=4, group=16)
    plain = JaxDecoderLM(qp, cfg, max_len=96, decode_chunk=1)
    spec = SpecLookupDecoderLM(qp, cfg, max_len=96, spec_k=4, spec_steps=2)
    eng = BatchedDecoderLM(qp, cfg, max_len=96, n_slots=2, decode_chunk=4)
    try:
        for p in PROMPTS:
            want = list(plain.generate_stream(p, max_new_tokens=12))
            assert list(spec.generate_stream(p, max_new_tokens=12)) == want
            assert list(eng.generate_stream(p, max_new_tokens=12)) == want
    finally:
        eng.close()


def test_int4_moe_stacks_int4(tiny_moe):
    """bits=4 quantizes MoE expert stacks to grouped int4 (per-(expert,
    group, channel) scales) and the forward stays faithful."""
    from legalrag_tpu.models.decoder import quantize_weights, \
        unpack_weights4

    cfg, params = tiny_moe
    g = 16
    packed = quantize_weights(params, bits=4, group=g)
    pmoe = packed["layers"][0]["moe"]
    qp = unpack_weights4(packed)
    moe = qp["layers"][0]["moe"]
    m = params["layers"][0]["moe"]
    assert packed["layers"][0]["q"]["kernel_q4p"].dtype == jnp.int8
    assert qp["layers"][0]["q"]["kernel_q"].dtype == jnp.int4
    e = cfg.num_experts
    for name in ("gate", "up", "down"):
        w = m[name]                                         # [E, I, O]
        assert pmoe[name + "_q4p"].dtype == jnp.int8
        assert pmoe[name + "_q4p"].shape == (w.shape[0], w.shape[1] // 2,
                                             w.shape[2])
        assert moe[name + "_q"].dtype == jnp.int4
        assert moe[name + "_q"].shape == w.shape
        assert moe[name + "_scale"].shape == (e, w.shape[1] // g,
                                              w.shape[2])
        # grouped symmetric dequant error bound: group-amax/14
        wf = np.asarray(w, np.float64).reshape(e, -1, g, w.shape[2])
        deq = (np.asarray(moe[name + "_q"], np.float64)
               .reshape(e, -1, g, w.shape[2])
               * np.asarray(moe[name + "_scale"], np.float64)[:, :, None])
        bound = np.abs(wf).max(axis=2, keepdims=True) / 14.0 + 1e-12
        assert (np.abs(wf - deq) <= bound + 1e-9).all(), name
        assert name not in moe
    # implementation check: the stacked int4 fast path must equal the
    # mathematically-dequantized dense-float MoE up to int8 ACTIVATION
    # quantization (same contract as test_int4_forward_fidelity)
    def deq_stack(name):
        q = np.asarray(moe[name + "_q"], np.float64)        # [E, I, O]
        s = np.asarray(moe[name + "_scale"], np.float64)    # [E, I/g, O]
        w = (q.reshape(e, -1, g, q.shape[2]) * s[:, :, None]
             ).reshape(q.shape)
        return jnp.asarray(w, jnp.float32)

    dq = dict(qp)
    dq["layers"] = [dict(layer) for layer in qp["layers"]]
    dmoe = {k: v for k, v in moe.items()
            if not (k.endswith("_q") or k.endswith("_scale"))}
    for name in ("gate", "up", "down"):
        dmoe[name] = deq_stack(name)
    dq["layers"][0]["moe"] = dmoe
    ids = jnp.asarray([[5, 6, 7, 5, 6, 7, 12, 41, 3, 9]], jnp.int32)
    pos = jnp.arange(ids.shape[1])[None, :]
    full, _ = decoder_forward(params, cfg, ids, pos)
    deqo, _ = decoder_forward(dq, cfg, ids, pos)
    quant, _ = decoder_forward(qp, cfg, ids, pos)

    def cosines(a, b):
        a = np.asarray(a[0], np.float64)
        b = np.asarray(b[0], np.float64)
        return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                                  * np.linalg.norm(b, axis=-1) + 1e-9)

    impl = cosines(quant, deqo)         # implementation vs the math
    assert impl.min() > 0.995, impl.min()
    sanity = cosines(quant, full)       # int4 loss on N(0,1) weights:
    assert sanity.mean() > 0.85, sanity.mean()  # worst-case, loose


def test_int4_tp_rules_and_forward(tiny):
    from jax.sharding import PartitionSpec as P

    from legalrag_tpu.models.decoder import quantize_weights, \
        unpack_weights4
    from legalrag_tpu.parallel.decoder_tp import (_spec_for,
                                                  shard_decoder_params)
    from legalrag_tpu.parallel.mesh import local_devices, make_mesh

    cfg, params = tiny
    tp = 2
    # grouped (ndim-2) scales: channel axis follows column-parallel,
    # group axis follows row-parallel
    assert _spec_for("layers.0.q.kernel_scale", 2, cfg, tp) == \
        P(None, "model")
    assert _spec_for("layers.0.o.kernel_scale", 2, cfg, tp) == \
        P("model", None)
    assert _spec_for("layers.0.down.kernel_scale", 2, cfg, tp) == \
        P("model", None)
    # the packed carrier shards exactly like the kernel it unpacks to
    assert _spec_for("layers.0.q.kernel_q4p", 2, cfg, tp) == \
        P(None, "model")
    assert _spec_for("layers.0.o.kernel_q4p", 2, cfg, tp) == \
        P("model", None)
    devs = local_devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    qp = quantize_weights(params, bits=4, group=16)
    mesh = make_mesh(devs[:2], data=1, model=2)
    sp = shard_decoder_params(qp, cfg, mesh)
    ids = jnp.asarray([[5, 6, 7, 5, 6, 7]], jnp.int32)
    pos = jnp.arange(ids.shape[1])[None, :]
    want, _ = decoder_forward(unpack_weights4(qp), cfg, ids, pos)
    got, _ = decoder_forward(unpack_weights4(sp), cfg, ids, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_client_plumbs_weight_quant_bits(monkeypatch):
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
                            weight_quant=True, weight_bits=4))
    c._load_jax_lm()
    assert captured["weight_quant"] is True and captured["weight_bits"] == 4
    c = LLMClient(LLMConfig(provider="local-jax", weight_quant=True))
    c._load_jax_lm()
    assert captured["weight_quant"] is True and captured["weight_bits"] == 8


def test_int4_pack_roundtrip_and_transfer_safe_pytree(tiny):
    """bits=4 pytrees must hold NO s4 leaves: the axon relay cannot
    device_put an S4 jit argument (round-4 RecursionError), so the
    carrier is nibble-packed int8 and unpack happens in-program. The
    unpack must be the exact inverse of packing."""
    import jax

    from legalrag_tpu.models.decoder import (_pack_nibbles,
                                             _unpack_nibbles4,
                                             quantize_weights)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-8, 8, (3, 10, 6)), jnp.int32)
    assert (np.asarray(_unpack_nibbles4(_pack_nibbles(q)), np.int32)
            == np.asarray(q)).all()
    cfg, params = tiny
    qp = quantize_weights(params, bits=4, group=16)
    assert all(leaf.dtype != jnp.int4
               for leaf in jax.tree_util.tree_leaves(qp))
