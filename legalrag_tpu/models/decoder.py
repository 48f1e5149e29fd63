"""Causal decoder LM in JAX — the TPU-native generation backend.

Implements the Qwen2/Llama architecture family (RMSNorm, rotary position
embeddings, grouped-query attention, SwiGLU MLP, tied or untied LM head)
plus the Qwen3/Gemma-2/Gemma-3/Mistral deltas and mixture-of-experts
variants (Mixtral ``block_sparse_moe``, Qwen2-MoE routed + shared
experts — see :func:`_moe_block`), with HF safetensors loading, so
``LLMConfig.provider = "local-jax"`` serves answer generation on the
same chip as retrieval. Decoding is a jitted
step with a preallocated KV cache (static shapes, absolute positions,
capacity ``max_len``; generation stops at capacity), greedy or
temperature/top-p sampling, and a streaming generator for the SSE path.

Weights must exist locally (zero-egress images use the openai/disabled
providers); the module itself is validated with tiny random-init configs:
causality (future tokens cannot influence earlier logits), cache-vs-full
equivalence, and determinism.
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from legalrag_tpu.models.constrain import budget_force
from legalrag_tpu.utils import get_logger
from legalrag_tpu.utils.device import on_device

log = get_logger("models.decoder")


class DecoderConfig:
    def __init__(self, vocab_size=151936, hidden_size=896,
                 num_hidden_layers=24, num_attention_heads=14,
                 num_key_value_heads=2, intermediate_size=4864,
                 max_position_embeddings=32768, rms_norm_eps=1e-6,
                 rope_theta=1000000.0, tie_word_embeddings=True,
                 head_dim=None, rope_scaling=None, model_type="",
                 hidden_activation=None, query_pre_attn_scalar=None,
                 attn_logit_softcapping=None, final_logit_softcapping=None,
                 sliding_window=None, layer_types=None,
                 rope_local_base_freq=None, sliding_window_pattern=None,
                 num_local_experts=None, num_experts=None,
                 num_experts_per_tok=None, norm_topk_prob=None,
                 moe_intermediate_size=None,
                 shared_expert_intermediate_size=None,
                 decoder_sparse_step=None, mlp_only_layers=None,
                 **_ignored):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_key_value_heads
        self.intermediate_size = intermediate_size
        self.max_position_embeddings = max_position_embeddings
        self.rms_norm_eps = rms_norm_eps
        self.rope_theta = rope_theta
        self.tie_word_embeddings = tie_word_embeddings
        # Qwen3/Gemma-class configs carry an explicit head_dim that differs
        # from hidden/heads; honor it (ADVICE r1).
        self.head_dim = head_dim or hidden_size // num_attention_heads
        self.rope_scaling = rope_scaling
        rtype = (rope_scaling or {}).get("rope_type") \
            or (rope_scaling or {}).get("type")
        if rtype not in (None, "default", "linear", "llama3", "yarn"):
            raise ValueError(
                f"rope_scaling type {rtype!r} (dynamic/longrope/…) is not "
                "implemented — refusing to load rather than decode with "
                "wrong positions")
        # Gemma-family deltas (model_type "gemma"/"gemma2"/"gemma3"):
        # (1+w) RMSNorm, sqrt(H)-scaled embeddings, GeGLU, sandwich norms,
        # logit softcaps (gemma2), per-layer sliding-window attention,
        # query_pre_attn_scalar scale; gemma3 adds (1+w) q/k norms and a
        # separate UNSCALED local RoPE base on sliding layers
        self.model_type = model_type or ""
        self.gemma = self.model_type.startswith("gemma")
        self.gemma3 = self.model_type.startswith("gemma3")
        self.rope_local_base_freq = rope_local_base_freq or 10000.0
        self.hidden_activation = hidden_activation or (
            "gelu_pytorch_tanh" if self.gemma else "silu")
        self.query_pre_attn_scalar = query_pre_attn_scalar
        self.attn_logit_softcapping = attn_logit_softcapping
        self.final_logit_softcapping = final_logit_softcapping
        self.sliding_window = sliding_window
        if layer_types is None and self.gemma3 and sliding_window:
            # gemma3: every Nth layer is full attention (HF
            # Gemma3TextConfig.sliding_window_pattern, default 6)
            pat = sliding_window_pattern or 6
            layer_types = ["full_attention" if (i + 1) % pat == 0 else
                           "sliding_attention"
                           for i in range(num_hidden_layers)]
        elif layer_types is None and self.gemma and sliding_window:
            # real gemma-2 hub configs predate the layer_types key; HF
            # computes the alternating pattern in Gemma2Config.__init__
            layer_types = ["sliding_attention" if (i + 1) % 2 else
                           "full_attention"
                           for i in range(num_hidden_layers)]
        elif (layer_types is None and sliding_window
              and self.model_type in ("mistral", "mixtral")):
            # Mistral/Mixtral v0.1-class: EVERY layer attends in the band
            layer_types = ["sliding_attention"] * num_hidden_layers
        self.layer_types = layer_types
        # Mixture-of-experts (Mixtral `num_local_experts` /
        # Qwen2-MoE `num_experts` naming unified on `num_experts`):
        self.num_experts = num_local_experts or num_experts or 0
        self.num_experts_per_tok = num_experts_per_tok or 2
        # Mixtral ALWAYS renormalizes the top-k routing weights; Qwen2-MoE
        # gates it on `norm_topk_prob` (False for Qwen1.5-MoE-A2.7B)
        if norm_topk_prob is None:
            norm_topk_prob = self.model_type == "mixtral"
        self.norm_topk_prob = bool(norm_topk_prob)
        self.moe_intermediate_size = moe_intermediate_size
        self.shared_expert_intermediate_size = shared_expert_intermediate_size
        # Qwen2-MoE: every `decoder_sparse_step`-th layer is sparse, and
        # layers listed in `mlp_only_layers` stay dense regardless
        self.decoder_sparse_step = decoder_sparse_step or 1
        self.mlp_only_layers = list(mlp_only_layers or [])

    def layer_is_moe(self, li: int) -> bool:
        if not self.num_experts:
            return False
        if li in self.mlp_only_layers:
            return False
        step = self.decoder_sparse_step
        return step > 0 and (li + 1) % step == 0

    @classmethod
    def from_json(cls, path: Path) -> "DecoderConfig":
        return cls(**json.loads(path.read_text(encoding="utf-8")))


# ---------------------------------------------------------------------------
# functional forward

def _rms_norm(x, w, eps, plus_one: bool = False):
    """RMSNorm; ``plus_one`` = Gemma convention (weight stored
    zero-centered, applied as ``1 + w``)."""
    var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    normed = (x * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * (1.0 + w) if plus_one else normed * w


def rope_inv_freq(cfg: "DecoderConfig", d: int, base: float = None,
                  use_scaling: bool = True) -> Tuple[jax.Array, float]:
    """(per-frequency inverse wavelengths, cos/sin attention scale).

    Supported rope_scaling types: none/default (plain RoPE), linear,
    llama3 (Llama-3.1+ frequency-banded scaling — bit-matches HF
    ``_compute_llama3_parameters``), and yarn (NTK-by-parts with the
    paper's attention factor — bit-matches HF ``_compute_yarn_parameters``;
    Qwen3 long-context configs). Unknown types are refused at load.
    ``base``/``use_scaling`` serve gemma3's sliding layers, which rotate at
    ``rope_local_base_freq`` WITHOUT the global scaling."""
    base = base or cfg.rope_theta
    inv = 1.0 / (base ** (np.arange(0, d, 2, dtype=np.float64) / d))
    scale = 1.0
    rs = cfg.rope_scaling if use_scaling else None
    rtype = (rs or {}).get("rope_type") or (rs or {}).get("type")
    if rtype == "linear":
        inv = inv / rs["factor"]
    elif rtype == "llama3":
        factor, lo, hi = rs["factor"], rs["low_freq_factor"], \
            rs["high_freq_factor"]
        orig = rs["original_max_position_embeddings"]
        wavelen = 2 * math.pi / inv
        smooth = (orig / wavelen - lo) / (hi - lo)
        inv = np.where(wavelen > orig / lo, inv / factor,
                       np.where(wavelen < orig / hi, inv,
                                (1 - smooth) / factor * inv + smooth * inv))
    elif rtype == "yarn":
        factor = rs["factor"]
        orig = (rs.get("original_max_position_embeddings")
                or cfg.max_position_embeddings)
        beta_fast = rs.get("beta_fast") or 32
        beta_slow = rs.get("beta_slow") or 1
        scale = rs.get("attention_factor")
        if scale is None:
            def mscale(s, m=1):
                return 1.0 if s <= 1 else 0.1 * m * math.log(s) + 1.0

            ms, msd = rs.get("mscale"), rs.get("mscale_all_dim")
            scale = (mscale(factor, ms) / mscale(factor, msd)
                     if ms and msd else mscale(factor))

        def corr_dim(n_rot):
            return (d * math.log(orig / (n_rot * 2 * math.pi))
                    ) / (2 * math.log(base))

        lo, hi = corr_dim(beta_fast), corr_dim(beta_slow)
        if rs.get("truncate", True):
            lo, hi = math.floor(lo), math.ceil(hi)
        lo, hi = max(lo, 0), min(hi, d - 1)
        if lo == hi:
            hi += 0.001
        ramp = np.clip((np.arange(d // 2, dtype=np.float64) - lo)
                       / (hi - lo), 0, 1)
        extrapolation_factor = 1 - ramp
        inv = (inv / factor) * (1 - extrapolation_factor) \
            + inv * extrapolation_factor
    return jnp.asarray(inv, jnp.float32), float(scale)


def _rope(x, positions, inv, scale: float = 1.0):
    """x [B, T, H, D]; rotate pairs (half-split convention); ``inv`` and
    ``scale`` from :func:`rope_inv_freq` (yarn multiplies cos/sin by its
    attention factor)."""
    d = x.shape[-1]
    ang = positions[:, :, None].astype(jnp.float32) * inv[None, None, :]
    cos = (jnp.cos(ang) * scale)[:, :, None, :]
    sin = (jnp.sin(ang) * scale)[:, :, None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           axis=-1).astype(x.dtype)


def _moe_block(y: jax.Array, moe: Dict, cfg: DecoderConfig) -> jax.Array:
    """Mixture-of-experts SwiGLU block (Mixtral / Qwen2-MoE semantics).

    Routing matches HF exactly: softmax over ALL expert logits in f32,
    top-k selection, optional renormalization (`norm_topk_prob`; always on
    for Mixtral), weights cast back to the hidden dtype. The expert
    compute is the DENSE formulation: every expert runs on every token as
    one stacked einsum over the expert axis, and the routing weights
    (zero for unselected experts) weight the combine — mathematically
    identical to HF's gather/scatter dispatch (a scalar commutes through
    the linear expert map), and the idiomatic TPU shape: three large MXU
    einsums with static shapes instead of data-dependent dispatch. For
    E≈8–64 serving-scale models the wasted expert FLOPs are cheaper than
    a scatter pipeline on this hardware; under a device mesh the expert
    axis shards over MODEL_AXIS (each chip computes only its local
    experts) and XLA inserts one psum for the combine — expert
    parallelism without an all-to-all. Replaces the torch MoE stacks the
    reference would reach through HF (reference client.py:143-169).
    """
    e = cfg.num_experts
    router_logits = jnp.dot(y, moe["router"])                # [B, T, E]
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    topv, topi = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    # combine weights [B, T, E]: routing weight where selected, else 0
    combine = jnp.sum(
        jax.nn.one_hot(topi, e, dtype=topv.dtype) * topv[..., None],
        axis=-2).astype(y.dtype)
    if "gate_q" in moe and moe["gate_q"].dtype == jnp.int4:
        # grouped int4 expert stacks (quantize_weights bits=4): the s32
        # accumulator keeps BOTH the expert and group axes so each
        # (expert, group, channel) rescale is exact before the f32 group
        # sum — the stacked-expert analogue of _qdot4. Memory note: the
        # [B, T, E, G, H] down-projection accumulator scales with the
        # prefill chunk, same caveat as _qdot4's.
        yq, ys = _quant_acts(y)
        ig = moe["gate_scale"].shape[1]
        yg = yq.reshape(*yq.shape[:-1], ig, yq.shape[-1] // ig)

        def up_proj(wq, ws):
            wg = wq.astype(jnp.int8).reshape(e, ig, -1, wq.shape[-1])
            acc = jnp.einsum("btgi,egif->btegf", yg, wg,
                             preferred_element_type=jnp.int32)
            return (jnp.sum(acc.astype(jnp.float32) * ws, axis=-2)
                    * ys[..., None])

        g = up_proj(moe["gate_q"], moe["gate_scale"])
        u = up_proj(moe["up_q"], moe["up_scale"])
        act = (jax.nn.gelu(g, approximate=True)
               if cfg.hidden_activation == "gelu_pytorch_tanh"
               else jax.nn.silu(g))
        xq, xs = _quant_acts(act * u)        # per-(token, expert) rows
        igd = moe["down_scale"].shape[1]
        xg = xq.reshape(*xq.shape[:-1], igd, xq.shape[-1] // igd)
        wgd = moe["down_q"].astype(jnp.int8).reshape(
            e, igd, -1, moe["down_q"].shape[-1])
        accd = jnp.einsum("btegi,egih->btegh", xg, wgd,
                          preferred_element_type=jnp.int32)
        deq = (jnp.sum(accd.astype(jnp.float32) * moe["down_scale"],
                       axis=-2) * xs)
        out = jnp.sum(deq * combine.astype(jnp.float32)[..., None],
                      axis=2).astype(y.dtype)
    elif "gate_q" in moe:  # int8 expert stacks (quantize_weights_int8):
        # keep the expert axis in each integer einsum's OUTPUT so the
        # per-(expert, channel) rescale stays exact, and apply the
        # routing combine after the down projection (a scalar commutes
        # through the linear expert map — same math as the dense path)
        yq, ys = _quant_acts(y)
        g = jnp.einsum("bth,ehf->btef", yq, moe["gate_q"],
                       preferred_element_type=jnp.int32
                       ).astype(jnp.float32) * ys[..., None] \
            * moe["gate_scale"]
        u = jnp.einsum("bth,ehf->btef", yq, moe["up_q"],
                       preferred_element_type=jnp.int32
                       ).astype(jnp.float32) * ys[..., None] \
            * moe["up_scale"]
        act = (jax.nn.gelu(g, approximate=True)
               if cfg.hidden_activation == "gelu_pytorch_tanh"
               else jax.nn.silu(g))
        xq, xs = _quant_acts(act * u)        # per-(token, expert) rows
        deq = jnp.einsum("btef,efh->bteh", xq, moe["down_q"],
                         preferred_element_type=jnp.int32
                         ).astype(jnp.float32) * xs * moe["down_scale"]
        out = jnp.sum(deq * combine.astype(jnp.float32)[..., None],
                      axis=2).astype(y.dtype)
    else:
        g = jnp.einsum("bth,ehf->btef", y, moe["gate"])
        u = jnp.einsum("bth,ehf->btef", y, moe["up"])
        act = (jax.nn.gelu(g, approximate=True)
               if cfg.hidden_activation == "gelu_pytorch_tanh"
               else jax.nn.silu(g))
        out = jnp.einsum("btef,efh->bth", act * u * combine[..., None],
                         moe["down"])
    if "shared_gate" in moe:  # Qwen2-MoE shared expert, sigmoid-gated
        sh = moe["shared"]
        if "gate_q" in sh:
            sg = _qdot2(y, sh["gate_q"], sh["gate_scale"])
            su = _qdot2(y, sh["up_q"], sh["up_scale"])
            shared = _qdot2(jax.nn.silu(sg) * su, sh["down_q"],
                            sh["down_scale"])
        else:
            sg = jnp.dot(y, sh["gate"])
            su = jnp.dot(y, sh["up"])
            shared = jnp.dot(jax.nn.silu(sg) * su, sh["down"])
        out = out + jax.nn.sigmoid(jnp.dot(y, moe["shared_gate"])) * shared
    return out


def lm_logits(params: Dict, cfg: DecoderConfig, x: jax.Array) -> jax.Array:
    """Final-norm hidden states → vocabulary logits (with Gemma softcap)."""
    head = params["lm_head"]
    if isinstance(head, dict):               # int8 weight-quantized head
        logits = _qdot(x, head, jnp.float32)
    else:
        logits = jnp.dot(x, head, preferred_element_type=jnp.float32)
    if cfg.final_logit_softcapping:
        cap = cfg.final_logit_softcapping
        logits = cap * jnp.tanh(logits / cap)
    return logits


def pad_bucket(n: int, lo: int = 16, hi: Optional[int] = None) -> int:
    """Next power-of-two ≥ n (min ``lo``), capped at ``hi`` — the prompt
    padding buckets that bound the prefill program count."""
    b = lo
    while b < n:
        b *= 2
    return min(b, hi) if hi is not None else b


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-(position, head) int8 quantization of k/v rows.

    ``x`` [..., D] → (q int8 [..., D], scale f32 [..., 1]) with
    ``scale = amax(|x|) / 127`` over the head dim. Decode is
    KV-bandwidth-bound at long context; int8 rows nearly halve the cache
    HBM read per step (D int8 + 4 scale bytes vs 2·D bf16), buying ~2×
    context or slots in the same footprint. The per-row scale tracks each
    token's own dynamic range, so the relative error per element stays
    ≤ 1/254 of that row's amax — tolerance-tested in
    tests/test_kv_quant.py. The reference has no KV cache control at all
    (HF ``model.generate`` default f16 cache, reference
    ``llm/client.py:306-369``).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(xf / scale).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    """Inverse of :func:`quantize_kv` (to the compute dtype)."""
    return (q.astype(jnp.float32) * scale).astype(dtype)


def _quant_channel(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8: w [I, O] → (q int8, scale [O])."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    return jnp.round(wf / scale).astype(jnp.int8), scale


def _quant_stack(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(expert, output-channel) int8 for stacked expert weights:
    w [E, I, O] → (q int8 [E, I, O], scale [E, O])."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    return jnp.round(wf / scale[:, None, :]).astype(jnp.int8), scale


def _pack_nibbles(q: jax.Array) -> jax.Array:
    """int32 values in [-8, 7], shape [..., I, O] → packed int8
    [..., I/2, O]: row 2j in the low nibble, row 2j+1 in the high.

    Why a carrier at all: XLA-native s4 arrays cannot cross the
    host↔device boundary on every backend (the axon relay's re-layout
    ``device_put`` of an S4 jit argument recursed fatally — the round-4
    ``--weight-bits 4`` crash). Packed int8 transfers everywhere;
    :func:`unpack_weights4` converts to s4 INSIDE each jitted program
    (outside its scan), so the steady-state weight stream is still
    4 bits/element."""
    i = q.shape[-2]
    if i % 2:
        raise ValueError(f"int4 packing needs an even contraction dim, "
                         f"got {i}")
    lo = q[..., 0::2, :] & 0xF
    hi = q[..., 1::2, :] & 0xF
    p = lo | (hi << 4)                       # [0, 255] in int32
    return jnp.where(p > 127, p - 256, p).astype(jnp.int8)


def _unpack_nibbles4(p: jax.Array) -> jax.Array:
    """Packed int8 [..., I/2, O] → XLA-native s4 [..., I, O] (the exact
    inverse of :func:`_pack_nibbles`; arithmetic shifts sign-extend each
    nibble)."""
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    hi = jnp.right_shift(p, 4)
    w = jnp.stack([lo, hi], axis=-2)         # [..., I/2, 2, O]
    return w.reshape(*p.shape[:-2], p.shape[-2] * 2,
                     p.shape[-1]).astype(jnp.int4)


def unpack_weights4(tree):
    """Replace every packed-int4 leaf (key suffix ``_q4p``) with its
    XLA-native s4 form (key suffix ``_q``), recursively; identity when
    the tree holds no packed leaves.

    MUST be called INSIDE a jitted program (and outside its
    ``lax.scan``): the s4 buffers then live only inside the executable —
    written once per launch, streamed at 4 bits/element by every scan
    step — and never cross the host↔device boundary, which the axon
    relay cannot do for S4 (see :func:`_pack_nibbles`). Engines call
    this at the top of each program that takes model params."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            if k.endswith("_q4p"):
                out[k[:-2]] = _unpack_nibbles4(v)
            else:
                out[k] = unpack_weights4(v)
        return out
    if isinstance(tree, (list, tuple)):
        return type(tree)(unpack_weights4(v) for v in tree)
    return tree


def _quant_stack4(w: jax.Array, group: int) -> Tuple[jax.Array, jax.Array]:
    """Grouped symmetric int4 for stacked expert weights: w [E, I, O] →
    (q packed int8 [E, I/2, O], scale [E, I/g, O]). Groups run along the
    contraction dim I per expert; when ``group`` does not divide I the
    whole column is one group (mirrors :func:`_quant_group4`)."""
    e, i = w.shape[0], w.shape[1]
    g = group if i % group == 0 else i
    wf = w.astype(jnp.float32).reshape(e, i // g, g, *w.shape[2:])
    amax = jnp.max(jnp.abs(wf), axis=2)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale[:, :, None]), -8, 7)
    return _pack_nibbles(q.reshape(w.shape).astype(jnp.int32)), scale


def _quant_group4(w: jax.Array, group: int) -> Tuple[jax.Array, jax.Array]:
    """Symmetric grouped int4: w [I, O] → (q packed int8 [I/2, O],
    scale [I/g, O]).

    Device-resident form is XLA's native ``int4`` (the compiler owns the
    nibble packing in HBM, so the weight stream is 4 bits/element); the
    PYTREE stores the nibble-packed int8 carrier and each program
    converts on entry (:func:`unpack_weights4`). Groups run along the
    input (contraction) dim; when ``group`` does not divide I the whole
    column is one group."""
    i = w.shape[0]
    g = group if i % group == 0 else i
    wf = w.astype(jnp.float32).reshape(i // g, g, *w.shape[1:])
    amax = jnp.max(jnp.abs(wf), axis=1)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale[:, None]), -8, 7)
    return _pack_nibbles(q.reshape(w.shape).astype(jnp.int32)), scale


def _quant_acts(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-row int8 activations: (q int8, scale [..., 1])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    return jnp.round(xf / xs).astype(jnp.int8), xs


def quantize_weights_int8(params: Dict) -> Dict:
    """int8 weight quantization of the decoder projections (W8A8).

    Single-stream decode reads EVERY weight byte per emitted token —
    it is weights-bandwidth-bound, so int8 projection weights halve the
    dominant HBM stream (and the MXU natively runs s8×s8→s32 at ≥2× the
    bf16 rate). Each q/k/v/o/gate/up/down kernel and the LM head becomes
    (int8 matrix, per-output-channel f32 scale); at compute time
    :func:`_qdot` quantizes the activations per row on the fly and runs
    an integer matmul. MoE expert stacks quantize too — per-(expert,
    output-channel) scales; ``_moe_block`` keeps the expert axis in the
    integer einsum outputs so each expert's rescale stays exact, and the
    routing combine moves after the down projection (a scalar commutes
    through the linear expert map), as does the Qwen2-MoE shared expert
    (flat ``*_q``/``*_scale`` leaves, replicated under TP since its
    intermediate size differs from the dense one). Per-element weight
    error ≤ channel-amax/254; embeddings, norms, biases, and routers
    stay full precision. Opt-in
    (``llm.weight_quant``): exact HF token-parity no longer holds, the
    engines instead stay token-identical to EACH OTHER
    (tests/test_weight_quant.py). The reference has no quantized serving
    path at all (full-precision HF ``model.generate``, reference
    ``llm/client.py:306-369``).
    """
    return quantize_weights(params, bits=8)


def quantize_weights(params: Dict, bits: int = 8, group: int = 64) -> Dict:
    """Weight quantization at ``bits`` ∈ {8, 4} (see
    :func:`quantize_weights_int8` for the design).

    bits=4 stores projection kernels and the LM head as nibble-packed
    int8 carriers (``*_q4p`` leaves; grouped symmetric, ``group`` along
    the contraction dim, per-(group, channel) scales — error ≤
    group-amax/14 per element) that every program converts to XLA-native
    ``int4`` on entry (:func:`unpack_weights4` — s4 cannot cross the
    host↔device boundary on the relay backend): the weight HBM stream
    drops to a quarter of bf16. MoE expert stacks
    quantize to grouped int4 too (per-(expert, group, channel) scales,
    :func:`_quant_stack4`; ``_moe_block`` keeps expert AND group axes in
    the s32 accumulator so every rescale is exact), as does the Qwen2-MoE
    shared expert via :func:`_quant_group4` flat leaves.
    """
    if bits not in (8, 4):
        raise ValueError(f"weight_bits must be 8 or 4, got {bits}")

    qk = "_q4p" if bits == 4 else "_q"   # packed-int4 carrier vs int8

    def qnode(node: Dict) -> Dict:
        if bits == 4:
            q, s = _quant_group4(node["kernel"], group)
        else:
            q, s = _quant_channel(node["kernel"])
        out = {k: v for k, v in node.items() if k != "kernel"}
        out["kernel" + qk], out["kernel_scale"] = q, s
        return out

    def qmoe(moe: Dict) -> Dict:
        qm = dict(moe)
        for name in ("gate", "up", "down"):
            if bits == 4:
                q, s = _quant_stack4(qm.pop(name), group)
            else:
                q, s = _quant_stack(qm.pop(name))
            qm[name + qk], qm[name + "_scale"] = q, s
        if "shared" in qm:  # Qwen2-MoE shared expert: flat quant leaves
            sh = {}
            for name, w in qm["shared"].items():
                if bits == 4:
                    q, s = _quant_group4(w, group)
                else:
                    q, s = _quant_channel(w)
                sh[name + qk], sh[name + "_scale"] = q, s
            qm["shared"] = sh
        return qm

    out = dict(params)
    layers = []
    for layer in params["layers"]:
        nl = dict(layer)
        for name in ("q", "k", "v", "o", "gate", "up", "down"):
            if name in nl and "kernel" in nl[name]:
                nl[name] = qnode(nl[name])
        if "moe" in nl:
            nl["moe"] = qmoe(nl["moe"])
        layers.append(nl)
    out["layers"] = layers
    out["lm_head"] = qnode({"kernel": params["lm_head"]})
    return out


def _qdot(x: jax.Array, node: Dict, out_dtype=None) -> jax.Array:
    """x [..., I] @ int8 kernel [I, O] with dynamic per-row activation
    quantization: both matmul operands stream from HBM as int8 (the
    weight read is the decode-time bottleneck), the MXU accumulates in
    s32, and one rescale by (row scale × channel scale) restores
    magnitudes."""
    return _qdot2(x, node["kernel_q"], node["kernel_scale"], out_dtype)


def _qdot2(x: jax.Array, kernel_q: jax.Array, kernel_scale: jax.Array,
           out_dtype=None) -> jax.Array:
    """Flat-leaf form of :func:`_qdot` (int8 kernel + channel scale)."""
    if kernel_q.dtype == jnp.int4:
        return _qdot4(x, kernel_q, kernel_scale, out_dtype)
    xq, xs = _quant_acts(x)
    acc = jax.lax.dot_general(
        xq, kernel_q,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * kernel_scale
    return y.astype(out_dtype or x.dtype)


def _qdot4(x: jax.Array, kernel_q: jax.Array, kernel_scale: jax.Array,
           out_dtype=None) -> jax.Array:
    """x [..., I] @ int4 kernel [I, O] with per-(group, channel) scales
    [I/g, O]: the grouped integer einsum keeps the group axis in the
    s32 accumulator output so each group's rescale is exact, then sums
    groups in f32. The int4 operand widens to int8 for the MXU; HBM
    still streams 4 bits/element (XLA packs s4 natively).

    Memory note: the [..., I/g, O] s32 accumulator is negligible at
    decode (leading dim 1) but scales with the prefill chunk — at
    prefill_chunk=1024 on 0.5B geometry the largest (down-projection)
    accumulator is ~0.3 GB transient; lower ``llm.prefill_chunk`` if
    int4 prefill ever pressures HBM. The group-sum order is identical
    for every leading shape, which the speculative engines' exactness
    (verify row == plain decode row) relies on — do not specialize this
    path by shape."""
    i, ig = kernel_q.shape[0], kernel_scale.shape[0]
    g = i // ig
    xq, xs = _quant_acts(x)
    xg = xq.reshape(*xq.shape[:-1], ig, g)
    wg = kernel_q.astype(jnp.int8).reshape(ig, g, -1)
    acc = jnp.einsum("...gi,gio->...go", xg, wg,
                     preferred_element_type=jnp.int32)
    y = jnp.sum(acc.astype(jnp.float32) * kernel_scale, axis=-2) * xs
    return y.astype(out_dtype or x.dtype)


def _proj(x: jax.Array, node: Dict) -> jax.Array:
    """Dense or int8-quantized projection, by node layout."""
    if "kernel_q" in node:
        return _qdot(x, node)
    return jnp.dot(x, node["kernel"])


def decoder_forward(params: Dict, cfg: DecoderConfig, input_ids: jax.Array,
                    positions: jax.Array,
                    kv_cache: Optional[List[Tuple[jax.Array, jax.Array]]] = None,
                    cache_len: Optional[jax.Array] = None,
                    return_hidden: bool = False,
                    shared_kv=None, kv_offset=None):
    """[B, T] ids (+ positions [B, T]) → logits [B, T, V].

    With ``kv_cache`` (list of ([B, S, Hkv, D], [B, S, Hkv, D]) per layer)
    the new keys/values are written at ``cache_len`` offsets and attention
    spans the cache; returns (logits, new_cache). A 4-tuple layer entry
    ``(k_q, v_q, k_scale, v_scale)`` (int8 values + [B, S, Hkv, 1] f32
    scales) selects the quantized cache path: writes quantize, reads
    dequantize (see :func:`quantize_kv`).

    ``cache_len`` may be a scalar (all rows share one offset — the
    single-stream path) or a ``[B]`` vector (each batch row writes at its
    own offset — the continuous-batching decode path, where slots sit at
    different sequence lengths; see models/batched_decoder.py). Vector
    offsets use a scatter write; out-of-range rows are dropped by JAX's
    scatter semantics, which retired slots rely on.

    ``return_hidden=True`` skips the LM head and returns the final-norm
    hidden states instead of logits — prefill callers slice the one
    position they need and apply :func:`lm_logits` to that row alone,
    saving the T×H×V head matmul and the [T, V] logits buffer.

    ``shared_kv`` + ``kv_offset`` implement a PHYSICALLY SHARED prefix
    segment (models/batched_decoder.py ``shared_prefix``): ``shared_kv``
    is a per-layer list of read-only KV rows [1, P, Hkv, D] (same dense /
    quantized tuple format as cache layers) holding absolute positions
    0..P-1, attended by every batch row whose ``kv_offset`` is > 0.
    ``kv_offset`` (scalar or [B], values 0 or P) maps absolute positions
    to cache rows: row index = position − offset, so a slot using the
    shared prefix stores only positions ≥ P in its own rows. ``cache_len``
    stays ABSOLUTE. One copy of the prefix serves all slots — S× less
    prefix HBM than per-slot installs.

    The paged engine (models/paged_decoder.py) also runs through the two
    contiguous write paths above: it gathers each slot's block table
    into a contiguous [S, MAXB*BS, ...] view once per LAUNCH, forwards
    through this function on that view, and scatters the written block
    window back — per-step per-layer table indirection here measured
    0.06x of the contiguous engine on TPU and was removed in round 5.
    """
    b, t = input_ids.shape
    h, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    d = cfg.head_dim
    rope_inv, rope_scale = rope_inv_freq(cfg, d)
    if cfg.gemma3:
        # gemma3 sliding layers rotate at the UNSCALED local base
        rope_inv_local, rope_scale_local = rope_inv_freq(
            cfg, d, base=cfg.rope_local_base_freq, use_scaling=False)
    g = cfg.gemma
    x = jnp.take(params["embed"], input_ids, axis=0)
    if g:  # Gemma scales embeddings by sqrt(H)
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, x.dtype)
    new_cache = []
    for li, layer in enumerate(params["layers"]):
        y = _rms_norm(x, layer["input_norm"], cfg.rms_norm_eps, g)
        q = (_proj(y, layer["q"]) + layer["q"]["bias"]).reshape(b, t, h, d)
        k = (_proj(y, layer["k"]) + layer["k"]["bias"]).reshape(b, t, hkv, d)
        v = (_proj(y, layer["v"]) + layer["v"]["bias"]).reshape(b, t, hkv, d)
        if "q_norm" in layer:   # Qwen3/Gemma3-class per-head RMS before RoPE
            # gemma3 stores these zero-centered ((1+w) convention)
            q = _rms_norm(q, layer["q_norm"], cfg.rms_norm_eps, g)
            k = _rms_norm(k, layer["k_norm"], cfg.rms_norm_eps, g)
        sliding = (cfg.sliding_window
                   and cfg.layer_types is not None
                   and cfg.layer_types[li] == "sliding_attention")
        if cfg.gemma3 and sliding:
            li_inv, li_scale = rope_inv_local, rope_scale_local
        else:
            li_inv, li_scale = rope_inv, rope_scale
        q = _rope(q, positions, li_inv, li_scale)
        k = _rope(k, positions, li_inv, li_scale)
        if kv_cache is not None:
            # absolute position → cache row: subtract the per-row shared-
            # prefix offset (0 when no shared segment is in play)
            row0 = cache_len if kv_offset is None else cache_len - kv_offset

            def cache_write(dst, upd):
                if jnp.ndim(cache_len) == 0:
                    return jax.lax.dynamic_update_slice(
                        dst, upd, (0, row0, 0, 0))
                # per-row offsets: row b's T new entries land at
                # row0[b]..row0[b]+T-1 (scatter; OOB rows drop)
                rows = row0[:, None] + jnp.arange(t)[None, :]
                return dst.at[jnp.arange(b)[:, None], rows].set(upd)

            def cache_read(arr):
                return arr

            entry = kv_cache[li]
            if len(entry) == 4:
                # int8 KV cache: (k_q, v_q, k_scale, v_scale), scales
                # [B, S, Hkv, 1] — quantize-on-write, dequantize-on-read.
                # Within-forward attention also reads the dequantized
                # rows, so chunked prefill and prefix reuse stay exact
                # against single-shot prefill under quantization too.
                ckq, cvq, cks, cvs = entry
                kq, ksc = quantize_kv(k)
                vq, vsc = quantize_kv(v)
                ckq, cks = cache_write(ckq, kq), cache_write(cks, ksc)
                cvq, cvs = cache_write(cvq, vq), cache_write(cvs, vsc)
                new_cache.append((ckq, cvq, cks, cvs))
                # paged: gather the row's blocks FIRST, dequantize only
                # the gathered [B, L] view (not the whole pool)
                k_att = dequantize_kv(cache_read(ckq), cache_read(cks),
                                      k.dtype)
                v_att = dequantize_kv(cache_read(cvq), cache_read(cvs),
                                      v.dtype)
            else:
                ck, cv = entry
                ck, cv = cache_write(ck, k), cache_write(cv, v)
                new_cache.append((ck, cv))
                k_att, v_att = cache_read(ck), cache_read(cv)
            if jnp.ndim(cache_len) == 0:
                filled_to = cache_len + t                        # scalar
            else:
                filled_to = (cache_len + t)[:, None, None]       # [B, 1, 1]
            s_slot = k_att.shape[1]
            if shared_kv is None and kv_offset is None:
                kv_pos = jnp.arange(s_slot)[None, None, :]      # [1, 1, S]
                att_mask = ((kv_pos <= positions[:, :, None])    # causal
                            & (kv_pos < filled_to))              # filled
            else:
                off = (kv_offset if kv_offset is not None
                       else jnp.zeros((), jnp.int32))
                offc = jnp.broadcast_to(jnp.asarray(off), (b,))  # [B]
                slot_pos = offc[:, None] + jnp.arange(s_slot)[None, :]
                seg_ok = jnp.ones((b, s_slot), bool)
                kv_pos_b = slot_pos
                if shared_kv is not None:
                    se = shared_kv[li]
                    if len(se) == 4:
                        sk = dequantize_kv(se[0], se[2], k.dtype)
                        sv = dequantize_kv(se[1], se[3], v.dtype)
                    else:
                        sk, sv = se
                    p = sk.shape[1]
                    k_att = jnp.concatenate(
                        [jnp.broadcast_to(sk, (b,) + sk.shape[1:]), k_att],
                        axis=1)
                    v_att = jnp.concatenate(
                        [jnp.broadcast_to(sv, (b,) + sv.shape[1:]), v_att],
                        axis=1)
                    sh_pos = jnp.broadcast_to(jnp.arange(p)[None, :], (b, p))
                    kv_pos_b = jnp.concatenate([sh_pos, slot_pos], axis=1)
                    # rows with offset 0 do not use the shared segment
                    seg_ok = jnp.concatenate(
                        [jnp.broadcast_to((offc > 0)[:, None], (b, p)),
                         seg_ok], axis=1)
                kv_pos = kv_pos_b[:, None, :]                   # [B, 1, S]
                att_mask = ((kv_pos <= positions[:, :, None])
                            & (kv_pos < filled_to)
                            & seg_ok[:, None, :])
        else:
            k_att, v_att = k, v
            kv_pos = positions[:, None, :]
            att_mask = positions[:, :, None] >= positions[:, None, :]
        if sliding:  # Gemma-class banded attention on alternating layers
            att_mask = att_mask & (
                positions[:, :, None] - kv_pos < cfg.sliding_window)

        # GQA: repeat kv heads
        rep = h // hkv
        k_r = jnp.repeat(k_att, rep, axis=2)
        v_r = jnp.repeat(v_att, rep, axis=2)
        scale = (cfg.query_pre_attn_scalar or d) ** -0.5
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_r,
                            preferred_element_type=jnp.float32) * scale
        if cfg.attn_logit_softcapping:
            cap = cfg.attn_logit_softcapping
            scores = cap * jnp.tanh(scores / cap)
        scores = jnp.where(att_mask[:, None, :, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(v_r.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v_r).reshape(b, t, h * d)
        attn_out = _proj(ctx, layer["o"])
        if "pre_ff_norm" in layer:  # Gemma2/3 sandwich norms: post-norm
            x = x + _rms_norm(attn_out, layer["post_norm"],  # on OUTPUTS
                              cfg.rms_norm_eps, True)
            y = _rms_norm(x, layer["pre_ff_norm"], cfg.rms_norm_eps, True)
        else:
            x = x + attn_out
            y = _rms_norm(x, layer["post_norm"], cfg.rms_norm_eps, g)
        if "moe" in layer:
            mlp_out = _moe_block(y, layer["moe"], cfg)
        else:
            gate_h = _proj(y, layer["gate"])
            act = (jax.nn.gelu(gate_h, approximate=True)
                   if cfg.hidden_activation == "gelu_pytorch_tanh"
                   else jax.nn.silu(gate_h))
            up = _proj(y, layer["up"])
            mlp_out = _proj(act * up, layer["down"])
        if "post_ff_norm" in layer:
            mlp_out = _rms_norm(mlp_out, layer["post_ff_norm"],
                                cfg.rms_norm_eps, True)
        x = x + mlp_out

    x = _rms_norm(x, params["final_norm"], cfg.rms_norm_eps, g)
    if return_hidden:
        return x, (new_cache if kv_cache is not None else None)
    logits = lm_logits(params, cfg, x)
    return logits, (new_cache if kv_cache is not None else None)


# ---------------------------------------------------------------------------
# HF loading

def load_hf_decoder_params(model_dir: Path) -> Tuple[Dict, DecoderConfig]:
    from legalrag_tpu.models.bert import _load_safetensors

    cfg = DecoderConfig.from_json(model_dir / "config.json")
    t = _load_safetensors(model_dir)

    def get(name):
        for p in ("model.", ""):
            if p + name in t:
                return jnp.asarray(t[p + name])
        raise KeyError(name)

    def lin(name, bias_name=None):
        out = {"kernel": get(f"{name}.weight").T}
        try:
            out["bias"] = get(bias_name or f"{name}.bias")
        except KeyError:
            out["bias"] = jnp.zeros(out["kernel"].shape[1], out["kernel"].dtype)
        return out

    embed = get("embed_tokens.weight")
    params: Dict = {"embed": embed, "layers": [],
                    "final_norm": get("norm.weight")}
    if cfg.tie_word_embeddings or "lm_head.weight" not in t:
        params["lm_head"] = embed.T
    else:
        params["lm_head"] = jnp.asarray(t["lm_head.weight"]).T
    has_qk_norm = any(p in t for p in
                      ("model.layers.0.self_attn.q_norm.weight",
                       "layers.0.self_attn.q_norm.weight"))
    h, hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    q0 = get("layers.0.self_attn.q_proj.weight")
    k0 = get("layers.0.self_attn.k_proj.weight")
    if q0.shape[0] != h * hd or k0.shape[0] != hkv * hd:
        raise ValueError(
            f"attention weight shapes q{tuple(q0.shape)}/k{tuple(k0.shape)} "
            f"do not match heads={h}/{hkv} head_dim={hd}; checkpoint uses an "
            "architecture variant this loader does not support")
    def moe_layer(p: str) -> Dict:
        """Stacked-expert MoE weights: Mixtral ``block_sparse_moe``
        (w1=gate, w3=up, w2=down) or Qwen2-MoE ``mlp.experts`` naming,
        stacked on a leading expert axis so the forward is three einsums
        (and the expert axis shards over the mesh for EP)."""
        e = cfg.num_experts
        if f"model.{p}.block_sparse_moe.gate.weight" in t \
                or f"{p}.block_sparse_moe.gate.weight" in t:  # Mixtral
            pre, g_, u_, d_ = f"{p}.block_sparse_moe", "w1", "w3", "w2"
        else:                                                 # Qwen2-MoE
            pre, g_, u_, d_ = f"{p}.mlp", "gate_proj", "up_proj", \
                "down_proj"
        moe = {
            "router": get(f"{pre}.gate.weight").T,
            "gate": jnp.stack([get(f"{pre}.experts.{x}.{g_}.weight").T
                               for x in range(e)]),
            "up": jnp.stack([get(f"{pre}.experts.{x}.{u_}.weight").T
                             for x in range(e)]),
            "down": jnp.stack([get(f"{pre}.experts.{x}.{d_}.weight").T
                               for x in range(e)]),
        }
        if f"model.{pre}.shared_expert.gate_proj.weight" in t \
                or f"{pre}.shared_expert.gate_proj.weight" in t:
            moe["shared_gate"] = get(f"{pre}.shared_expert_gate.weight").T
            moe["shared"] = {
                "gate": get(f"{pre}.shared_expert.gate_proj.weight").T,
                "up": get(f"{pre}.shared_expert.up_proj.weight").T,
                "down": get(f"{pre}.shared_expert.down_proj.weight").T,
            }
        return moe

    for i in range(cfg.num_hidden_layers):
        p = f"layers.{i}"
        layer = {
            "input_norm": get(f"{p}.input_layernorm.weight"),
            "q": lin(f"{p}.self_attn.q_proj"),
            "k": lin(f"{p}.self_attn.k_proj"),
            "v": lin(f"{p}.self_attn.v_proj"),
            "o": {"kernel": get(f"{p}.self_attn.o_proj.weight").T},
            "post_norm": get(f"{p}.post_attention_layernorm.weight"),
        }
        if cfg.layer_is_moe(i):
            layer["moe"] = moe_layer(p)
        else:
            layer.update({
                "gate": {"kernel": get(f"{p}.mlp.gate_proj.weight").T},
                "up": {"kernel": get(f"{p}.mlp.up_proj.weight").T},
                "down": {"kernel": get(f"{p}.mlp.down_proj.weight").T},
            })
        if has_qk_norm:  # Qwen3-class per-head RMS on q/k (shape [head_dim])
            layer["q_norm"] = get(f"{p}.self_attn.q_norm.weight")
            layer["k_norm"] = get(f"{p}.self_attn.k_norm.weight")
        if cfg.gemma:    # Gemma2/3 sandwich norms around the MLP block
            try:
                layer["pre_ff_norm"] = get(
                    f"{p}.pre_feedforward_layernorm.weight")
                layer["post_ff_norm"] = get(
                    f"{p}.post_feedforward_layernorm.weight")
            except KeyError:
                pass  # gemma1: classic two-norm flow
        params["layers"].append(layer)
    return params, cfg


# ---------------------------------------------------------------------------
# generation

class PrefixKVCache:
    """LRU of recent prompts' KV rows, for exact prefix reuse.

    ``match`` returns (rows, l, sb): reuse the first ``l`` cached rows and
    prefill a suffix padded to bucket ``sb`` (shrinking ``l`` when the
    padded suffix would not fit the cache). ``store`` inserts a prompt's
    rows at the front and evicts past ``size``.
    """

    def __init__(self, size: int, min_len: int = 16):
        self.size = size
        self.min_len = min_len
        self.entries: List = []    # [(prompt_ids, rows, t)]
        self.stats = {"hits": 0, "misses": 0, "saved_tokens": 0}

    def match(self, prompt_ids: List[int], max_len: int):
        t = len(prompt_ids)
        best, best_l = None, 0
        for entry in self.entries:
            l = 0
            for a, b in zip(prompt_ids, entry[0]):
                if a != b:
                    break
                l += 1
            l = min(l, t - 1)  # at least one suffix token must run
            if l > best_l:
                best, best_l = entry, l
        if best is None or best_l < self.min_len:
            self.stats["misses"] += 1
            return None
        sb = pad_bucket(t - best_l, hi=max_len)
        if best_l + sb > max_len:
            best_l = max_len - sb  # shrink so the padded suffix fits
        if best_l < self.min_len:
            self.stats["misses"] += 1
            return None
        self.stats["hits"] += 1
        self.stats["saved_tokens"] += best_l
        return best[1], best_l, sb

    def store(self, prompt_ids: List[int], rows, t: int) -> None:
        """Insert at the LRU front, deduplicating prefix-nested entries.

        If an existing entry's prompt extends this one, its rows already
        contain this prompt's rows (KV rows depend only on preceding
        tokens) and it matches every query at least as well — refresh its
        LRU position instead of storing a duplicate. Conversely, entries
        this prompt extends are strict row-subsets of the new entry —
        drop them. Lossless for ``match`` (for nested entries A ⊑ B,
        LCP(q, A) = min(LCP(q, B), len(A)) ≤ LCP(q, B)); the win is HBM:
        RAG retries/extensions of a shared template no longer pin
        near-identical row sets in separate LRU slots.
        """
        ids = list(prompt_ids)
        for i, e in enumerate(self.entries):
            if len(e[0]) >= t and e[0][:t] == ids:
                self.entries.insert(0, self.entries.pop(i))
                return
        self.entries = [e for e in self.entries
                        if ids[:len(e[0])] != e[0]]
        self.entries.insert(0, (ids, rows, t))
        del self.entries[self.size:]


class JaxDecoderLM:
    """Greedy / sampled generation with a jitted KV-cache decode step.

    ``prefix_cache > 0`` enables automatic prefix caching: the KV rows of
    the last N prompts are kept (LRU), and a new prompt sharing a token
    prefix with any of them (exact longest-common-prefix, ≥
    ``_PREFIX_MIN`` tokens) prefills only its suffix — KV rows depend
    only on preceding tokens, so reuse is exact. RAG prompts share the
    system template + few-shot example across requests, which is
    precisely this win (time-to-first-token scales with the suffix).
    """

    _PREFIX_MIN = 16

    def __init__(self, params: Dict, cfg: DecoderConfig, tokenizer=None,
                 device=None, max_len: int = 4096, decode_chunk: int = 8,
                 prefix_cache: int = 0, prefill_chunk: int = 1024,
                 kv_quant: bool = False, json_constraint=None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.device = device
        self.max_len = max_len
        # int8 KV cache (quantize_kv): ~1.9× less cache HBM per decode
        # step → ~2× context or batch slots in the same footprint
        self.kv_quant = kv_quant
        # schema-constrained JSON decoding (models/constrain.py): streams
        # opting in (generate_stream(constrain=True)) can only emit
        # tokens that keep the output a prefix of a schema-valid JSON
        # document; EOS unlocks when the document completes
        self.json_constraint = json_constraint
        # prompts longer than this prefill in sequential chunks at cache
        # offsets (exact — each chunk attends the already-filled cache):
        # a single T-token prefill materializes [H, T, T] attention scores
        # (~1 GB f32 at 4k context on Qwen2-0.5B geometry); chunking caps
        # that at [H, C, T]
        self.prefill_chunk = max(prefill_chunk, 16)
        self._prefix = (PrefixKVCache(prefix_cache, self._PREFIX_MIN)
                        if prefix_cache else None)
        # tokens generated per device execution: each execution costs a
        # host round trip (~200 ms on remote-relay backends), so decoding
        # runs a lax.scan of `decode_chunk` steps per launch and streams
        # chunk-by-chunk (1 = per-token, the reference-style loop)
        self.decode_chunk = max(1, decode_chunk)
        # donate the KV cache (and the other consumed carries) so XLA
        # aliases instead of copying the full cache every decode launch
        self._decode_step = jax.jit(self._step, donate_argnums=(3,))
        self._decode_chunk_fn = jax.jit(self._chunk,
                                        static_argnames=("n_steps",
                                                         "greedy"),
                                        donate_argnums=(1, 3, 4, 9))
        # prefill is ONE program per prompt bucket (right-padded): eager
        # prefill costs hundreds of dispatches on remote-relay backends,
        # and the in-jit last-row LM head saves the T×H×V logits matmul
        self._prefill_fn = jax.jit(self._prefill)
        self._prefill_prefix_fn = jax.jit(self._prefill_with_prefix)
        self._prefill_chunk_fn = jax.jit(self._prefill_chunk_step,
                                         donate_argnums=(1,))
        self._extract_rows_fn = jax.jit(self._extract_rows,
                                        static_argnames=("tb",))

    @classmethod
    def from_pretrained(cls, name_or_path: str, device=None, **kw
                        ) -> "JaxDecoderLM":
        from legalrag_tpu.models.bert import resolve_model_dir

        model_dir = resolve_model_dir(name_or_path)
        params, cfg = load_hf_decoder_params(model_dir)
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(str(model_dir))
        if kw.pop("constrain_json", False) and "json_constraint" not in kw:
            from legalrag_tpu.models.constrain import (SECTIONS_SCHEMA,
                                                       JsonConstraint)

            kw["json_constraint"] = JsonConstraint.from_tokenizer(
                SECTIONS_SCHEMA, tokenizer)
        wq, wb = kw.pop("weight_quant", False), kw.pop("weight_bits", 8)
        if wq:
            params = quantize_weights(params, bits=wb)
        dm = kw.pop("draft_model", "")
        if dm:  # draft-MODEL speculation (spec engines): load the small
            # decoder alongside; same quantization treatment as the target
            ddir = resolve_model_dir(dm)
            dparams, dcfg = load_hf_decoder_params(ddir)
            if wq:
                dparams = quantize_weights(dparams, bits=wb)
            if device is not None:
                dparams = jax.device_put(dparams, device)
            kw["draft"] = (dparams, dcfg)
        if device is not None:
            params = jax.device_put(params, device)
        log.info("loaded decoder %s (%d layers, H=%d, GQA %d/%d)",
                 name_or_path, cfg.num_hidden_layers, cfg.hidden_size,
                 cfg.num_attention_heads, cfg.num_key_value_heads)
        return cls(params, cfg, tokenizer, device=device, **kw)

    # ------------------------------------------------------------- internals
    def _empty_cache(self, b: int):
        hkv, d = self.cfg.num_key_value_heads, self.cfg.head_dim
        if self.kv_quant:
            return [(jnp.zeros((b, self.max_len, hkv, d), jnp.int8),
                     jnp.zeros((b, self.max_len, hkv, d), jnp.int8),
                     jnp.zeros((b, self.max_len, hkv, 1), jnp.float32),
                     jnp.zeros((b, self.max_len, hkv, 1), jnp.float32))
                    for _ in range(self.cfg.num_hidden_layers)]
        # Cache dtype must match the checkpoint dtype: released Qwen2/Llama
        # weights are bf16, and dynamic_update_slice requires operand and
        # update dtypes to agree (ADVICE r1 high).
        dt = self.params["embed"].dtype
        return [(jnp.zeros((b, self.max_len, hkv, d), dt),
                 jnp.zeros((b, self.max_len, hkv, d), dt))
                for _ in range(self.cfg.num_hidden_layers)]

    def _prefill(self, params, ids, true_len):
        """[1, L] right-padded prompt → (last real token's logits [1, V],
        cache). Pad k/v rows land at positions ≥ true_len and are always
        overwritten by decode steps before they can be attended (each step
        writes row p before attending kv_pos ≤ p), so no pad masking is
        needed; the causal mask already hides pads from the real tokens."""
        params = unpack_weights4(params)
        t = ids.shape[1]
        cache = self._empty_cache(ids.shape[0])
        positions = jnp.arange(t, dtype=jnp.int32)[None, :]
        hidden, cache = decoder_forward(params, self.cfg, ids, positions,
                                        kv_cache=cache,
                                        cache_len=jnp.int32(0),
                                        return_hidden=True)
        hrow = jax.lax.dynamic_slice(
            hidden, (0, true_len - 1, 0), (1, 1, hidden.shape[-1]))
        return lm_logits(params, self.cfg, hrow)[:, 0], cache

    def _prefill_with_prefix(self, params, prefix_stacks, p_len, ids,
                             true_len):
        """Suffix prefill over reused prefix KV rows: install the cached
        rows into a fresh cache, forward the [1, SB] right-padded suffix
        at positions p_len.., return the last real suffix token's logits.
        Donor rows beyond p_len (the donor prompt's own suffix) are
        overwritten by this suffix prefill / later decode steps before
        they can ever be attended — the usual invariant.

        ``prefix_stacks`` is one layer-stacked [L, 1, tb, ...] array per
        cache component (see ``_extract_rows``): the hit crosses the
        dispatch boundary as 2 (dense) / 4 (kv-quant) buffers instead of
        2L/4L — per-buffer argument cost on remote-relay backends made
        the warm path SLOWER than cold at 24 layers before this."""
        params = unpack_weights4(params)
        cache = self._empty_cache(ids.shape[0])
        cache = [  # generic over dense (k, v) / quantized (kq, vq, ks, vs)
            tuple(jax.lax.dynamic_update_slice(a, stack[i], (0, 0, 0, 0))
                  for a, stack in zip(layer, prefix_stacks))
            for i, layer in enumerate(cache)]
        sb = ids.shape[1]
        positions = (p_len + jnp.arange(sb, dtype=jnp.int32))[None, :]
        hidden, cache = decoder_forward(params, self.cfg, ids, positions,
                                        kv_cache=cache, cache_len=p_len,
                                        return_hidden=True)
        hrow = jax.lax.dynamic_slice(
            hidden, (0, true_len - 1, 0), (1, 1, hidden.shape[-1]))
        return lm_logits(params, self.cfg, hrow)[:, 0], cache

    def _prefill_chunk_step(self, params, cache, ids, p_len, true_len):
        """One prefill chunk at cache offset ``p_len``: forward the
        right-padded [1, C] chunk over the already-filled cache; returns
        (logits of chunk token true_len-1, cache)."""
        params = unpack_weights4(params)
        c = ids.shape[1]
        positions = (p_len + jnp.arange(c, dtype=jnp.int32))[None, :]
        hidden, cache = decoder_forward(params, self.cfg, ids, positions,
                                        kv_cache=cache, cache_len=p_len,
                                        return_hidden=True)
        hrow = jax.lax.dynamic_slice(
            hidden, (0, true_len - 1, 0), (1, 1, hidden.shape[-1]))
        return lm_logits(params, self.cfg, hrow)[:, 0], cache

    def _extract_rows(self, cache, tb: int):
        # one layer-stacked [L, 1, tb, ...] array per cache component
        # (dense (k, v) / quantized (kq, vq, ks, vs)): the stored hit is
        # len(layer) device buffers, not L × len(layer) — buffer-count
        # overhead dominates the warm path on remote-relay backends
        return tuple(
            jnp.stack([jax.lax.dynamic_slice(layer[c], (0, 0, 0, 0),
                                             (1, tb) + layer[c].shape[2:])
                       for layer in cache])
            for c in range(len(cache[0])))

    @property
    def prefix_stats(self):
        return self._prefix.stats if self._prefix else \
            {"hits": 0, "misses": 0, "saved_tokens": 0}

    def _prefill_prompt(self, prompt_ids: List[int]):
        """Prefill a prompt → (last logits [1, V], cache), via the prefix
        cache when a long-enough exact token prefix is already resident."""
        t = len(prompt_ids)
        hit = self._prefix.match(prompt_ids, self.max_len) \
            if self._prefix else None
        if hit is not None and t - hit[1] > self.prefill_chunk:
            hit = None  # long suffix: take the chunked cold path instead
        if hit is not None:
            rows, l, sb = hit
            sfx = list(prompt_ids[l:]) + [0] * (sb - (t - l))
            last, cache = self._prefill_prefix_fn(
                self.params, rows, jnp.int32(l),
                jnp.asarray([sfx], jnp.int32), jnp.int32(t - l))
        elif t > self.prefill_chunk:
            # chunked prefill: sequential fixed-size chunks at cache
            # offsets — numerically identical to a single-shot prefill
            # (each chunk's causal attention spans the filled cache)
            c = self.prefill_chunk
            cache = self._empty_cache(1)
            last = None
            for off in range(0, t, c):
                piece = list(prompt_ids[off:off + c])
                n = len(piece)
                # the padded chunk must fit the cache rows [off, max_len)
                cb = c if n == c else pad_bucket(n, hi=self.max_len - off)
                piece += [0] * (cb - n)
                last, cache = self._prefill_chunk_fn(
                    self.params, cache, jnp.asarray([piece], jnp.int32),
                    jnp.int32(off), jnp.int32(n))
        else:
            bucket = pad_bucket(t, hi=self.max_len)
            padded = list(prompt_ids) + [0] * (bucket - t)
            last, cache = self._prefill_fn(
                self.params, jnp.asarray([padded], jnp.int32), jnp.int32(t))
        if self._prefix is not None:
            tb = pad_bucket(t, hi=self.max_len)
            self._prefix.store(prompt_ids,
                               self._extract_rows_fn(cache, tb=tb), t)
        return last, cache

    def _step(self, params, token, pos, cache):
        params = unpack_weights4(params)
        positions = jnp.full((token.shape[0], 1), pos, jnp.int32)
        logits, cache = decoder_forward(params, self.cfg, token, positions,
                                        kv_cache=cache, cache_len=pos)
        return logits[:, -1], cache

    def _chunk(self, params, last, pos0, cache, key, temperature, top_p,
               top_k, min_p, rep_mask, penalty, cstate, ctable, cacc, ceos,
               cdist, climit, n_steps: int, greedy: bool):
        """``n_steps`` sample+decode steps in ONE program (lax.scan):
        returns (tokens [n_steps, B], last logits, cache, key, rep_mask,
        cstate). Token semantics match the per-token loop exactly for
        greedy decoding and for sampling given the same key sequence.
        ``rep_mask [B, V]`` marks already-seen tokens for the repetition
        penalty (a bitwise no-op at penalty 1.0). ``ctable/cacc/cstate``
        (None when unconstrained; B=1 path) apply the schema-DFA logits
        mask: only tokens with a valid DFA transition survive, EOS
        (``ceos``) only in accepting states."""
        params = unpack_weights4(params)

        def step(carry, _):
            last, pos, cache, key, rep_mask, cstate = carry
            scored = apply_repetition_penalty(last, rep_mask, penalty)
            if ctable is not None:
                row = ctable[cstate]                            # [V]
                eos_col = jnp.arange(row.shape[0]) == ceos
                allowed = jnp.where(eos_col, cacc[cstate], row >= 0)
                # budget-forced completion: with `left` tokens remaining
                # (incl. this one), only transitions that can still reach
                # acceptance stay open (models/constrain.py budget_force)
                allowed = budget_force(allowed, row, cdist, climit - pos,
                                       eos_col)
                scored = jnp.where(allowed[None, :], scored, -1e30)
            if greedy:
                tok = jnp.argmax(scored, axis=-1).astype(jnp.int32)
            else:
                key, sub = jax.random.split(key)
                tok = _sample_top_p(scored / temperature, top_p, sub, top_k,
                                    min_p)
            if ctable is not None:
                cstate = jnp.where(tok[0] == ceos, cstate,
                                   jnp.maximum(ctable[cstate, tok[0]], 0))
            rep_mask = rep_mask.at[jnp.arange(tok.shape[0]), tok].set(True)
            positions = jnp.full((tok.shape[0], 1), pos, jnp.int32)
            logits, cache = decoder_forward(params, self.cfg, tok[:, None],
                                            positions, kv_cache=cache,
                                            cache_len=pos)
            return (logits[:, -1], pos + 1, cache, key, rep_mask,
                    cstate), tok

        (last, _, cache, key, rep_mask, cstate), toks = jax.lax.scan(
            step, (last, jnp.asarray(pos0, jnp.int32), cache, key, rep_mask,
                   cstate), None, length=n_steps)
        return toks, last, cache, key, rep_mask, cstate

    def generate_stream(self, prompt_ids: List[int], max_new_tokens: int = 256,
                        temperature: float = 0.0, top_p: float = 0.9,
                        eos_id: Optional[int] = None, seed: int = 0,
                        repetition_penalty: float = 1.0,
                        top_k: int = 0,
                        min_p: float = 0.0,
                        constrain: bool = False) -> Iterator[int]:
        """Yields token ids; prefill then per-token jitted decode steps.
        ``top_k > 0`` / ``min_p > 0`` add HF's top-k / min-p warpers
        around the nucleus filter (HF order: temperature → top_k → top_p
        → min_p); ``top_k == 1`` (or ``min_p == 1.0``) with any
        temperature reproduces the greedy stream. ``constrain=True``
        applies the engine's schema-DFA JSON constraint
        (models/constrain.py): every emitted token keeps the output a
        prefix of a schema-valid document, EOS unlocks at completion."""
        if constrain and self.json_constraint is None:
            raise ValueError("constrain=True requires an engine built "
                             "with json_constraint / constrain_json")
        t = len(prompt_ids)
        if t >= self.max_len:
            raise ValueError(
                f"prompt ({t} tokens) does not fit the {self.max_len}-token "
                "KV cache; truncate the prompt before generation")
        # The cache is NOT a ring: positions are absolute, and an
        # out-of-range dynamic_update_slice would silently clamp to the last
        # slot and corrupt attention state — so generation stops at capacity
        # (ADVICE r1 medium).
        budget = self.max_len - t
        if max_new_tokens > budget:
            log.warning("max_new_tokens %d exceeds cache budget %d "
                        "(prompt %d / max_len %d); clamping",
                        max_new_tokens, budget, t, self.max_len)
            max_new_tokens = budget
        with on_device(self.device):
            last, cache = self._prefill_prompt(list(prompt_ids))
            key = jax.random.PRNGKey(seed)
            greedy = not temperature > 0
            temp = jnp.float32(max(temperature, 1e-6))
            tp = jnp.float32(top_p)
            tk = jnp.int32(top_k)
            mp = jnp.float32(min_p)
            pen = jnp.float32(repetition_penalty)
            mask0 = np.zeros((1, self.cfg.vocab_size), bool)
            mask0[0, list(prompt_ids)] = True
            rep_mask = jnp.asarray(mask0)
            jc = self.json_constraint if constrain else None
            cstate = jnp.int32(jc.start) if jc else jnp.int32(0)
            ctable = jc.table if jc else None
            cacc = jc.accepting if jc else None
            cdist = jc.dist if jc else None
            climit = jnp.int32(t + max_new_tokens)
            ceos = jnp.int32(-1 if eos_id is None else eos_id)
            if jc is not None and max_new_tokens < jc.min_budget:
                log.warning(
                    "constrained stream budget %d < shortest valid "
                    "document (%d tokens); output will be a valid "
                    "prefix, not a complete document",
                    max_new_tokens, jc.min_budget)
            pos, produced = t, 0
            # full chunks via ONE scan program per launch; the sub-chunk
            # tail falls back to per-token steps so the program set stays
            # {chunk, 1} regardless of max_new_tokens
            while produced + self.decode_chunk <= max_new_tokens:
                (toks, last, cache, key, rep_mask,
                 cstate) = self._decode_chunk_fn(
                    self.params, last, pos, cache, key, temp, tp, tk, mp,
                    rep_mask, pen, cstate, ctable, cacc, ceos, cdist,
                    climit, n_steps=self.decode_chunk, greedy=greedy)
                pos += self.decode_chunk
                produced += self.decode_chunk
                for tok_host in np.asarray(toks)[:, 0].tolist():
                    if eos_id is not None and tok_host == eos_id:
                        return
                    yield int(tok_host)
            for i in range(max_new_tokens - produced):
                scored = apply_repetition_penalty(last, rep_mask, pen)
                if jc is not None:
                    row = jc.table[cstate]
                    eos_col = jnp.arange(row.shape[0]) == ceos
                    allowed = jnp.where(eos_col, jc.accepting[cstate],
                                        row >= 0)
                    allowed = budget_force(allowed, row, cdist,
                                           climit - (pos + i), eos_col)
                    scored = jnp.where(allowed[None, :], scored, -1e30)
                if greedy:
                    tok = jnp.argmax(scored, axis=-1).astype(jnp.int32)
                else:
                    key, sub = jax.random.split(key)
                    tok = _sample_top_p(scored / temp, tp, sub, tk, mp)
                rep_mask = rep_mask.at[0, tok[0]].set(True)
                if jc is not None:
                    cstate = jnp.where(tok[0] == ceos, cstate,
                                       jnp.maximum(jc.table[cstate, tok[0]],
                                                   0))
                tok_host = int(tok[0])
                if eos_id is not None and tok_host == eos_id:
                    return
                yield tok_host
                if produced + i + 1 < max_new_tokens:  # final logits unused
                    last, cache = self._decode_step(
                        self.params, tok[:, None], jnp.int32(pos + i), cache)


def apply_repetition_penalty(logits: jax.Array, seen_mask: jax.Array,
                             penalty) -> jax.Array:
    """HF ``RepetitionPenaltyLogitsProcessor`` semantics: for every token
    already seen (prompt + generated), positive logits divide by the
    penalty and negative logits multiply by it. ``penalty == 1.0`` is a
    bitwise identity, so engines apply it unconditionally with one
    program. ``logits [..., V]``, ``seen_mask [..., V]`` bool."""
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen_mask, penalized, logits)


def _top_k_filter(logits: jax.Array, top_k) -> jax.Array:
    """HF ``TopKLogitsWarper`` semantics for a single [V] row: keep the k
    highest logits, mask the rest (ties at the k-th value survive, like
    HF's ``logits < topk(logits, k)[-1]``). ``top_k <= 0`` disables — the
    row passes through bitwise, so engines apply it unconditionally.
    Applied BEFORE the nucleus filter, matching HF's warper order
    (temperature → top_k → top_p) that the reference inherits through
    ``model.generate`` (reference ``llm/client.py:336-338``)."""
    v = logits.shape[-1]
    kk = jnp.clip(top_k, 1, v)
    thr = jnp.sort(logits)[v - kk]
    return jnp.where((top_k > 0) & (logits < thr), -1e30, logits)


def _top_p_filter(logits: jax.Array, top_p: jax.Array) -> jax.Array:
    """Nucleus filter for a single [V] logits row."""
    sorted_logits = jnp.sort(logits)[::-1]
    probs = jax.nn.softmax(sorted_logits)
    cum = jnp.cumsum(probs)
    cutoff = sorted_logits[jnp.sum(cum < top_p)]
    return jnp.where(logits >= cutoff, logits, -1e30)


def _min_p_filter(logits: jax.Array, min_p) -> jax.Array:
    """HF ``MinPLogitsWarper`` semantics for a single [V] row: keep tokens
    whose probability is ≥ ``min_p`` × the top token's probability (the
    top token always survives). ``min_p <= 0`` disables (bitwise
    pass-through)."""
    probs = jax.nn.softmax(logits)
    cutoff = min_p * jnp.max(probs)
    return jnp.where((min_p > 0) & (probs < cutoff), -1e30, logits)


def _warp_filter(logits: jax.Array, top_p: jax.Array, top_k,
                 min_p=0.0) -> jax.Array:
    """The full sampling warper chain for one [V] row, in HF's order:
    top-k → top-p → min-p (temperature scaling happens at the call
    sites, before this)."""
    return _min_p_filter(
        _top_p_filter(_top_k_filter(logits, top_k), top_p), min_p)


def _sample_top_p(logits: jax.Array, top_p: float, key,
                  top_k=0, min_p=0.0) -> jax.Array:
    filtered = jax.vmap(
        lambda l: _warp_filter(l, top_p, top_k, min_p))(logits)
    return jax.random.categorical(key, filtered, axis=-1).astype(jnp.int32)
