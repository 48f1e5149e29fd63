"""Tensor-parallel decoder serving — Megatron-style TP via GSPMD.

Shards the decoder's weight matrices over the mesh ``model`` axis with
``NamedSharding`` annotations and lets XLA's SPMD partitioner insert the
collectives: attention q/k/v projections split by head (column parallel),
the o-projection row parallel (one psum per layer), the MLP gate/up column
parallel and down row parallel (second psum), the LM head vocab parallel.
No code in the forward changes — ``decoder_forward`` is sharding-agnostic;
placement alone (this module) turns single-chip generation into TP
generation, the same way the retrieval engine's ``shard_views`` turns a
single-chip index into a sharded one. Replaces the scale-up story the
reference delegates to HF ``device_map`` (reference ``llm/client.py:146``,
torch layer-offload, not tensor parallelism).

GQA caveat: the KV cache shards over the kv-head axis only when
``num_key_value_heads % model_axis == 0`` — otherwise the cache and k/v
projections replicate (still correct; XLA all-gathers q-heads' reads).
The expert axis of MoE layers shards over the same ``model`` axis (EP),
matching ``_moe_block``'s design.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from legalrag_tpu.models.decoder import DecoderConfig
from legalrag_tpu.parallel.mesh import MODEL_AXIS
from legalrag_tpu.utils import get_logger

log = get_logger("parallel.decoder_tp")


def _spec_for(path: str, ndim: int, cfg: DecoderConfig, tp: int) -> P:
    """PartitionSpec for one decoder param leaf, by its name path."""
    # shard by whole heads — splitting a head's d-dim across shards is
    # still correct under GSPMD but forces a reshard inside attention
    col = cfg.num_attention_heads % tp == 0
    kv_col = cfg.num_key_value_heads % tp == 0
    # plain gate/up/down leaves exist only on DENSE layers (in MoE models
    # too: Qwen2-MoE mixes dense and sparse layers), so their sharding
    # gates on intermediate_size; stacked expert weights take the ndim==3
    # branch below. (A real Mixtral config has no moe_intermediate_size —
    # never read it here.)
    ff_col = cfg.intermediate_size % tp == 0
    # int8 weight quantization (decoder.quantize_weights_int8): kernel_q
    # shards exactly like kernel; the per-output-channel scale [O] shards
    # like a bias on column-parallel nodes and replicates on row-parallel
    # ones (o/down, whose output dim is unsharded). kernel_q4p (the
    # nibble-packed int4 carrier, [I/2, O]) shards like kernel too: the
    # packed axis is pairwise-local, so an axis-0 shard of the carrier
    # unpacks to exactly the matching axis-0 shard of the s4 kernel.
    path = path.replace("kernel_q4p", "kernel").replace("kernel_q",
                                                        "kernel")
    # int4 grouped scales are ndim-2 [I/g, O]: the group axis follows the
    # kernel's input dim (row-parallel shards it), the channel axis
    # follows the output dim (column-parallel shards it)
    if ndim == 2 and path.endswith("kernel_scale"):
        if path.endswith("q.kernel_scale"):
            return P(None, MODEL_AXIS) if col else P()
        if path.endswith(("k.kernel_scale", "v.kernel_scale")):
            return P(None, MODEL_AXIS) if kv_col else P()
        if path.endswith("o.kernel_scale"):
            return P(MODEL_AXIS, None) if col else P()
        if path.endswith(("gate.kernel_scale", "up.kernel_scale")):
            return P(None, MODEL_AXIS) if ff_col else P()
        if path.endswith("down.kernel_scale"):
            return P(MODEL_AXIS, None) if ff_col else P()
        if path.endswith("lm_head.kernel_scale"):
            return P(None, MODEL_AXIS) if cfg.vocab_size % tp == 0 else P()
    if path.endswith("q.kernel"):
        return P(None, MODEL_AXIS) if col else P()
    if path.endswith(("k.kernel", "v.kernel")):
        return P(None, MODEL_AXIS) if kv_col else P()
    if path.endswith(("q.bias", "q.kernel_scale")):
        return P(MODEL_AXIS) if col else P()
    if path.endswith(("k.bias", "v.bias", "k.kernel_scale",
                      "v.kernel_scale")):
        return P(MODEL_AXIS) if kv_col else P()
    if path.endswith("o.kernel"):
        return P(MODEL_AXIS, None) if col else P()
    if path.endswith(("gate.kernel", "up.kernel")):
        return P(None, MODEL_AXIS) if ff_col else P()
    if path.endswith(("gate.kernel_scale", "up.kernel_scale")):
        return P(MODEL_AXIS) if ff_col else P()
    if path.endswith("down.kernel"):
        return P(MODEL_AXIS, None) if ff_col else P()
    # MoE stacked experts: shard the leading expert axis (EP) — dense
    # [E, I, O] stacks and their int8 twins (gate_q/up_q/down_q) alike
    if ".moe." in path and ndim == 3:
        return P(MODEL_AXIS, None, None) if cfg.num_experts % tp == 0 \
            else P()
    # per-(expert, channel) scales of quantized stacks: [E, O] — shard
    # the expert axis with the stack (shared-expert scales are ndim 1
    # and replicate via the fallthrough)
    if ".moe." in path and path.endswith("_scale") and ndim == 2:
        return P(MODEL_AXIS, None) if cfg.num_experts % tp == 0 else P()
    if path.endswith("lm_head"):
        return P(None, MODEL_AXIS) if cfg.vocab_size % tp == 0 else P()
    if path.endswith("lm_head.kernel"):
        return P(None, MODEL_AXIS) if cfg.vocab_size % tp == 0 else P()
    if path.endswith("lm_head.kernel_scale"):
        return P(MODEL_AXIS) if cfg.vocab_size % tp == 0 else P()
    return P()  # embed, norms, routers, o/down scales: replicate


def shard_decoder_params(params: Dict, cfg: DecoderConfig, mesh: Mesh
                         ) -> Dict:
    """``device_put`` every decoder param with its TP sharding."""
    tp = mesh.shape[MODEL_AXIS]

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}.{k}" if path else k)
                    for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, f"{path}.{i}") for i, v in enumerate(tree)]
        spec = _spec_for(path, getattr(tree, "ndim", 0), cfg, tp)
        # drop shardings the leaf's shape cannot honor (e.g. an int4
        # scale with fewer groups than shards): replicate instead
        if any(s is not None and tree.shape[d] % tp
               for d, s in enumerate(spec)):
            spec = P()
        return jax.device_put(tree, NamedSharding(mesh, spec))

    sharded = walk(params, "")
    log.info("decoder params sharded over %d-way %s axis", tp, MODEL_AXIS)
    return sharded


def tp_kv_cache_sharding(cfg: DecoderConfig, mesh: Mesh
                         ) -> Optional[NamedSharding]:
    """Sharding for KV cache arrays [B, S, Hkv, D] — kv-head parallel when
    divisible, else None (replicate)."""
    tp = mesh.shape[MODEL_AXIS]
    if cfg.num_key_value_heads % tp == 0:
        return NamedSharding(mesh, P(None, None, MODEL_AXIS, None))
    return None


def apply_tp_to_engine(engine, mesh: Mesh) -> None:
    """Tensor-parallelize a decode engine in place: shard its params and,
    for engines holding a persistent slot cache (BatchedDecoderLM), place
    the cache kv-head-parallel too. The k/v projections are head-sharded,
    so a replicated persistent cache would force GSPMD to reshard it on
    every decode launch; explicit placement keeps the cache resident on
    the axis that produces it. Cache layers are generic tuples (dense
    (k, v) / quantized (kq, vq, ks, vs)); every member is [S, T, Hkv, *],
    so one head-axis spec covers all. Single-stream engines create their
    cache inside the jitted prefill — nothing to place there. The paged
    engine's block pools ([NB, BS, Hkv, *] per layer, models/
    paged_decoder.py) carry the head axis in the same position, so the
    same spec places them.

    Must run BEFORE the first stream is admitted: the cache/pool arrays
    are donated into the engine's jitted prefill/decode programs, so
    swapping them while streams are in flight would race with the
    donation of the old buffers (the engine lock is not taken here)."""
    slots = getattr(engine, "_slots", None)
    if slots is not None and any(s is not None for s in slots):
        raise RuntimeError(
            "apply_tp_to_engine must run before any stream is admitted "
            f"({sum(s is not None for s in slots)} active slots)")
    engine.params = shard_decoder_params(engine.params, engine.cfg, mesh)
    sharding = tp_kv_cache_sharding(engine.cfg, mesh)
    if sharding is None:
        return
    if getattr(engine, "_cache", None) is not None:
        engine._cache = [
            tuple(jax.device_put(a, sharding) for a in layer)
            for layer in engine._cache]
        log.info("engine slot cache placed kv-head-parallel")
    if getattr(engine, "_pools", None) is not None:
        engine._pools = [
            tuple(jax.device_put(a, sharding) for a in layer)
            for layer in engine._pools]
        log.info("paged block pools placed kv-head-parallel")
