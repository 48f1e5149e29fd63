"""Continuous batching for generation — concurrent streams, one decode loop.

The generation analogue of the retrieval micro-batcher
(retrieval/batcher.py): N concurrent SSE answer streams share ONE jitted
batched decode program instead of each paying a full per-token decode
loop. On TPU, decode is weights-bandwidth-bound — reading the model once
per step serves S slots for nearly the price of one — so aggregate
tokens/s scales with occupancy while per-stream latency stays flat. The
reference serves generation through HF ``model.generate`` per request
(reference ``llm/client.py:306-369``), i.e. sequential B=1 decoding; this
module replaces that with slot-based continuous batching, the design every
production serving stack (vLLM/TGI-class) uses, expressed TPU-natively:
static shapes, a ``lax.scan`` decode chunk per dispatch, scatter KV writes
at per-slot offsets.

Design:

- **Slots.** A fixed batch of ``n_slots`` KV rows ``[S, max_len, Hkv, D]``
  per layer. A request is admitted into a free slot, decodes as part of
  the shared batch, and frees the slot at EOS / budget / cancellation.
  All shapes static — the program set is {one prefill per bucket length,
  one decode chunk} regardless of traffic.
- **Right-pad prefill.** Prompts are padded to a bucket length and
  prefilled with B=1 into the slot's cache rows. Pad k/v land at cache
  positions ≥ true_len; every later decode step writes row ``p`` *before*
  attending ``kv_pos ≤ p``, so a pad (or stale previous-occupant) row is
  always overwritten before it can ever be attended — no pad masking or
  cache zeroing needed on slot reuse.
- **Per-slot decode.** One ``lax.scan`` of ``decode_chunk`` steps per
  dispatch (a dispatch costs ~200 ms on remote-relay backends — per-token
  loops are 8× slower wall-clock). Each step samples per-slot
  (temperature 0 = greedy, else top-p with a per-slot PRNG key chain),
  scatter-writes k/v at per-slot positions (``decoder_forward`` with a
  ``[S]`` cache_len vector), and freezes slots in-program at their EOS id
  or token budget so no stale state leaks between launches.
- **Host worker.** A daemon thread owns the device state and multiplexes:
  admit pending requests into free slots (prefill), run a decode chunk,
  fan tokens out to per-stream queues. ``generate_stream`` has the same
  contract as ``JaxDecoderLM.generate_stream`` but is thread-safe and
  concurrent.
- **Batched speculation** (``spec_k > 0``). Combines this engine with
  prompt-lookup speculative decoding (models/spec_decode.py): every slot
  keeps a token-history row, drafts the k tokens that followed the most
  recent occurrence of its current bigram, and ONE ``[S, k+1]`` forward at
  per-slot cache offsets verifies all slots' drafts simultaneously —
  per-slot acceptance, so fast-accepting streams advance k+1 positions in
  the same dispatch where others advance 1. Admission reserves ``spec_k``
  rows of KV headroom per stream.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from legalrag_tpu.models.constrain import budget_force
from legalrag_tpu.models.decoder import (DecoderConfig, PrefixKVCache,
                                         _warp_filter,
                                         apply_repetition_penalty,
                                         decoder_forward, lm_logits,
                                         pad_bucket, unpack_weights4)
from legalrag_tpu.utils import get_logger
from legalrag_tpu.utils.device import on_device
from legalrag_tpu.utils.metrics import METRICS

log = get_logger("models.batched_decoder")


def _sample_top_p_per_slot(logits: jax.Array, top_p: jax.Array,
                           top_k: jax.Array, min_p: jax.Array,
                           keys: jax.Array) -> jax.Array:
    """Per-slot warped sampling: logits [S, V], top_p/top_k/min_p [S],
    keys [S, 2]. One vmap over the shared single-row warper chain (top-k
    → nucleus → min-p, HF order) so the semantics cannot diverge between
    engines."""
    return jax.vmap(
        lambda l, tp, tk, mp, k: jax.random.categorical(
            k, _warp_filter(l, tp, tk, mp))
    )(logits, top_p, top_k, min_p, keys).astype(jnp.int32)


class _Stream:
    """Host bookkeeping for one in-flight request."""

    __slots__ = ("out", "prompt_ids", "max_new", "eos_id", "temperature",
                 "top_p", "top_k", "min_p", "seed", "produced", "cancelled",
                 "error", "repetition_penalty", "shared", "constrained")

    def __init__(self, prompt_ids, max_new, eos_id, temperature, top_p, seed,
                 repetition_penalty=1.0, top_k=0, min_p=0.0):
        self.out: "queue.Queue" = queue.Queue()
        self.prompt_ids = prompt_ids
        self.max_new = max_new
        self.eos_id = eos_id
        self.temperature = temperature
        self.top_p = top_p
        self.top_k = top_k
        self.min_p = min_p
        self.seed = seed
        self.repetition_penalty = repetition_penalty
        self.produced = 0
        self.cancelled = False
        self.error: Optional[BaseException] = None
        self.shared = False  # prompt starts with the engine's shared prefix
        self.constrained = False  # schema-DFA JSON constraint for this stream


class BatchedDecoderLM:
    """Slot-based continuous-batching wrapper around ``decoder_forward``.

    Same generation semantics as ``JaxDecoderLM`` (greedy streams are
    token-identical); any thread may call :meth:`generate_stream`
    concurrently and streams join/leave the shared batch mid-flight.
    """

    _PAD_BUCKET_MIN = 16

    def __init__(self, params: Dict, cfg: DecoderConfig, tokenizer=None,
                 device=None, max_len: int = 4096, n_slots: int = 4,
                 decode_chunk: int = 8, spec_k: int = 0, spec_steps: int = 4,
                 prefix_cache: int = 0, kv_quant: bool = False,
                 prefill_chunk: int = 1024,
                 shared_prefix: Optional[List[int]] = None,
                 json_constraint=None, ngram_draft=None, draft=None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.device = device
        self.max_len = max_len
        self.n_slots = n_slots
        # int8 KV cache (decoder.quantize_kv): the [S, max_len] slot cache
        # is the engine's HBM footprint — int8 rows buy ~2× slots or
        # context in the same budget; all cache plumbing below is generic
        # over dense 2-tuples / quantized 4-tuples per layer
        self.kv_quant = kv_quant
        self.decode_chunk = max(1, decode_chunk)
        # spec_k > 0: batched speculative decoding — every slot drafts
        # from its own prompt history and verifies k tokens per round in
        # one [S, k+1] forward at per-slot cache offsets. Streams end
        # spec_k tokens short of absolute cache capacity (each verify
        # needs k rows of KV headroom); admission clamps budgets.
        self.spec_k = spec_k
        self.spec_steps = spec_steps
        # admission prompts longer than this prefill in sequential chunks
        # at slot-row offsets (exact — each chunk attends the filled rows),
        # capping the [H, C, T] attention-score buffer like the
        # single-stream engine's prefill_chunk (decoder.py)
        self.prefill_chunk = max(prefill_chunk, 16)
        # PHYSICALLY shared system prefix: ONE pinned copy of the prefix's
        # KV rows ([1, P] per layer, built once at init) is attended by
        # every slot whose prompt starts with it (decoder_forward
        # shared_kv/kv_offset) — slot rows store only positions >= P, so
        # the engine's cache shrinks from S*max_len to S*(max_len-P)+P
        # rows. Matching prompts keep the full max_len context budget;
        # non-matching prompts get max_len-P.
        self.shared_prefix = list(shared_prefix) if shared_prefix else None
        if self.shared_prefix:
            if len(self.shared_prefix) >= max_len - 16:
                raise ValueError(
                    f"shared_prefix ({len(self.shared_prefix)} tokens) "
                    f"leaves no slot budget in max_len={max_len}")
            self.shared_len = len(self.shared_prefix)
        else:
            self.shared_len = 0
        self.slot_len = max_len - self.shared_len
        self._shared_kv = None
        # exact prompt-prefix KV reuse at admission (decoder.py
        # PrefixKVCache) — RAG requests share the system template AND, in
        # multi-turn use, the retrieved candidate blocks. COMPOSES with
        # shared_prefix: prompts matching the pinned segment use a
        # second, suffix-keyed LRU whose entries hold slot rows relative
        # to position P (the pinned segment is never duplicated into LRU
        # entries); non-matching prompts use the full-prompt LRU.
        self._prefix = PrefixKVCache(prefix_cache) if prefix_cache else None
        self._prefix_sfx = (PrefixKVCache(prefix_cache)
                            if prefix_cache and self.shared_prefix else None)

        # schema-constrained JSON decoding (models/constrain.py): one
        # engine-level schema table; streams opt in per call
        # (generate_stream(constrain=True)); per-slot DFA state, −2 =
        # unconstrained slot (mask passes through)
        self.json_constraint = json_constraint
        # corpus-level bigram → continuation drafts (models/ngram_draft.py)
        # probed when a slot's in-sequence lookup misses
        from legalrag_tpu.models.ngram_draft import resolve_ngram_draft

        self.ngram_draft = resolve_ngram_draft(ngram_draft)
        # DRAFT-MODEL speculation (draft = (params, cfg) of a small
        # decoder, see spec_decode.py): per-slot drafts come from k
        # greedy [S, 1] draft-model steps INSIDE the verify program. The
        # draft keeps its own [S, max_len] slot cache at ABSOLUTE
        # positions (no shared-prefix pinning — the draft is small, so
        # per-slot prefix rows are affordable); admission prefills the
        # slot's draft rows with the full prompt regardless of which
        # shortcut (LRU / shared / chunked) the target admission took.
        if draft is not None:
            if not spec_k:
                raise ValueError("draft model requires spec_k > 0")
            dparams, dcfg = draft
            if dcfg.vocab_size != cfg.vocab_size:
                raise ValueError(
                    f"draft model vocab {dcfg.vocab_size} != target "
                    f"vocab {cfg.vocab_size}")
            self.draft_params, self.draft_cfg = dparams, dcfg
        else:
            self.draft_params = self.draft_cfg = None
        with on_device(device):
            if self.shared_prefix:
                self._shared_kv = self._build_shared_rows()
            if self.draft_params is not None:
                dcfg = self.draft_cfg
                dt = self.draft_params["embed"].dtype
                hkv_d, dd = dcfg.num_key_value_heads, dcfg.head_dim
                self._dcache = [
                    (jnp.zeros((n_slots, max_len, hkv_d, dd), dt),
                     jnp.zeros((n_slots, max_len, hkv_d, dd), dt))
                    for _ in range(dcfg.num_hidden_layers)]
            self._cstate = jnp.full((n_slots,), -2, jnp.int32)
            self._cache = self._empty_cache()
            self._last = jnp.zeros((n_slots, cfg.vocab_size), jnp.float32)
            self._pos = jnp.zeros((n_slots,), jnp.int32)
            self._keys = jnp.zeros((n_slots, 2), jnp.uint32)
            self._rep = jnp.zeros((n_slots, cfg.vocab_size), bool)
            if spec_k:
                self._tokens = jnp.zeros((n_slots, max_len), jnp.int32)
                self._pend_tok = jnp.zeros((n_slots,), jnp.int32)

        # device state (cache/last/pos/keys) is donated through every
        # launch; the small per-slot control vectors (temp/top_p/eos/limit/
        # active) live host-side and ride each dispatch
        self._prefill_fn = jax.jit(self._prefill,
                                   donate_argnums=(1, 2, 3, 4, 5))
        self._decode_fn = jax.jit(self._decode_chunk,
                                  static_argnames=("n_steps",),
                                  donate_argnums=(1, 2, 3, 4, 5))
        if spec_k:
            self._spec_prefill_fn = jax.jit(
                self._spec_prefill, donate_argnums=(1, 2, 3, 4, 5, 6))
            dd = (1, 2, 3, 4, 5, 6) + ((24,) if draft is not None else ())
            self._spec_decode_fn = jax.jit(self._spec_decode,
                                           donate_argnums=dd)
            if draft is not None:
                self._draft_admit_fn = jax.jit(self._draft_admit_chunk,
                                               donate_argnums=(1,))
        # chunked admission: one offset-forward per chunk + a final
        # per-slot state install (plain / spec variants)
        self._offset_forward_fn = jax.jit(self._offset_forward,
                                          donate_argnums=(1,))
        self._install_state_fn = jax.jit(self._install_state,
                                         donate_argnums=(0, 1, 2, 3))
        if spec_k:
            self._spec_install_fn = jax.jit(self._spec_install,
                                            donate_argnums=(0, 1, 2, 3, 4))
        if prefix_cache:
            self._prefill_prefix_fn = jax.jit(self._prefill_prefix,
                                              donate_argnums=(1, 2, 3, 4,
                                                              5))
            self._extract_slot_rows_fn = jax.jit(self._extract_slot_rows,
                                                 static_argnames=("tb",))
            if spec_k:
                self._spec_prefill_prefix_fn = jax.jit(
                    self._spec_prefill_prefix,
                    donate_argnums=(1, 2, 3, 4, 5, 6))

        self._slots: List[Optional[_Stream]] = [None] * n_slots
        self._admitted_firsts: List = []  # spec-mode deferred first tokens
        self._pending: "deque[_Stream]" = deque()
        self._cond = threading.Condition()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="batched-decoder")
        self._worker.start()

    # ------------------------------------------------------------- factories
    @classmethod
    def from_pretrained(cls, name_or_path: str, device=None,
                        shared_prefix_text: str = "", **kw
                        ) -> "BatchedDecoderLM":
        from legalrag_tpu.models.bert import resolve_model_dir
        from legalrag_tpu.models.decoder import load_hf_decoder_params

        model_dir = resolve_model_dir(name_or_path)
        params, cfg = load_hf_decoder_params(Path(model_dir))
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(str(model_dir))
        if kw.pop("constrain_json", False) and "json_constraint" not in kw:
            from legalrag_tpu.models.constrain import (SECTIONS_SCHEMA,
                                                       JsonConstraint)

            kw["json_constraint"] = JsonConstraint.from_tokenizer(
                SECTIONS_SCHEMA, tokenizer)
        if shared_prefix_text and "shared_prefix" not in kw:
            # pin the rendered system prelude's token ids; a prompt whose
            # ids do not start with them still serves correctly (it just
            # pays its own rows), so BPE-boundary mismatch degrades to
            # the unshared path rather than to an error
            kw["shared_prefix"] = tokenizer(shared_prefix_text)["input_ids"]
        wq, wb = kw.pop("weight_quant", False), kw.pop("weight_bits", 8)
        if wq:
            from legalrag_tpu.models.decoder import quantize_weights

            params = quantize_weights(params, bits=wb)
        dm = kw.pop("draft_model", "")
        if dm:  # draft-MODEL speculation: load the small decoder too
            dparams, dcfg = load_hf_decoder_params(
                Path(resolve_model_dir(dm)))
            if wq:
                from legalrag_tpu.models.decoder import quantize_weights

                dparams = quantize_weights(dparams, bits=wb)
            if device is not None:
                dparams = jax.device_put(dparams, device)
            kw["draft"] = (dparams, dcfg)
        if device is not None:
            params = jax.device_put(params, device)
        lm = cls(params, cfg, tokenizer, device=device, **kw)
        log.info("loaded batched decoder %s (%d slots, chunk %d, max_len %d)",
                 name_or_path, lm.n_slots, lm.decode_chunk, lm.max_len)
        return lm

    # ------------------------------------------------------------- programs
    def _empty_cache(self):
        hkv, d = self.cfg.num_key_value_heads, self.cfg.head_dim
        s, t = self.n_slots, self.slot_len
        if self.kv_quant:
            return [(jnp.zeros((s, t, hkv, d), jnp.int8),
                     jnp.zeros((s, t, hkv, d), jnp.int8),
                     jnp.zeros((s, t, hkv, 1), jnp.float32),
                     jnp.zeros((s, t, hkv, 1), jnp.float32))
                    for _ in range(self.cfg.num_hidden_layers)]
        dt = self.params["embed"].dtype
        return [(jnp.zeros((s, t, hkv, d), dt),
                 jnp.zeros((s, t, hkv, d), dt))
                for _ in range(self.cfg.num_hidden_layers)]

    def _prefill(self, params, cache, last, pos, keys, rep, ids, slot,
                 true_len, key_row, mask_row):
        """B=1 prefill of ``ids`` [1, L] into ``slot``'s cache rows.

        L is the (right-padded) bucket length; the last *real* token's
        logits (index true_len-1) seed the slot's sampling state. Pad rows
        are left in the cache — see the module invariant.
        """
        params = unpack_weights4(params)
        t = ids.shape[1]
        row_cache = self._slot_rows(cache, slot)
        positions = jnp.arange(t, dtype=jnp.int32)[None, :]
        hidden, row_cache = decoder_forward(params, self.cfg, ids, positions,
                                            kv_cache=row_cache,
                                            cache_len=jnp.int32(0),
                                            return_hidden=True)
        cache = self._write_slot_rows(cache, row_cache, slot)
        hrow = jax.lax.dynamic_slice(
            hidden, (0, true_len - 1, 0), (1, 1, hidden.shape[-1]))
        last_row = lm_logits(params, self.cfg, hrow)[:, 0]
        last = jax.lax.dynamic_update_slice(
            last, last_row.astype(last.dtype), (slot, 0))
        pos = pos.at[slot].set(true_len)
        keys = keys.at[slot].set(key_row)
        rep = rep.at[slot].set(mask_row)
        return cache, last, pos, keys, rep

    @staticmethod
    def _write_slot_rows(cache, row_cache, slot):
        # generic over dense (k, v) / quantized (kq, vq, ks, vs) layers
        return [
            tuple(jax.lax.dynamic_update_slice(c, r, (slot, 0, 0, 0))
                  for c, r in zip(layer, rows))
            for layer, rows in zip(cache, row_cache)]

    def _slot_rows(self, cache, slot, tb: Optional[int] = None):
        """Slice one slot's cache rows out as a B=1 cache (first ``tb``
        rows; all of them by default)."""
        tb = self.slot_len if tb is None else tb
        return [
            tuple(jax.lax.dynamic_slice(a, (slot, 0, 0, 0),
                                        (1, tb) + a.shape[2:])
                  for a in layer)
            for layer in cache]

    def _extract_slot_rows(self, cache, slot, tb: int):
        return self._slot_rows(cache, slot, tb)

    def _constrain_first(self, scored, cs0, eos_j):
        """Schema-DFA mask for the admission-time first token: from state
        ``cs0`` (−2 = unconstrained stream, passes through) only tokens
        with a valid transition survive, EOS (``eos_j``) only if
        accepting. No-op trace when the engine has no constraint.

        Budget forcing (models/constrain.py budget_force) starts at the
        first IN-SCAN decode step, not here: at admission the full
        ``max_new`` budget remains, so forcing could only matter for
        budgets below the schema's shortest document (min_budget), which
        fall back to best-effort valid-prefix output anyway."""
        jc = self.json_constraint
        if jc is None:
            return scored
        st = jnp.maximum(cs0, 0)
        allowed = jnp.where(jnp.arange(scored.shape[0]) == eos_j,
                            jc.accepting[st], jc.table[st] >= 0)
        return jnp.where((cs0 >= 0) & ~allowed, -1e30, scored)

    def _advance_first(self, cstate, cs0, eos_j, slot, tok):
        """Install the slot's DFA state after the admission-time first
        token (``cs0`` itself for unconstrained streams)."""
        jc = self.json_constraint
        if jc is None:
            return cstate.at[slot].set(cs0)
        ncs = jnp.where((cs0 >= 0) & (tok != eos_j),
                        jnp.maximum(jc.table[jnp.maximum(cs0, 0), tok], 0),
                        cs0)
        return cstate.at[slot].set(ncs)

    def _first_token(self, logits, key_row, temp, top_p, top_k, min_p):
        """Sample the admission-time first token from prefill logits [V]
        (greedy at temp 0); returns (token, advanced key)."""
        key2, sub = jax.random.split(key_row)
        stok = jax.random.categorical(
            sub, _warp_filter(logits / jnp.maximum(temp, 1e-6), top_p,
                              top_k, min_p)).astype(jnp.int32)
        tok = jnp.where(temp > 0, stok,
                        jnp.argmax(logits).astype(jnp.int32))
        return tok, jnp.where(temp > 0, key2, key_row)

    def _shared_chunk(self, params, cache, ids, off):
        """One init-time chunk forward of the shared prefix into its own
        [1, P_pad] cache at absolute offset ``off``."""
        params = unpack_weights4(params)
        positions = (off + jnp.arange(ids.shape[1], dtype=jnp.int32))[None, :]
        _, cache = decoder_forward(params, self.cfg, ids, positions,
                                   kv_cache=cache, cache_len=off,
                                   return_hidden=True)
        return cache

    def _build_shared_rows(self):
        """Prefill the shared prefix ONCE into a [1, P] read-only KV
        segment (chunked, quantized when kv_quant) — every matching slot
        attends these rows instead of installing its own copy."""
        ids, p = self.shared_prefix, self.shared_len
        p_pad = pad_bucket(p)
        hkv, d = self.cfg.num_key_value_heads, self.cfg.head_dim
        if self.kv_quant:
            cache = [(jnp.zeros((1, p_pad, hkv, d), jnp.int8),
                      jnp.zeros((1, p_pad, hkv, d), jnp.int8),
                      jnp.zeros((1, p_pad, hkv, 1), jnp.float32),
                      jnp.zeros((1, p_pad, hkv, 1), jnp.float32))
                     for _ in range(self.cfg.num_hidden_layers)]
        else:
            dt = self.params["embed"].dtype
            cache = [(jnp.zeros((1, p_pad, hkv, d), dt),
                      jnp.zeros((1, p_pad, hkv, d), dt))
                     for _ in range(self.cfg.num_hidden_layers)]
        fwd = jax.jit(self._shared_chunk, donate_argnums=(1,))
        c = self.prefill_chunk
        for off in range(0, p, c):
            piece = list(ids[off:off + c])
            n = len(piece)
            cb = c if n == c else pad_bucket(n, hi=p_pad - off)
            piece += [0] * (cb - n)
            cache = fwd(self.params, cache,
                        jnp.asarray([piece], jnp.int32), jnp.int32(off))
        rows = [tuple(a[:, :p] for a in layer) for layer in cache]
        log.info("shared prefix pinned: %d tokens, %.1f MB KV",
                 p, sum(a.nbytes for l in rows for a in l) / 1e6)
        return rows

    def _matches_shared(self, ids: List[int]) -> bool:
        p = self.shared_len
        return bool(p and len(ids) > p and list(ids[:p]) == self.shared_prefix)

    def _install_state(self, last, pos, keys, rep, last_row, slot, total,
                       key_row, mask_row):
        """Final step of a chunked plain admission: seed the slot's
        sampling state from the last chunk's last real-token logits."""
        last = jax.lax.dynamic_update_slice(
            last, last_row.astype(last.dtype), (slot, 0))
        pos = pos.at[slot].set(total)
        keys = keys.at[slot].set(key_row)
        rep = rep.at[slot].set(mask_row)
        return last, pos, keys, rep

    def _spec_install(self, tokens, pos, keys, pending, rep, last_row,
                      full_ids, slot, total, key_row, mask_row, temp, top_p,
                      top_k, min_p, pen, cstate, cs0, eos_j):
        """Final step of a chunked spec admission: record the prompt in
        the slot's token-history row and sample the first token (under
        the prompt-mask repetition penalty and the slot's schema-DFA
        constraint when opted in)."""
        scored = apply_repetition_penalty(last_row[0], mask_row, pen)
        scored = self._constrain_first(scored, cs0, eos_j)
        tok, key_adv = self._first_token(scored, key_row, temp, top_p,
                                         top_k, min_p)
        tokens = jax.lax.dynamic_update_slice(tokens, full_ids, (slot, 0))
        tokens = tokens.at[slot, total].set(tok)
        pos = pos.at[slot].set(total)
        keys = keys.at[slot].set(key_adv)
        pending = pending.at[slot].set(tok)
        rep = rep.at[slot].set(mask_row)
        rep = rep.at[slot, tok].set(True)
        cstate = self._advance_first(cstate, cs0, eos_j, slot, tok)
        return tokens, pos, keys, pending, rep, cstate, tok

    def _chunked_slot_prefill(self, ids: List[int], slot: int,
                              shared: bool = False):
        """Sequential fixed-size chunk prefills into the slot's rows —
        numerically identical to the one-shot bucket prefill (each chunk's
        causal attention spans the already-filled rows). With ``shared``
        the prompt's first shared_len tokens are SKIPPED entirely (their
        rows are the pinned shared segment) and only the suffix forwards.
        Returns the last real token's logits [1, V] (device)."""
        c = self.prefill_chunk
        start = self.shared_len if shared else 0
        sfx = ids[start:]
        skv = self._shared_kv if shared else None
        last_row = None
        for off in range(0, len(sfx), c):
            piece = list(sfx[off:off + c])
            n = len(piece)
            cb = c if n == c else pad_bucket(n, hi=self.slot_len - off)
            piece += [0] * (cb - n)
            self._cache, last_row = self._offset_forward_fn(
                self.params, self._cache, jnp.int32(start + off),
                jnp.asarray([piece], jnp.int32), jnp.int32(slot),
                jnp.int32(n), skv)
        return last_row

    def _offset_forward(self, params, cache, p_len, ids_sfx, slot,
                        true_sfx, shared_kv=None):
        """Forward a right-padded [1, SB] chunk at ABSOLUTE offset
        ``p_len`` over the slot's already-filled rows; returns (updated
        cache, the last real chunk token's logits). The shared body of
        prefix-reuse admission AND chunked admission — a prefill chunk is
        exactly a 'suffix' over rows the previous chunk filled. With
        ``shared_kv`` the chunk also attends the pinned shared-prefix
        segment and slot rows sit at position − shared_len."""
        params = unpack_weights4(params)
        row_cache = self._slot_rows(cache, slot)
        sb = ids_sfx.shape[1]
        positions = (p_len + jnp.arange(sb, dtype=jnp.int32))[None, :]
        off = (jnp.int32(self.shared_len) if shared_kv is not None
               else None)
        hidden, row_cache = decoder_forward(params, self.cfg, ids_sfx,
                                            positions, kv_cache=row_cache,
                                            cache_len=p_len,
                                            return_hidden=True,
                                            shared_kv=shared_kv,
                                            kv_offset=off)
        cache = self._write_slot_rows(cache, row_cache, slot)
        hrow = jax.lax.dynamic_slice(
            hidden, (0, true_sfx - 1, 0), (1, 1, hidden.shape[-1]))
        return cache, lm_logits(params, self.cfg, hrow)[:, 0]

    def _prefix_forward(self, params, cache, prefix_rows, p_len, ids_sfx,
                        slot, true_sfx, shared_kv=None):
        """Shared body of the prefix-reuse admissions: install the cached
        prefix rows into the slot, forward the right-padded suffix at
        offset positions, and return (updated cache, last real logits).
        With ``shared_kv`` the entry rows are suffix-relative (position −
        shared_len) and ``p_len`` is the ABSOLUTE reuse offset."""
        row_cache = self._slot_rows(cache, slot)
        row_cache = [  # generic over dense / quantized layer tuples
            tuple(jax.lax.dynamic_update_slice(r, p, (0, 0, 0, 0))
                  for r, p in zip(rows, prows))
            for rows, prows in zip(row_cache, prefix_rows)]
        cache = self._write_slot_rows(cache, row_cache, slot)
        return self._offset_forward(params, cache, p_len, ids_sfx, slot,
                                    true_sfx, shared_kv)

    def _prefill_prefix(self, params, cache, last, pos, keys, rep,
                        prefix_rows, p_len, ids_sfx, slot, true_sfx,
                        key_row, mask_row, shared_kv=None):
        params = unpack_weights4(params)
        cache, last_row = self._prefix_forward(params, cache, prefix_rows,
                                               p_len, ids_sfx, slot,
                                               true_sfx, shared_kv)
        last = jax.lax.dynamic_update_slice(
            last, last_row.astype(last.dtype), (slot, 0))
        pos = pos.at[slot].set(p_len + true_sfx)
        keys = keys.at[slot].set(key_row)
        rep = rep.at[slot].set(mask_row)
        return cache, last, pos, keys, rep

    def _spec_prefill_prefix(self, params, cache, tokens, pos, keys,
                             pending, rep, prefix_rows, p_len, ids_sfx,
                             full_ids, slot, true_sfx, key_row, mask_row,
                             temp, top_p, top_k, min_p, pen, cstate, cs0,
                             eos_j, shared_kv=None):
        params = unpack_weights4(params)
        cache, last_row = self._prefix_forward(params, cache, prefix_rows,
                                               p_len, ids_sfx, slot,
                                               true_sfx, shared_kv)
        scored = apply_repetition_penalty(last_row[0], mask_row, pen)
        scored = self._constrain_first(scored, cs0, eos_j)
        tok, key_adv = self._first_token(scored, key_row, temp, top_p,
                                         top_k, min_p)
        total = p_len + true_sfx
        tokens = jax.lax.dynamic_update_slice(tokens, full_ids, (slot, 0))
        tokens = tokens.at[slot, total].set(tok)
        pos = pos.at[slot].set(total)
        keys = keys.at[slot].set(key_adv)
        pending = pending.at[slot].set(tok)
        rep = rep.at[slot].set(mask_row)
        rep = rep.at[slot, tok].set(True)
        cstate = self._advance_first(cstate, cs0, eos_j, slot, tok)
        return cache, tokens, pos, keys, pending, rep, cstate, tok

    def _decode_chunk(self, params, cache, last, pos, keys, rep, temp,
                      top_p, topk, minp, pen, eos_ids, limit, active,
                      offv, shared_kv, cstate, ctable, cacc, cdist,
                      n_steps: int):
        """``n_steps`` batched sample+decode steps in ONE program.

        Per step, per slot: sample a token from ``last`` (greedy when
        temp==0), emit it (-1 for frozen slots), forward with a scatter KV
        write at the slot's own position, then freeze slots that hit their
        EOS id or their ``limit`` position. Frozen slots stop advancing —
        their state is bit-frozen so join/leave between launches is exact.
        """
        params = unpack_weights4(params)
        max_len = self.max_len

        def step(carry, _):
            cache, last, pos, keys, rep, active, cstate = carry
            splits = jax.vmap(jax.random.split)(keys)        # [S, 2, 2]
            next_keys, subs = splits[:, 0], splits[:, 1]
            scored = apply_repetition_penalty(last, rep, pen[:, None])
            if ctable is not None:
                st_ = jnp.maximum(cstate, 0)
                row = ctable[st_]                            # [S, V]
                uncon = (cstate < 0)[:, None]
                iota_v = jnp.arange(row.shape[1])
                eos_col = iota_v[None, :] == eos_ids[:, None]
                allowed = jnp.where(eos_col,
                                    (cacc[st_] | (cstate < 0))[:, None],
                                    (row >= 0) | uncon)
                # budget-forced completion per slot: `limit − pos` tokens
                # remain (incl. this one); unconstrained slots (cstate<0)
                # keep their all-open mask
                forced = budget_force(allowed, row, cdist,
                                      (limit - pos)[:, None], eos_col)
                allowed = jnp.where(uncon, allowed, forced)
                scored = jnp.where(allowed, scored, -1e30)
            gtok = jnp.argmax(scored, axis=-1).astype(jnp.int32)
            scaled = scored / jnp.maximum(temp, 1e-6)[:, None]
            stok = _sample_top_p_per_slot(scaled, top_p, topk, minp, subs)
            tok = jnp.where(temp > 0, stok, gtok)
            emit = jnp.where(active, tok, -1)
            safe = jnp.minimum(pos, max_len - 1)
            logits, new_cache = decoder_forward(
                params, self.cfg, tok[:, None], safe[:, None],
                kv_cache=cache, cache_len=safe, shared_kv=shared_kv,
                kv_offset=offv)
            # frozen slots still scatter one garbage k/v row at their frozen
            # position — harmless by the module invariant (a row is always
            # rewritten before it can be attended), and far cheaper than a
            # cache-sized select per step; only the small sampling state is
            # actually frozen
            keep = active[:, None]
            last2 = jnp.where(keep, logits[:, -1], last)
            keys2 = jnp.where(keep, next_keys, keys)
            rep2 = rep.at[jnp.arange(tok.shape[0]), tok].set(True)
            hit_eos = active & (tok == eos_ids)
            if ctable is not None:
                # clamp like _advance_first: compile_token_table prunes
                # dead states, so a -1 transition is unreachable — the
                # clamp keeps a malformed table from silently flipping
                # the slot to unconstrained
                nstate = jnp.maximum(ctable[jnp.maximum(cstate, 0), tok], 0)
                cstate = jnp.where((cstate < 0) | hit_eos | ~active,
                                   cstate, nstate)
            pos2 = pos + active.astype(jnp.int32)
            active2 = active & ~hit_eos & (pos2 < limit)
            return (new_cache, last2, pos2, keys2, rep2, active2,
                    cstate), emit

        (cache, last, pos, keys, rep, active, cstate), toks = jax.lax.scan(
            step, (cache, last, pos, keys, rep, active, cstate), None,
            length=n_steps)
        return toks, cache, last, pos, keys, rep, active, cstate

    # --------------------------------------------- speculative (spec_k > 0)
    def _spec_prefill(self, params, cache, tokens, pos, keys, pending, rep,
                      ids, slot, true_len, key_row, mask_row, temp, top_p,
                      top_k, min_p, pen, cstate, cs0, eos_j):
        """Spec-mode admission: prefill the slot, record the prompt in the
        slot's token-history row, and produce the FIRST generated token
        in-program (emitted by the host at admission time). The first
        token samples under the prompt-mask repetition penalty, exactly
        like the plain engine's first decode step."""
        params = unpack_weights4(params)
        t = ids.shape[1]
        row_cache = self._slot_rows(cache, slot)
        positions = jnp.arange(t, dtype=jnp.int32)[None, :]
        hidden, row_cache = decoder_forward(params, self.cfg, ids, positions,
                                            kv_cache=row_cache,
                                            cache_len=jnp.int32(0),
                                            return_hidden=True)
        cache = self._write_slot_rows(cache, row_cache, slot)
        hrow = jax.lax.dynamic_slice(
            hidden, (0, true_len - 1, 0), (1, 1, hidden.shape[-1]))
        logits = lm_logits(params, self.cfg, hrow)[0, 0]         # [V]
        scored = apply_repetition_penalty(logits, mask_row, pen)
        scored = self._constrain_first(scored, cs0, eos_j)
        tok, key_adv = self._first_token(scored, key_row, temp, top_p,
                                         top_k, min_p)
        tokens = jax.lax.dynamic_update_slice(tokens, ids, (slot, 0))
        tokens = tokens.at[slot, true_len].set(tok)
        pos = pos.at[slot].set(true_len)
        keys = keys.at[slot].set(key_adv)
        pending = pending.at[slot].set(tok)
        rep = rep.at[slot].set(mask_row)
        rep = rep.at[slot, tok].set(True)
        cstate = self._advance_first(cstate, cs0, eos_j, slot, tok)
        return cache, tokens, pos, keys, pending, rep, cstate, tok

    def _spec_decode(self, params, cache, tokens, pos, keys, pending, rep,
                     temp, top_p, topk, minp, pen, eos_ids, limit,
                     active, offv, shared_kv, cstate, ctable, cacc,
                     nka, nkb, nvals, dparams=None, dcache=None,
                     cdist=None):
        """``spec_steps`` batched speculation rounds in ONE program.

        Vectorizes models/spec_decode.py over slots: per-slot bigram match
        over each slot's token-history row, per-slot drafts, one [S, k+1]
        verify forward at per-slot cache offsets (vector cache_len), and
        per-slot acceptance/EOS/budget freezing. ``limit`` is each slot's
        last allowed token position + 1 (admission reserves spec_k rows of
        KV headroom, so writes never clamp).
        """
        params = unpack_weights4(params)
        dparams = unpack_weights4(dparams)
        k = self.spec_k
        s, max_len = self.n_slots, self.max_len
        nsize = nka.shape[0] if nvals is not None else 0
        # per-slot ABSOLUTE capacity: shared-prefix slots span the pinned
        # segment plus their own rows; plain slots just their own rows
        capv = max_len if offv is None else self.slot_len + offv
        iota = jnp.arange(k + 1)
        idx_row = jnp.arange(max_len)[None, :]
        sidx = jnp.arange(s)

        def step(carry, _):
            if dparams is not None:
                (cache, dcache_c, tokens, pos, keys, pending, active,
                 hit_eos, rep, cstate) = carry
            else:
                (cache, tokens, pos, keys, pending, active, hit_eos, rep,
                 cstate) = carry
                dcache_c = None
            # trigram-preferred prompt lookup, source 1 (see
            # spec_decode.py — draft quality only affects acceptance,
            # never output). Full-window matches (j ≤ pos − k, the whole
            # continuation already written) are preferred per slot;
            # partial windows draft unwritten buffer beyond the overlap
            # and are kept only as a last resort (spec_decode.py).
            a_tok = tokens[sidx, jnp.maximum(pos - 1, 0)]
            a2_tok = tokens[sidx, jnp.maximum(pos - 2, 0)]
            prev = jnp.concatenate([tokens[:, :1], tokens[:, :-1]],
                                   axis=1)
            prev2 = jnp.concatenate([tokens[:, :2], tokens[:, :-2]],
                                    axis=1)
            hit2 = ((idx_row >= 1) & (idx_row < pos[:, None])
                    & (prev == a_tok[:, None])
                    & (tokens == pending[:, None]))
            hit3 = (hit2 & (idx_row >= 2) & (prev2 == a2_tok[:, None])
                    & (pos >= 2)[:, None])
            full = idx_row <= (pos - k)[:, None]
            j3f = jnp.max(jnp.where(hit3 & full, idx_row, -1), axis=1)
            j2f = jnp.max(jnp.where(hit2 & full, idx_row, -1), axis=1)
            jf = jnp.where(j3f >= 0, j3f, j2f)
            j3 = jnp.max(jnp.where(hit3, idx_row, -1), axis=1)
            j2 = jnp.max(jnp.where(hit2, idx_row, -1), axis=1)
            j = jnp.where(jf >= 0, jf, jnp.where(j3 >= 0, j3, j2))
            draft = jax.vmap(
                lambda row, jj: jax.lax.dynamic_slice(row, (jj + 1,),
                                                      (k,))
            )(tokens, j)
            havek = jf >= 0                # full-window draft per slot
            if nvals is not None:
                # source 2, corpus table for slots with no FULL
                # in-sequence window (its k-token chain beats a partial
                # window): one vectorized hash probe of the direct-mapped
                # bigram table (same uint32 Knuth hash as the host
                # builder); mismatches keep the sliced draft — both
                # paths only affect acceptance, never output
                h = ((a_tok.astype(jnp.uint32)
                      * jnp.uint32(2654435761)
                      + pending.astype(jnp.uint32))
                     & jnp.uint32(nsize - 1)).astype(jnp.int32)
                ok = (~havek) & (nka[h] == a_tok) & (nkb[h] == pending)
                draft = jnp.where(ok[:, None], nvals[h], draft)
                havek = havek | ok
            if dparams is not None:
                # source 3, DRAFT MODEL for slots whose lookup missed: k
                # greedy [S, 1] draft steps (inner lax.scan — one host
                # dispatch per round either way); per-slot selection
                # keeps lookup hits (free, high-acceptance on quoting
                # streams). Draft-cache writes here are NOT trusted — the
                # round-end catch-up below rewrites rows pos..pos+k from
                # the true verify targets, so every slot's draft cache is
                # correct below its write pointer whichever source won.
                def dstep(dc, i):
                    dcache_i, tok_i = dc
                    lgd, dcache_i = decoder_forward(
                        dparams, self.draft_cfg, tok_i[:, None],
                        (pos + i)[:, None], kv_cache=dcache_i,
                        cache_len=pos + i)
                    nxt = jnp.argmax(lgd[:, -1], axis=-1).astype(jnp.int32)
                    return (dcache_i, nxt), nxt
                (dcache_c, _), draft_t = jax.lax.scan(
                    dstep, (dcache_c, pending), iota[:k])
                draft = jnp.where((~havek)[:, None], draft_t.T, draft)
            seq = jnp.concatenate([pending[:, None], draft], axis=1)
            positions = pos[:, None] + iota[None, :]
            logits, cache = decoder_forward(params, self.cfg, seq,
                                            positions, kv_cache=cache,
                                            cache_len=pos,
                                            shared_kv=shared_kv,
                                            kv_offset=offv)
            # HF-exact repetition penalty under batched speculation: the
            # seen-set at verify position i of slot s is rep[s] plus that
            # slot's draft[0..i-1] (see spec_decode.py — for every USED
            # position the drafts before it equal the emitted tokens
            # before it). pen == 1.0 is a bitwise identity.
            v = logits.shape[-1]
            draft_seen = jnp.cumsum(
                jax.nn.one_hot(draft, v, dtype=jnp.int32), axis=1) > 0
            masks = jnp.concatenate(
                [jnp.zeros((s, 1, v), bool), draft_seen], axis=1) \
                | rep[:, None, :]
            logits = apply_repetition_penalty(logits, masks,
                                              pen[:, None, None])
            if ctable is not None:
                # schema-DFA constraint under batched speculation: the same
                # per-position state fold as spec_decode.py, vectorized over
                # slots — verify position i's allowed set follows the DFA
                # state after draft[0..i-1]. A DFA-invalid draft token
                # mismatches its own position (its masked prob is 0), so
                # positions past an invalid draft prefix are never used —
                # pass them through (state −1) rather than mask everything.
                # cstate −2 = unconstrained slot, whole row passes through.
                sts = [cstate]
                for i in range(k):
                    prev_s = sts[-1]
                    sts.append(jnp.where(
                        prev_s >= 0,
                        ctable[jnp.maximum(prev_s, 0), draft[:, i]],
                        jnp.int32(-1)))
                st_mat = jnp.stack(sts, axis=1)              # [S, k+1]
                st_c = jnp.maximum(st_mat, 0)
                row_c = ctable[st_c]                         # [S, k+1, V]
                eos_col = (jnp.arange(v)[None, None, :]
                           == eos_ids[:, None, None])
                allow = jnp.where(eos_col, cacc[st_c][:, :, None],
                                  row_c >= 0)
                # budget-forced completion: verify position i of slot s
                # writes sequence position pos+1+i, so its remaining
                # budget (incl. itself) is limit − pos − 1 − i
                left = (limit[:, None] - pos[:, None] - 1 - iota[None, :])
                allow = budget_force(allow, row_c, cdist,
                                     left[:, :, None], eos_col)
                allow = jnp.where((st_mat >= 0)[:, :, None], allow, True)
                logits = jnp.where(allow, logits, -1e30)
            gtok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            ks = jax.vmap(lambda kk: jax.random.split(kk, k + 2))(keys)
            next_keys = ks[:, 0]
            subs = ks[:, 1:].reshape(-1, 2)
            scaled = (logits / jnp.maximum(temp, 1e-6)[:, None, None]
                      ).reshape(-1, logits.shape[-1])
            stok = jax.vmap(
                lambda l, su, tp, tk, mp: jax.random.categorical(
                    su, _warp_filter(l, tp, tk, mp)))(
                scaled, subs, jnp.repeat(top_p, k + 1),
                jnp.repeat(topk, k + 1), jnp.repeat(minp, k + 1)
            ).astype(jnp.int32).reshape(s, k + 1)
            targets = jnp.where((temp > 0)[:, None], stok, gtok)
            if dparams is not None:
                # round-end draft-cache catch-up (see spec_decode.py):
                # rewrite each slot's rows pos..pos+k with the KV of
                # [pending, targets[:, :k]] — correct below the next
                # write pointer whichever draft source won; rows past it
                # are stale-by-design and rewritten before attention.
                seq_d = jnp.concatenate([pending[:, None],
                                         targets[:, :k]], axis=1)
                _, dcache_c = decoder_forward(dparams, self.draft_cfg,
                                              seq_d, positions,
                                              kv_cache=dcache_c,
                                              cache_len=pos)
            acc = jnp.cumprod((draft == targets[:, :k]).astype(jnp.int32),
                              axis=1)
            a = jnp.sum(acc, axis=1)                            # [S]
            cand = iota[None, :] <= a[:, None]
            ie = jnp.min(jnp.where(cand & (targets == eos_ids[:, None]),
                                   iota[None, :], k + 1), axis=1)
            emit_mask = (active[:, None] & cand
                         & (iota[None, :] < ie[:, None])
                         & (pos[:, None] + 1 + iota[None, :]
                            < limit[:, None]))
            emissions = jnp.where(emit_mask, targets, -1)
            n_emit = jnp.sum(emit_mask.astype(jnp.int32), axis=1)
            wr = jnp.where(emit_mask, pos[:, None] + 1 + iota[None, :],
                           max_len)
            tokens = tokens.at[sidx[:, None], wr].set(targets, mode="drop")
            rep = rep | jnp.any(
                jax.nn.one_hot(targets, rep.shape[-1], dtype=jnp.bool_)
                & emit_mask[:, :, None], axis=1)
            new_pending = jnp.take_along_axis(
                targets, jnp.minimum(a, k)[:, None], axis=1)[:, 0]
            pending = jnp.where(active & (ie > a), new_pending, pending)
            keys = jnp.where(active[:, None], next_keys, keys)
            pos = pos + jnp.where(active, n_emit, 0)
            if ctable is not None:
                # advance each slot's DFA over exactly its emitted tokens
                # (all DFA-valid by construction of the mask above);
                # unconstrained slots (−2) pass through unchanged
                cs = cstate
                for i in range(k + 1):
                    nxt = jnp.where(
                        cs >= 0,
                        ctable[jnp.maximum(cs, 0), targets[:, i]], cs)
                    cs = jnp.where(emit_mask[:, i], nxt, cs)
                cstate = cs
            step_eos = active & (ie <= a)
            hit_eos = hit_eos | step_eos
            active = (active & ~step_eos & (pos + 1 < limit)
                      & (pos + k <= capv - 1))
            if dparams is not None:
                return (cache, dcache_c, tokens, pos, keys, pending,
                        active, hit_eos, rep, cstate), emissions
            return (cache, tokens, pos, keys, pending, active,
                    hit_eos, rep, cstate), emissions

        if dparams is not None:
            carry0 = (cache, dcache, tokens, pos, keys, pending, active,
                      jnp.zeros((s,), bool), rep, cstate)
            (cache, dcache, tokens, pos, keys, pending, active, hit_eos,
             rep, cstate), emissions = \
                jax.lax.scan(step, carry0, None, length=self.spec_steps)
        else:
            carry0 = (cache, tokens, pos, keys, pending, active,
                      jnp.zeros((s,), bool), rep, cstate)
            (cache, tokens, pos, keys, pending, active, hit_eos, rep,
             cstate), emissions = \
                jax.lax.scan(step, carry0, None, length=self.spec_steps)
        return (emissions, cache, tokens, pos, keys, pending, hit_eos, rep,
                cstate, dcache)

    def _draft_admit_chunk(self, dparams, dcache, ids, slot, off, n):
        """Prefill one chunk of a slot's DRAFT-model cache rows."""
        dparams = unpack_weights4(dparams)
        row = [tuple(jax.lax.dynamic_slice(a, (slot, 0, 0, 0),
                                           (1,) + a.shape[1:])
                     for a in layer) for layer in dcache]
        t = ids.shape[1]
        positions = off + jnp.arange(t, dtype=jnp.int32)[None, :]
        _, row = decoder_forward(dparams, self.draft_cfg, ids, positions,
                                 kv_cache=row, cache_len=off)
        return [tuple(jax.lax.dynamic_update_slice(c, r, (slot, 0, 0, 0))
                      for c, r in zip(layer, rows))
                for layer, rows in zip(dcache, row)]

    def _draft_admit(self, ids: List[int], slot: int) -> None:
        """Prefill the slot's draft-model cache with the FULL prompt at
        absolute positions — independent of which shortcut the target
        admission took (LRU / shared prefix / chunked)."""
        c = self.prefill_chunk
        for off in range(0, len(ids), c):
            piece = list(ids[off:off + c])
            n = len(piece)
            cb = c if n == c else pad_bucket(n, hi=self.max_len - off)
            piece += [0] * (cb - n)
            self._dcache = self._draft_admit_fn(
                self.draft_params, self._dcache,
                jnp.asarray([piece], jnp.int32), jnp.int32(slot),
                jnp.int32(off), jnp.int32(n))

    def _spec_admit(self, st: _Stream, slot: int) -> None:
        ids = st.prompt_ids
        mask_row = np.zeros(self.cfg.vocab_size, bool)
        mask_row[ids] = True   # repetition-penalty history = the prompt
        common = (jax.random.PRNGKey(st.seed), jnp.asarray(mask_row),
                  jnp.float32(st.temperature), jnp.float32(st.top_p),
                  jnp.int32(st.top_k), jnp.float32(st.min_p),
                  jnp.float32(st.repetition_penalty))
        jc = self.json_constraint
        cs0 = jnp.int32(jc.start if (jc is not None and st.constrained)
                        else -2)
        eos_j = jnp.int32(-1 if st.eos_id is None else st.eos_id)
        hit, sfx0 = self._match_prefix(ids, st.shared)
        if hit is None and (st.shared or len(ids) > self.prefill_chunk):
            last_row = self._chunked_slot_prefill(ids, slot,
                                                  shared=st.shared)
            tb = pad_bucket(len(ids), hi=self.max_len)
            full = ids + [0] * (tb - len(ids))
            (self._tokens, self._pos, self._keys, self._pend_tok,
             self._rep, self._cstate, tok) = self._spec_install_fn(
                self._tokens, self._pos, self._keys, self._pend_tok,
                self._rep, last_row, jnp.asarray([full], jnp.int32),
                jnp.int32(slot), jnp.int32(len(ids)), *common,
                self._cstate, cs0, eos_j)
        elif hit is not None:
            rows, l, sb = hit
            tail = ids[sfx0 + l:]
            sfx = tail + [0] * (sb - len(tail))
            tb = pad_bucket(len(ids), hi=self.max_len)
            full = ids + [0] * (tb - len(ids))
            skv = self._shared_kv if st.shared else None
            (self._cache, self._tokens, self._pos, self._keys,
             self._pend_tok, self._rep, self._cstate,
             tok) = self._spec_prefill_prefix_fn(
                self.params, self._cache, self._tokens, self._pos,
                self._keys, self._pend_tok, self._rep, rows,
                jnp.int32(sfx0 + l), jnp.asarray([sfx], jnp.int32),
                jnp.asarray([full], jnp.int32), jnp.int32(slot),
                jnp.int32(len(tail)), *common, self._cstate, cs0, eos_j,
                skv)
        else:
            bucket = pad_bucket(len(ids), lo=self._PAD_BUCKET_MIN,
                                hi=self.slot_len)
            padded = ids + [0] * (bucket - len(ids))
            (self._cache, self._tokens, self._pos, self._keys,
             self._pend_tok, self._rep, self._cstate,
             tok) = self._spec_prefill_fn(
                self.params, self._cache, self._tokens, self._pos,
                self._keys, self._pend_tok, self._rep,
                jnp.asarray([padded], jnp.int32),
                jnp.int32(slot), jnp.int32(len(ids)), *common,
                self._cstate, cs0, eos_j)
        self._store_prefix(ids, slot, st.shared)
        if self.draft_params is not None:
            self._draft_admit(ids, slot)
        # do NOT sync on the first token here — the fetch happens after
        # the tick dispatches the decode launch, overlapping the round
        # trip with device execution (the slot is installed now so the
        # launch includes it; a first-token EOS discards its row)
        self._slots[slot] = st
        self._admitted_firsts.append((st, slot, tok))

    # --------------------------------------------------------------- worker
    def _match_prefix(self, ids: List[int], shared: bool):
        """LRU probe for admission: (hit, key offset). Shared-matching
        prompts probe the suffix-keyed LRU (entry rows are relative to
        the pinned segment, key = ids[P:]); others the full-prompt LRU.
        Hits whose remaining suffix exceeds prefill_chunk are dropped —
        the chunked cold path caps admission memory instead."""
        if shared:
            lru, sfx0 = self._prefix_sfx, self.shared_len
        else:
            lru, sfx0 = self._prefix, 0
        if lru is None:
            return None, sfx0
        hit = lru.match(ids[sfx0:], self.slot_len)
        if hit is not None and len(ids) - sfx0 - hit[1] > self.prefill_chunk:
            hit = None
        return hit, sfx0

    def _store_prefix(self, ids: List[int], slot: int,
                      shared: bool = False) -> None:
        lru = self._prefix_sfx if shared else self._prefix
        if lru is None:
            return
        key = ids[self.shared_len:] if shared else ids
        tb = pad_bucket(len(key), hi=self.slot_len)
        rows = self._extract_slot_rows_fn(self._cache, jnp.int32(slot),
                                          tb=tb)
        lru.store(key, rows, len(key))

    def _admit(self, st: _Stream, slot: int) -> None:
        ids = st.prompt_ids
        mask_row = np.zeros(self.cfg.vocab_size, bool)
        mask_row[ids] = True   # repetition-penalty history = the prompt
        hit, sfx0 = self._match_prefix(ids, st.shared)
        if hit is None and (st.shared or len(ids) > self.prefill_chunk):
            last_row = self._chunked_slot_prefill(ids, slot,
                                                  shared=st.shared)
            (self._last, self._pos, self._keys,
             self._rep) = self._install_state_fn(
                self._last, self._pos, self._keys, self._rep, last_row,
                jnp.int32(slot), jnp.int32(len(ids)),
                jax.random.PRNGKey(st.seed), jnp.asarray(mask_row))
        elif hit is not None:
            rows, l, sb = hit
            tail = ids[sfx0 + l:]
            sfx = tail + [0] * (sb - len(tail))
            skv = self._shared_kv if st.shared else None
            (self._cache, self._last, self._pos, self._keys,
             self._rep) = self._prefill_prefix_fn(
                    self.params, self._cache, self._last, self._pos,
                    self._keys, self._rep, rows, jnp.int32(sfx0 + l),
                    jnp.asarray([sfx], jnp.int32), jnp.int32(slot),
                    jnp.int32(len(tail)), jax.random.PRNGKey(st.seed),
                    jnp.asarray(mask_row), skv)
        else:
            bucket = pad_bucket(len(ids), lo=self._PAD_BUCKET_MIN,
                                hi=self.slot_len)
            padded = ids + [0] * (bucket - len(ids))
            (self._cache, self._last, self._pos, self._keys,
             self._rep) = self._prefill_fn(
                    self.params, self._cache, self._last, self._pos,
                    self._keys, self._rep, jnp.asarray([padded], jnp.int32),
                    jnp.int32(slot), jnp.int32(len(ids)),
                    jax.random.PRNGKey(st.seed), jnp.asarray(mask_row))
        self._store_prefix(ids, slot, st.shared)
        self._cstate = self._cstate.at[slot].set(
            jnp.int32(self.json_constraint.start if st.constrained else -2))
        self._slots[slot] = st

    def _control_vectors(self):
        s = self.n_slots
        temp = np.zeros(s, np.float32)
        top_p = np.full(s, 0.9, np.float32)
        topk = np.zeros(s, np.int32)
        minp = np.zeros(s, np.float32)
        offv = np.zeros(s, np.int32)
        pen = np.ones(s, np.float32)
        eos = np.full(s, -1, np.int32)
        limit = np.zeros(s, np.int32)
        active = np.zeros(s, bool)
        for i, st in enumerate(self._slots):
            if st is None:
                continue
            temp[i] = st.temperature
            top_p[i] = st.top_p
            topk[i] = st.top_k
            minp[i] = st.min_p
            pen[i] = st.repetition_penalty
            eos[i] = -1 if st.eos_id is None else st.eos_id
            cap = self.max_len if st.shared else self.slot_len
            limit[i] = min(len(st.prompt_ids) + st.max_new, cap)
            offv[i] = self.shared_len if st.shared else 0
            active[i] = True
        return (jnp.asarray(temp), jnp.asarray(top_p), jnp.asarray(topk),
                jnp.asarray(minp), jnp.asarray(pen), jnp.asarray(eos),
                jnp.asarray(limit), jnp.asarray(active),
                jnp.asarray(offv) if self.shared_len else None)

    def _finish(self, slot: int) -> None:
        st = self._slots[slot]
        if st is not None:
            st.out.put(None)
            self._slots[slot] = None

    def _run(self) -> None:
        while True:
            with self._cond:
                while (not self._closed and not self._pending
                       and not any(s is not None for s in self._slots)):
                    self._cond.wait()
                if self._closed:
                    for st in self._pending:
                        st.out.put(None)
                    self._pending.clear()
                    for i in range(self.n_slots):
                        self._finish(i)
                    return
                pending, self._pending = self._pending, deque()
            try:
                with on_device(self.device):
                    self._tick(pending)
            except BaseException as e:  # pragma: no cover - defensive
                log.exception("batched decoder worker error: %s", e)
                for st in list(pending):
                    st.error = e
                    st.out.put(None)
                self._admitted_firsts.clear()
                for i in range(self.n_slots):
                    st = self._slots[i]
                    if st is not None:
                        st.error = e
                    self._finish(i)

    def _tick(self, pending: "deque[_Stream]") -> None:
        # drop cancelled streams (client disconnected mid-generation)
        for i, st in enumerate(self._slots):
            if st is not None and st.cancelled:
                self._finish(i)
        while pending and pending[0].cancelled:
            pending.popleft().out.put(None)
        # admissions: fill free slots with waiting requests; an admission
        # failure fails only that stream (a popped stream would otherwise
        # be invisible to the worker's outer error handler)
        for i in range(self.n_slots):
            if not pending:
                break
            if self._slots[i] is None:
                st = pending.popleft()
                try:
                    if self.spec_k:
                        self._spec_admit(st, i)
                    else:
                        self._admit(st, i)
                except BaseException as e:
                    log.exception("admission failed: %s", e)
                    st.error = e
                    st.out.put(None)
                    self._slots[i] = None
        if pending:  # no free slot — requeue, served as slots free up
            with self._cond:
                pending.extend(self._pending)
                self._pending = pending
        if not any(s is not None for s in self._slots):
            return
        (temp, top_p, topk, minp, pen, eos, limit, active,
         offv) = self._control_vectors()
        skv = self._shared_kv if self.shared_len else None
        occ = sum(s is not None for s in self._slots)
        engine = "batched-spec" if self.spec_k else "batched"
        METRICS.inc("legalrag_gen_launches", engine=engine,
                    occupancy=occ)
        if self.spec_k:
            jc = self.json_constraint
            ng = (self.ngram_draft.device_arrays(self.spec_k)
                  if self.ngram_draft is not None else (None, None, None))
            (em, self._cache, self._tokens, self._pos, self._keys,
             self._pend_tok, hit_eos, self._rep, self._cstate,
             dcache) = self._spec_decode_fn(
                self.params, self._cache, self._tokens, self._pos,
                self._keys, self._pend_tok, self._rep, temp, top_p, topk,
                minp, pen, eos, limit, active, offv, skv, self._cstate,
                jc.table if jc else None, jc.accepting if jc else None,
                *ng, self.draft_params,
                self._dcache if self.draft_params is not None else None,
                cdist=jc.dist if jc else None)
            if self.draft_params is not None:
                self._dcache = dcache
            # deferred admission first tokens: the int() syncs overlap the
            # decode execution just dispatched above
            for st, slot, tok_dev in self._admitted_firsts:
                if self._slots[slot] is not st:
                    continue
                first = int(tok_dev)
                if st.eos_id is not None and first == st.eos_id:
                    self._finish(slot)   # discards this launch's row
                    continue
                st.produced = 1
                METRICS.inc("legalrag_gen_tokens", 1, engine="batched-spec")
                if not st.cancelled:
                    st.out.put(first)
                if st.produced >= st.max_new:
                    self._finish(slot)
            self._admitted_firsts.clear()
            em_host = np.asarray(em)                 # [spec_steps, S, k+1]
            eos_host = np.asarray(hit_eos)
            n_launch_toks = 0
            for i, st in enumerate(self._slots):
                if st is None:
                    continue
                for r in range(em_host.shape[0]):
                    emitted_row = False
                    for t in em_host[r, i].tolist():
                        if t < 0:
                            break
                        emitted_row = True
                        st.produced += 1
                        n_launch_toks += 1
                        if not st.cancelled:
                            st.out.put(int(t))
                    if emitted_row:
                        METRICS.inc("legalrag_gen_spec_rounds",
                                    engine="batched-spec")
                if bool(eos_host[i]) or st.produced >= st.max_new:
                    self._finish(i)
            METRICS.inc("legalrag_gen_tokens", n_launch_toks,
                        engine="batched-spec")
            return
        jc = self.json_constraint
        (toks, self._cache, self._last, self._pos, self._keys,
         self._rep, _, self._cstate) = \
            self._decode_fn(self.params, self._cache, self._last, self._pos,
                            self._keys, self._rep, temp, top_p, topk, minp,
                            pen, eos, limit, active, offv, skv,
                            self._cstate,
                            jc.table if jc else None,
                            jc.accepting if jc else None,
                            jc.dist if jc else None,
                            n_steps=self.decode_chunk)
        toks_host = np.asarray(toks)                         # [n_steps, S]
        n_launch_toks = 0
        for i, st in enumerate(self._slots):
            if st is None:
                continue
            for t in toks_host[:, i].tolist():
                if t < 0:
                    break
                if st.eos_id is not None and t == st.eos_id:
                    self._finish(i)
                    break
                st.produced += 1
                n_launch_toks += 1
                if not st.cancelled:
                    st.out.put(int(t))
                if st.produced >= st.max_new:
                    self._finish(i)
                    break
        METRICS.inc("legalrag_gen_tokens", n_launch_toks, engine="batched")

    # ------------------------------------------------------------------ API
    def generate_stream(self, prompt_ids: List[int],
                        max_new_tokens: int = 256, temperature: float = 0.0,
                        top_p: float = 0.9, eos_id: Optional[int] = None,
                        seed: int = 0,
                        repetition_penalty: float = 1.0,
                        top_k: int = 0,
                        min_p: float = 0.0,
                        constrain: bool = False) -> Iterator[int]:
        """Same contract as ``JaxDecoderLM.generate_stream``, but any number
        of threads may stream concurrently — requests join the shared batch
        as slots free up (FIFO admission). ``constrain=True`` applies the
        engine's schema-DFA JSON constraint to this stream (per-slot DFA
        states; unconstrained streams share the batch untouched)."""
        if constrain and self.json_constraint is None:
            raise ValueError("constrain=True requires an engine built "
                             "with json_constraint / constrain_json")
        t = len(prompt_ids)
        shared = self._matches_shared(prompt_ids)
        cap = self.max_len if shared else self.slot_len
        if t >= cap:
            raise ValueError(
                f"prompt ({t} tokens) does not fit the {cap}-token "
                "budget (shared prefix matched: "
                f"{shared}); truncate the prompt before generation")
        # spec mode reserves spec_k rows of KV headroom (every verify
        # writes k rows past the last accepted position)
        budget = cap - t - self.spec_k
        if budget < 1:
            raise ValueError(
                f"prompt ({t} tokens) leaves no budget in the "
                f"{self.max_len}-token cache with spec_k={self.spec_k}")
        if max_new_tokens > budget:
            log.warning("max_new_tokens %d exceeds cache budget %d "
                        "(prompt %d / cap %d / spec_k %d); clamping",
                        max_new_tokens, budget, t, cap, self.spec_k)
            max_new_tokens = budget
        st = _Stream(list(prompt_ids), max_new_tokens, eos_id,
                     temperature, top_p, seed, repetition_penalty, top_k,
                     min_p)
        st.shared = shared
        st.constrained = constrain
        with self._cond:
            if self._closed:
                raise RuntimeError("BatchedDecoderLM is closed")
            self._pending.append(st)
            self._cond.notify()
        try:
            while True:
                # liveness guard: poll in short slices and check the
                # worker thread is alive — a healthy COLD start can take
                # up to ~12 min loading programs onto a remote relay
                # (docs/operations.md), so a fixed short timeout would
                # spuriously kill first streams; a dead worker fails fast
                waited = 0.0
                while True:
                    try:
                        item = st.out.get(timeout=30)
                        break
                    except queue.Empty:
                        waited += 30
                        if not self._worker.is_alive():
                            raise RuntimeError(
                                "decode worker died") from st.error
                        if waited >= 1800:
                            raise RuntimeError(
                                "generation stalled for 30 minutes")
                if item is None:
                    if st.error is not None:
                        raise RuntimeError(
                            "generation failed") from st.error
                    return
                yield item
        finally:
            st.cancelled = True  # GeneratorExit / early close frees the slot

    def close(self) -> None:
        """Stop the worker thread and fail open streams. Idempotent."""
        with self._cond:
            self._closed = True
            self._cond.notify()
        self._worker.join(timeout=30)
