"""Paged KV cache with radix-tree prefix sharing — vLLM/SGLang-class
serving memory management, expressed TPU-natively.

The contiguous engines (models/batched_decoder.py) give every slot a
private ``max_len`` stripe of KV rows: S slots cost S×max_len rows of
HBM even when every request carries the same system prelude + few-shot
block, and cross-request reuse needs two special mechanisms (the pinned
``shared_prefix`` segment and the ``prefix_cache`` LRU, which COPIES
rows into the admitting slot). This engine replaces the stripe with a
single block POOL and subsumes both mechanisms:

- **Block pool.** Per layer, one batch-free ``[NB, BS, Hkv, D]`` k/v
  pool (``BS`` = block_size tokens). A stream's cache is a per-slot
  block TABLE ``[MAXB]`` of pool indices; absolute position ``p`` lives
  at ``pool[table[p // BS], p % BS]``. Each LAUNCH gathers every slot's
  table into a contiguous ``[S, MAXB*BS]`` view once, runs the plain
  contiguous decode/verify scan over it (so the attention math, sliding
  windows, and the int8 KV-quant path are shared with every other
  engine, not re-implemented), and scatters only the written block
  window back (a sentinel table entry of NB drops writes) — see the
  gather/compute/scatter note at ``_gather_pools``; per-step table
  indirection measured 0.06x of contiguous on TPU and was removed.
- **Radix tree.** Full blocks of PROMPT tokens are published to a host-
  side radix tree keyed by BS-token chunks. Admission walks the tree:
  every matched block is attached to the new stream's table by
  REFERENCE — zero prefill compute, zero copies, one physical copy of
  the KV no matter how many concurrent streams share it. KV sharing is
  sound exactly when the entire token prefix matches, which is what the
  root-to-node path encodes. The tree retains blocks after streams
  finish (refcount 0) as an eviction-ready cache, so the next request
  with the same system template + candidate blocks prefills only its
  unique suffix — ``prefix_cache``'s win without the row copies, and
  ``shared_prefix``'s win without pre-declaring the prefix.
- **Reservation-based admission.** A stream is admitted only when
  ``free + evictable − reserved`` blocks cover its worst-case budget
  (prompt + clamped max_new). Mid-decode allocation therefore never
  fails: the host tops up each slot's table ahead of every decode chunk
  from its reservation, evicting least-recently-used refcount-0 tree
  blocks as needed. Streams that do not fit wait in the pending queue
  (FIFO; admission order is preserved so large requests cannot starve).

Generation semantics are identical to the plain continuous-batching
engine (greedy streams are token-identical to ``JaxDecoderLM`` — the
parity contract in tests/test_paged_decoder.py): per-slot temperature /
top-p / top-k / min-p sampling via the shared ``_warp_filter`` chain,
HF-exact repetition penalty, per-slot EOS/budget freezing inside the
``lax.scan`` decode chunk, and per-slot schema-DFA constrained decoding
(``generate_stream(constrain=True)`` with an engine-level
``json_constraint`` — the same token-table mask as the contiguous
engines, carried as a per-slot DFA state through the decode scan).

**Speculation over block tables** (``spec_k > 0``): the batched
speculative rounds (models/batched_decoder.py ``_spec_decode`` — per-
slot trigram-preferred prompt lookup, optional corpus n-gram table,
optional draft MODEL, one [S, k+1] verify forward, per-slot acceptance)
run unchanged through the paged pools: the verify forward writes the
k+1 candidate KV rows into the launch's contiguous gathered view
(vector ``cache_len``), and rejected rows are simply
rewritten by the next round — the same trust rule as the contiguous
engine, no block-level bookkeeping needed. Admission reserves
``ceil((limit + spec_k) / block_size)`` blocks so verify writes never
cross a slot's table coverage, and the host tops tables up to the
launch's worst-case write horizon before every spec launch. Output is
token-identical to the plain paged engine (draft quality only affects
acceptance) — the parity contract in tests/test_paged_spec.py.

Reference being replaced: HF ``model.generate`` per request (reference
``llm/client.py:306-369``) — which re-prefills the full prompt every
request and holds per-request contiguous caches. Paged attention +
radix caching is the production-serving design (vLLM PagedAttention,
SGLang RadixAttention) built here on XLA scatter/gather with static
shapes rather than CUDA kernels.
"""

from __future__ import annotations

import queue
import threading
from collections import OrderedDict, deque
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from legalrag_tpu.models.constrain import budget_force
from legalrag_tpu.models.batched_decoder import (BatchedDecoderLM,
                                                 _sample_top_p_per_slot)
from legalrag_tpu.models.decoder import (DecoderConfig, _warp_filter,
                                         apply_repetition_penalty,
                                         decoder_forward, lm_logits,
                                         pad_bucket, unpack_weights4)
from legalrag_tpu.utils import get_logger
from legalrag_tpu.utils.device import on_device
from legalrag_tpu.utils.metrics import METRICS

log = get_logger("models.paged_decoder")


class _Node:
    """Radix-tree node: one published full block of prompt KV."""

    __slots__ = ("key", "block_id", "refs", "children", "parent")

    def __init__(self, key: Tuple[int, ...], block_id: int, parent):
        self.key = key
        self.block_id = block_id
        self.refs = 0
        self.children: Dict[Tuple[int, ...], "_Node"] = {}
        self.parent = parent


class _RadixIndex:
    """Host-side radix tree over BS-token chunks + pool free-list with
    LRU eviction of refcount-0 nodes.

    Invariant: a node with refs > 0 never has a refs == 0 ancestor
    (matching increfs the whole root→node path), so every refcount-0
    node's subtree is entirely refcount-0 and safe to evict as a unit.
    """

    def __init__(self, n_blocks: int, block_size: int):
        self.bs = block_size
        self.root = _Node((), -1, None)
        self.free: deque = deque(range(n_blocks))
        # LRU over refcount-0 nodes: insertion order = least recent first
        self.zeroref: "OrderedDict[_Node, None]" = OrderedDict()
        self.reserved = 0          # blocks promised to admitted streams
        self.reused_blocks = 0     # lifetime stats (paged_stats)
        self.evicted_blocks = 0

    # ------------------------------------------------------------- matching
    def match(self, ids: List[int]) -> List[_Node]:
        """Longest published-block chain covering a strict prefix of
        ``ids`` (at least one suffix token is always left to forward, so
        admission has logits to seed sampling from)."""
        limit = (len(ids) - 1) // self.bs
        path: List[_Node] = []
        node = self.root
        for j in range(limit):
            child = node.children.get(tuple(ids[j * self.bs:(j + 1) * self.bs]))
            if child is None:
                break
            path.append(child)
            node = child
        return path

    def incref(self, nodes: List[_Node]) -> None:
        for n in nodes:
            if n.refs == 0:
                self.zeroref.pop(n, None)
            n.refs += 1

    def decref(self, nodes: List[_Node]) -> None:
        for n in nodes:
            n.refs -= 1
            if n.refs == 0:
                self.zeroref[n] = None       # newest = last evicted

    # ----------------------------------------------------------- allocation
    @property
    def evictable(self) -> int:
        return len(self.zeroref)

    def available(self) -> int:
        return len(self.free) + self.evictable - self.reserved

    def alloc(self) -> int:
        """One block from the free list, evicting LRU refcount-0 tree
        blocks if empty. Callers draw against a prior reservation, so
        exhaustion here is a bug, not a load condition."""
        if not self.free:
            self._evict_one()
        return self.free.popleft()

    def _evict_one(self) -> None:
        if not self.zeroref:
            raise RuntimeError("paged KV pool exhausted despite "
                               "reservation accounting")
        node, _ = self.zeroref.popitem(last=False)
        # the whole subtree is refcount-0 (class invariant): evict it
        stack = [node]
        while stack:
            n = stack.pop()
            for c in n.children.values():
                self.zeroref.pop(c, None)
                stack.append(c)
            self.free.append(n.block_id)
            self.evicted_blocks += 1
        if node.parent is not None:
            node.parent.children.pop(node.key, None)

    def publish(self, parent: _Node, key: Tuple[int, ...],
                block_id: int) -> Optional[_Node]:
        """Insert a freshly prefilled full prompt block under ``parent``.
        If a concurrent stream already published the same chunk, keep
        theirs (ours stays a private block, freed at stream end)."""
        if key in parent.children:
            return None
        node = _Node(key, block_id, parent)
        node.refs = 1
        parent.children[key] = node
        return node


class _Stream:
    """Host bookkeeping for one in-flight request."""

    __slots__ = ("out", "prompt_ids", "max_new", "eos_id", "temperature",
                 "top_p", "top_k", "min_p", "seed", "produced", "cancelled",
                 "error", "repetition_penalty", "path", "private",
                 "reserve", "n_blocks", "limit", "constrained")

    def __init__(self, prompt_ids, max_new, eos_id, temperature, top_p,
                 seed, repetition_penalty=1.0, top_k=0, min_p=0.0):
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
        self.constrained = False  # schema-DFA JSON constraint opt-in
        self.path: List[_Node] = []      # radix nodes this stream refs
        self.private: List[int] = []     # block ids owned outright
        self.reserve = 0                 # blocks still drawable
        self.n_blocks = 0                # table entries filled so far
        self.limit = 0                   # last allowed position + 1


class PagedDecoderLM:
    """Continuous batching over a paged KV pool with radix prefix reuse.

    Same ``generate_stream`` contract as ``BatchedDecoderLM``; greedy
    streams are token-identical to the contiguous engines.
    """

    _PAD_BUCKET_MIN = 16

    def __init__(self, params: Dict, cfg: DecoderConfig, tokenizer=None,
                 device=None, max_len: int = 4096, n_slots: int = 4,
                 decode_chunk: int = 8, block_size: int = 64,
                 pool_blocks: int = 0, prefill_chunk: int = 1024,
                 kv_quant: bool = False, json_constraint=None,
                 spec_k: int = 0, spec_steps: int = 4, ngram_draft=None,
                 draft=None):
        if max_len % block_size:
            raise ValueError(f"max_len {max_len} must be a multiple of "
                             f"block_size {block_size}")
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.device = device
        self.max_len = max_len
        self.n_slots = n_slots
        self.decode_chunk = max(1, decode_chunk)
        self.block_size = block_size
        self.maxb = max_len // block_size
        # default pool: every slot can hold a full context, plus one
        # slot's worth of retained (refcount-0) cache blocks
        self.n_blocks = pool_blocks or (n_slots + 1) * self.maxb
        if self.n_blocks < self.maxb:
            raise ValueError("pool smaller than one full-context stream")
        self.prefill_chunk = max(prefill_chunk, block_size)
        self.kv_quant = kv_quant
        # schema-constrained JSON decoding (models/constrain.py): one
        # engine-level DFA; streams opt in per call
        # (generate_stream(constrain=True)); per-slot DFA state, −2 =
        # unconstrained slot (mask passes through)
        self.json_constraint = json_constraint
        # spec_k > 0: batched speculation over block tables (module
        # docstring) — streams end spec_k tokens short of max_len (each
        # verify writes k rows past the last accepted position) and
        # admission reserves blocks through limit + spec_k
        self.spec_k = spec_k
        self.spec_steps = spec_steps
        from legalrag_tpu.models.ngram_draft import resolve_ngram_draft

        self.ngram_draft = resolve_ngram_draft(ngram_draft) if spec_k \
            else None
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
        if spec_k and max_len - spec_k < block_size:
            raise ValueError(f"spec_k {spec_k} leaves no stream budget "
                             f"in max_len {max_len}")
        self.radix = _RadixIndex(self.n_blocks, block_size)

        with on_device(device):
            self._pools = self._empty_pools()
            self._last = jnp.zeros((n_slots, cfg.vocab_size), jnp.float32)
            self._pos = jnp.zeros((n_slots,), jnp.int32)
            self._keys = jnp.zeros((n_slots, 2), jnp.uint32)
            self._rep = jnp.zeros((n_slots, cfg.vocab_size), bool)
            self._cstate = jnp.full((n_slots,), -2, jnp.int32)
            if spec_k:
                self._tokens = jnp.zeros((n_slots, max_len), jnp.int32)
                self._pend_tok = jnp.zeros((n_slots,), jnp.int32)
            if self.draft_params is not None:
                # the draft model keeps a plain contiguous [S, max_len]
                # slot cache (it is small; paging it buys nothing)
                dcfg = self.draft_cfg
                dt = self.draft_params["embed"].dtype
                hkv_d, dd = dcfg.num_key_value_heads, dcfg.head_dim
                self._dcache = [
                    (jnp.zeros((n_slots, max_len, hkv_d, dd), dt),
                     jnp.zeros((n_slots, max_len, hkv_d, dd), dt))
                    for _ in range(dcfg.num_hidden_layers)]
        # host-authoritative block tables; sentinel NB = "no block":
        # writes drop, gathers clamp into masked garbage
        self._tables = np.full((n_slots, self.maxb), self.n_blocks,
                               np.int32)

        self._prefill_fn = jax.jit(self._prefill_chunk, donate_argnums=(1,))
        self._install_fn = jax.jit(self._install_state,
                                   donate_argnums=(0, 1, 2, 3, 4))
        self._decode_fn = jax.jit(self._decode_chunk,
                                  static_argnames=("n_steps",),
                                  donate_argnums=(1, 2, 3, 4, 5, 6))
        if spec_k:
            self._spec_install_fn = jax.jit(self._spec_install,
                                            donate_argnums=(0, 1, 2, 3, 4))
            don = (1, 2, 3, 4, 5, 6) + ((24,) if draft is not None else ())
            self._spec_decode_fn = jax.jit(self._spec_decode,
                                           donate_argnums=don)
            if draft is not None:
                self._draft_admit_fn = jax.jit(self._draft_admit_chunk,
                                               donate_argnums=(1,))

        self._slots: List[Optional[_Stream]] = [None] * n_slots
        self._admitted_firsts: List = []  # spec-mode deferred first tokens
        self._pending: "deque[_Stream]" = deque()
        self._cond = threading.Condition()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="paged-decoder")
        self._worker.start()

    # ------------------------------------------------------------- factories
    @classmethod
    def from_pretrained(cls, name_or_path: str, device=None, **kw
                        ) -> "PagedDecoderLM":
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
        log.info("loaded paged decoder %s (%d slots, %d x %d-token blocks,"
                 " max_len %d)", name_or_path, lm.n_slots, lm.n_blocks,
                 lm.block_size, lm.max_len)
        return lm

    # ------------------------------------------------------------- programs
    # Launch-level gather/compute/scatter (round-5 redesign): the first
    # formulation routed EVERY cache touch through the block table — a
    # per-step, per-layer pool gather for attention plus a scatter per KV
    # write — and measured 0.06x of the contiguous engine on the real
    # chip (TPU scatter/gather with computed indices defeats the fused
    # attention pipeline XLA builds for plain dynamic-slice caches).
    # Now each LAUNCH (a) gathers every slot's block table into a
    # contiguous [S, maxb*bs, ...] view once, (b) runs the SAME
    # contiguous decode/verify scan as models/batched_decoder.py over
    # that view, and (c) scatters back only the block window each slot
    # could have written. Steady-state per-step cost is identical to the
    # contiguous engine; the gather/scatter pair amortizes over the
    # launch's decode_chunk (resp. spec_steps*(k+1)) tokens. Writes
    # during decode land only in blocks the slot owns outright (published
    # radix blocks hold full PROMPT chunks; decode writes at
    # pos >= len(prompt) hit the private tail), so write-back never
    # mutates a shared block with anything but its own gathered bytes.

    def _gather_pools(self, pools, tables):
        """Block pools -> per-slot contiguous caches [S, maxb*bs, ...].

        mode="clip": sentinel (NB) table entries must gather SOME real
        block — garbage rows are finite and exactly zeroed by the
        filled/causal mask, while a fill-mode NaN row would poison the
        softmax."""
        s = tables.shape[0]
        return [tuple(jnp.take(p, tables, axis=0, mode="clip")
                      .reshape(s, -1, *p.shape[2:])
                      for p in entry)
                for entry in pools]

    def _scatter_pools(self, pools, caches, tables, blk_lo, w: int):
        """Write blocks ``blk_lo[s] .. blk_lo[s]+w-1`` of each slot's
        contiguous cache back into the pools. ``w`` is static (sized for
        the launch's worst-case write span); the host clamps ``blk_lo``
        to ``[0, maxb-w]`` so the window is always in bounds — window
        blocks below the first written row are rewritten with their own
        gathered bytes (a no-op). Sentinel table entries drop."""
        s, bs = tables.shape[0], self.block_size
        win = blk_lo[:, None] + jnp.arange(w)[None, :]          # [S, w]
        idx = jnp.take_along_axis(tables, win, axis=1)          # [S, w]
        row0 = blk_lo * bs
        out = []
        for entry, centry in zip(pools, caches):
            new_entry = []
            for p, c in zip(entry, centry):
                upd = jax.vmap(
                    lambda row, lo: jax.lax.dynamic_slice(
                        row, (lo,) + (0,) * (row.ndim - 1),
                        (w * bs,) + row.shape[1:]))(c, row0)
                upd = upd.reshape(s, w, bs, *p.shape[2:])
                new_entry.append(p.at[idx].set(upd, mode="drop"))
            out.append(tuple(new_entry))
        return out

    def _empty_pools(self):
        hkv, d = self.cfg.num_key_value_heads, self.cfg.head_dim
        nb, bs = self.n_blocks, self.block_size
        if self.kv_quant:
            return [(jnp.zeros((nb, bs, hkv, d), jnp.int8),
                     jnp.zeros((nb, bs, hkv, d), jnp.int8),
                     jnp.zeros((nb, bs, hkv, 1), jnp.float32),
                     jnp.zeros((nb, bs, hkv, 1), jnp.float32))
                    for _ in range(self.cfg.num_hidden_layers)]
        dt = self.params["embed"].dtype
        return [(jnp.zeros((nb, bs, hkv, d), dt),
                 jnp.zeros((nb, bs, hkv, d), dt))
                for _ in range(self.cfg.num_hidden_layers)]

    def _prefill_chunk(self, params, pools, table_row, blk_lo, ids, p_len,
                       true_len):
        """Forward one right-padded [1, C] prompt chunk at absolute
        offset ``p_len``: gather the slot's table into a contiguous
        [1, maxb*bs] cache view, run the plain contiguous prefill
        forward, scatter the written block window back. Returns
        (pools, last real chunk token's logits [1, V])."""
        params = unpack_weights4(params)
        c = ids.shape[1]
        w = min(self.maxb, (c - 1) // self.block_size + 2)
        caches = self._gather_pools(pools, table_row)
        positions = (p_len + jnp.arange(c, dtype=jnp.int32))[None, :]
        hidden, caches = decoder_forward(params, self.cfg, ids, positions,
                                         kv_cache=caches, cache_len=p_len,
                                         return_hidden=True)
        pools = self._scatter_pools(pools, caches, table_row, blk_lo, w)
        hrow = jax.lax.dynamic_slice(
            hidden, (0, true_len - 1, 0), (1, 1, hidden.shape[-1]))
        return pools, lm_logits(params, self.cfg, hrow)[:, 0]

    def _install_state(self, last, pos, keys, rep, cstate, last_row, slot,
                       total, key_row, mask_row, cs0):
        last = jax.lax.dynamic_update_slice(
            last, last_row.astype(last.dtype), (slot, 0))
        pos = pos.at[slot].set(total)
        keys = keys.at[slot].set(key_row)
        rep = rep.at[slot].set(mask_row)
        cstate = cstate.at[slot].set(cs0)
        return last, pos, keys, rep, cstate

    def _decode_chunk(self, params, pools, last, pos, keys, rep, cstate,
                      tables, blk_lo, temp, top_p, topk, minp, pen,
                      eos_ids, limit, active, ctable, cacc, cdist,
                      n_steps: int):
        """``n_steps`` batched sample+decode steps in ONE program — the
        paged twin of BatchedDecoderLM._decode_chunk, run over the
        launch-level contiguous gather of every slot's block table (see
        the gather/compute/scatter note above). Frozen slots keep
        writing one k/v row at their frozen position into their own
        contiguous view; write-back only touches blocks each slot's
        table still owns (the host rewrites a finished slot's table row
        to the drop sentinel before the next launch), so a
        freed-and-reused block can never be corrupted."""
        params = unpack_weights4(params)
        max_len = self.max_len
        w = min(self.maxb, (n_steps - 1) // self.block_size + 2)
        caches = self._gather_pools(pools, tables)

        def step(carry, _):
            caches, last, pos, keys, rep, active, cstate = carry
            splits = jax.vmap(jax.random.split)(keys)
            next_keys, subs = splits[:, 0], splits[:, 1]
            scored = apply_repetition_penalty(last, rep, pen[:, None])
            if ctable is not None:
                # schema-DFA mask (same semantics as the contiguous
                # engines): from each constrained slot's state only
                # tokens with a valid transition survive; EOS only when
                # the state is accepting. −2 slots pass through.
                st_ = jnp.maximum(cstate, 0)
                row = ctable[st_]                            # [S, V]
                uncon = (cstate < 0)[:, None]
                iota_v = jnp.arange(row.shape[1])
                eos_col = iota_v[None, :] == eos_ids[:, None]
                allowed = jnp.where(eos_col,
                                    (cacc[st_] | (cstate < 0))[:, None],
                                    (row >= 0) | uncon)
                # budget-forced completion per slot (same semantics as
                # the contiguous engines): `limit − pos` tokens remain
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
            logits, caches = decoder_forward(
                params, self.cfg, tok[:, None], safe[:, None],
                kv_cache=caches, cache_len=safe)
            keep = active[:, None]
            last2 = jnp.where(keep, logits[:, -1], last)
            keys2 = jnp.where(keep, next_keys, keys)
            rep2 = rep.at[jnp.arange(tok.shape[0]), tok].set(True)
            hit_eos = active & (tok == eos_ids)
            if ctable is not None:
                # clamp like _advance_first (see batched_decoder): dead
                # states are pruned at compile time; never silently drop
                # the constraint on a malformed table
                nstate = jnp.maximum(ctable[jnp.maximum(cstate, 0), tok], 0)
                cstate = jnp.where((cstate < 0) | hit_eos | ~active,
                                   cstate, nstate)
            pos2 = pos + active.astype(jnp.int32)
            active2 = active & ~hit_eos & (pos2 < limit)
            return (caches, last2, pos2, keys2, rep2, active2,
                    cstate), emit

        (caches, last, pos, keys, rep, active, cstate), toks = jax.lax.scan(
            step, (caches, last, pos, keys, rep, active, cstate), None,
            length=n_steps)
        pools = self._scatter_pools(pools, caches, tables, blk_lo, w)
        return toks, pools, last, pos, keys, rep, active, cstate

    # --------------------------------------------- speculative (spec_k > 0)
    # the admission-time first-token helpers are engine-agnostic (they
    # touch only self.json_constraint) — share the batched engine's so
    # the semantics cannot diverge
    _constrain_first = BatchedDecoderLM._constrain_first
    _advance_first = BatchedDecoderLM._advance_first
    _first_token = BatchedDecoderLM._first_token
    # the draft model's cache is contiguous in both engines
    _draft_admit_chunk = BatchedDecoderLM._draft_admit_chunk
    _draft_admit = BatchedDecoderLM._draft_admit

    def _spec_install(self, tokens, pos, keys, pending, rep, cstate,
                      last_row, full_ids, slot, total, key_row, mask_row,
                      temp, top_p, top_k, min_p, pen, cs0, eos_j):
        """Final step of a spec admission (the table prefill already ran
        via ``_prefill_fn``): record the prompt in the slot's token-
        history row and sample the first token under the prompt-mask
        repetition penalty and the slot's DFA constraint."""
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

    def _spec_decode(self, params, pools, tokens, pos, keys, pending, rep,
                     tables, blk_lo, temp, top_p, topk, minp, pen, eos_ids,
                     limit, active, cstate, ctable, cacc, nka, nkb, nvals,
                     dparams=None, dcache=None, cdist=None):
        """``spec_steps`` speculation rounds in ONE program — the paged
        twin of ``BatchedDecoderLM._spec_decode``, run over the
        launch-level contiguous gather of every slot's block table (see
        the gather/compute/scatter note above). The [S, k+1] verify
        forward writes candidate KV rows into the contiguous view
        (vector ``cache_len``); rejected rows are rewritten by the next
        round, exactly like the contiguous engine. The host guarantees
        every active slot's table covers the launch's worst-case write
        horizon (``_top_up_tables``), and ``blk_lo``/w size the
        write-back window to that same horizon."""
        params = unpack_weights4(params)
        dparams = unpack_weights4(dparams)
        k = self.spec_k
        s = self.n_slots
        nsize = nka.shape[0] if nvals is not None else 0
        iota = jnp.arange(k + 1)
        idx_row = jnp.arange(self.max_len)[None, :]
        sidx = jnp.arange(s)
        span = self.spec_steps * (k + 1)
        w = min(self.maxb, (span - 1) // self.block_size + 2)
        caches = self._gather_pools(pools, tables)

        def step(carry, _):
            if dparams is not None:
                (caches, dcache_c, tokens, pos, keys, pending, active,
                 hit_eos, rep, cstate) = carry
            else:
                (caches, tokens, pos, keys, pending, active, hit_eos, rep,
                 cstate) = carry
                dcache_c = None
            # trigram-preferred prompt lookup, source 1 (spec_decode.py —
            # draft quality only affects acceptance, never output);
            # full-window matches preferred, partial windows last resort
            # (spec_decode.py)
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
            havek = jf >= 0
            if nvals is not None:
                # source 2, corpus table when no full window (same uint32
                # Knuth hash as the host builder; mismatches keep the
                # sliced draft)
                h = ((a_tok.astype(jnp.uint32)
                      * jnp.uint32(2654435761)
                      + pending.astype(jnp.uint32))
                     & jnp.uint32(nsize - 1)).astype(jnp.int32)
                ok = (~havek) & (nka[h] == a_tok) & (nkb[h] == pending)
                draft = jnp.where(ok[:, None], nvals[h], draft)
                havek = havek | ok
            if dparams is not None:
                # source 3, DRAFT MODEL for slots whose lookup missed
                # (see batched_decoder._spec_decode for the trust rule:
                # the round-end catch-up below rewrites the draft's rows
                # from the true verify targets)
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
            logits, caches = decoder_forward(params, self.cfg, seq,
                                             positions, kv_cache=caches,
                                             cache_len=pos)
            # HF-exact repetition penalty under speculation: position i's
            # seen-set is rep[s] plus the slot's draft[0..i-1] (see
            # batched_decoder._spec_decode)
            v = logits.shape[-1]
            draft_seen = jnp.cumsum(
                jax.nn.one_hot(draft, v, dtype=jnp.int32), axis=1) > 0
            masks = jnp.concatenate(
                [jnp.zeros((s, 1, v), bool), draft_seen], axis=1) \
                | rep[:, None, :]
            logits = apply_repetition_penalty(logits, masks,
                                              pen[:, None, None])
            if ctable is not None:
                # schema-DFA constraint under speculation: per-position
                # state fold; positions past a DFA-invalid draft prefix
                # are never used — pass them through (state −1)
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
                # budget-forced completion (see batched_decoder): verify
                # position i writes sequence position pos+1+i, so its
                # remaining budget (incl. itself) is limit − pos − 1 − i
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
                # round-end draft-cache catch-up (spec_decode.py)
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
                           self.max_len)
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
                cs = cstate
                for i in range(k + 1):
                    nxt = jnp.where(
                        cs >= 0,
                        ctable[jnp.maximum(cs, 0), targets[:, i]], cs)
                    cs = jnp.where(emit_mask[:, i], nxt, cs)
                cstate = cs
            step_eos = active & (ie <= a)
            hit_eos = hit_eos | step_eos
            # no capacity freeze needed: limit <= max_len - spec_k (the
            # generate_stream clamp) keeps every verify write inside the
            # slot's reserved table coverage
            active = active & ~step_eos & (pos + 1 < limit)
            if dparams is not None:
                return (caches, dcache_c, tokens, pos, keys, pending,
                        active, hit_eos, rep, cstate), emissions
            return (caches, tokens, pos, keys, pending, active,
                    hit_eos, rep, cstate), emissions

        if dparams is not None:
            carry0 = (caches, dcache, tokens, pos, keys, pending, active,
                      jnp.zeros((s,), bool), rep, cstate)
            (caches, dcache, tokens, pos, keys, pending, active, hit_eos,
             rep, cstate), emissions = \
                jax.lax.scan(step, carry0, None, length=self.spec_steps)
        else:
            carry0 = (caches, tokens, pos, keys, pending, active,
                      jnp.zeros((s,), bool), rep, cstate)
            (caches, tokens, pos, keys, pending, active, hit_eos, rep,
             cstate), emissions = \
                jax.lax.scan(step, carry0, None, length=self.spec_steps)
        pools = self._scatter_pools(pools, caches, tables, blk_lo, w)
        return (emissions, pools, tokens, pos, keys, pending, hit_eos, rep,
                cstate, dcache)

    # -------------------------------------------------------------- blocks
    def _table_dev(self):
        return jnp.asarray(self._tables)

    def _alloc_into(self, st: _Stream, slot: int) -> int:
        """One block from the stream's reservation into its table."""
        bid = self.radix.alloc()
        self.radix.reserved -= 1
        st.reserve -= 1
        st.private.append(bid)
        self._tables[slot, st.n_blocks] = bid
        st.n_blocks += 1
        return bid

    def _release(self, st: _Stream, slot: int) -> None:
        """Return a finished stream's blocks: decref shared path nodes
        (they stay cached, evictable at refcount 0) and free private
        ones; release any unused reservation."""
        self.radix.decref(st.path)
        st.path = []
        self.radix.free.extend(st.private)
        st.private = []
        self.radix.reserved -= st.reserve
        st.reserve = 0
        self._tables[slot, :] = self.n_blocks

    # ----------------------------------------------------------- admission
    def _try_admit(self, st: _Stream, slot: int) -> bool:
        """Admit ``st`` into ``slot`` if its worst-case block budget fits
        free + evictable − reserved; False = leave pending (blocks free
        up as other streams finish)."""
        ids = st.prompt_ids
        bs = self.block_size
        st.limit = min(len(ids) + st.max_new, self.max_len - self.spec_k)
        path = self.radix.match(ids)
        self.radix.incref(path)
        # spec mode reserves through limit + spec_k: every verify writes
        # k candidate rows past the last accepted position
        need = -(-(st.limit + self.spec_k) // bs) - len(path)     # ceil
        if self.radix.available() < need:
            self.radix.decref(path)
            return False
        self.radix.reserved += need
        st.reserve = need
        st.path = path
        m = len(path) * bs
        for j, node in enumerate(path):
            self._tables[slot, j] = node.block_id
        st.n_blocks = len(path)
        self.radix.reused_blocks += len(path)
        METRICS.inc("legalrag_paged_reused_tokens", m, engine="paged")

        # allocate the suffix's blocks and prefill it chunk by chunk
        sfx = ids[m:]
        n_sfx_blocks = -(-len(sfx) // bs)
        for _ in range(n_sfx_blocks):
            self._alloc_into(st, slot)
        table_row = jnp.asarray(self._tables[slot:slot + 1])
        c = self.prefill_chunk
        last_row = None
        for off in range(0, len(sfx), c):
            piece = list(sfx[off:off + c])
            n = len(piece)
            cb = c if n == c else pad_bucket(n, lo=self._PAD_BUCKET_MIN,
                                             hi=self.max_len - (m + off))
            piece += [0] * (cb - n)
            # write-back window: the chunk's touched blocks (static width
            # matching _prefill_chunk's w; clamp keeps it in bounds —
            # below-window blocks rewrite their own gathered bytes)
            w_p = min(self.maxb, (cb - 1) // bs + 2)
            lo = min(max((m + off) // bs, 0), self.maxb - w_p)
            self._pools, last_row = self._prefill_fn(
                self.params, self._pools, table_row,
                jnp.asarray([lo], jnp.int32),
                jnp.asarray([piece], jnp.int32), jnp.int32(m + off),
                jnp.int32(n))
        METRICS.inc("legalrag_paged_prefill_tokens", len(sfx),
                    engine="paged")

        # publish this prompt's freshly filled FULL blocks to the radix
        # tree so later identical prefixes reuse them; the partial tail
        # block (if any) stays private
        parent = st.path[-1] if st.path else self.radix.root
        n_full = len(ids) // bs
        pub_ids = deque(st.private)
        for j in range(len(path), n_full):
            bid = pub_ids.popleft()
            node = self.radix.publish(
                parent, tuple(ids[j * bs:(j + 1) * bs]), bid)
            if node is None:
                break           # lost a publish race; keep block private
            st.private.remove(bid)
            st.path.append(node)
            parent = node

        mask_row = np.zeros(self.cfg.vocab_size, bool)
        mask_row[ids] = True   # repetition-penalty history = the prompt
        jc = self.json_constraint
        cs0 = jnp.int32(jc.start if (jc is not None and st.constrained)
                        else -2)
        if self.spec_k:
            eos_j = jnp.int32(-1 if st.eos_id is None else st.eos_id)
            tb = pad_bucket(len(ids), hi=self.max_len)
            full = ids + [0] * (tb - len(ids))
            (self._tokens, self._pos, self._keys, self._pend_tok,
             self._rep, self._cstate, tok) = self._spec_install_fn(
                self._tokens, self._pos, self._keys, self._pend_tok,
                self._rep, self._cstate, last_row,
                jnp.asarray([full], jnp.int32), jnp.int32(slot),
                jnp.int32(len(ids)), jax.random.PRNGKey(st.seed),
                jnp.asarray(mask_row), jnp.float32(st.temperature),
                jnp.float32(st.top_p), jnp.int32(st.top_k),
                jnp.float32(st.min_p),
                jnp.float32(st.repetition_penalty), cs0, eos_j)
            if self.draft_params is not None:
                self._draft_admit(ids, slot)
            self._slots[slot] = st
            # first-token fetch is deferred past the decode dispatch so
            # the sync overlaps device execution (batched engine pattern)
            self._admitted_firsts.append((st, slot, tok))
            return True
        (self._last, self._pos, self._keys, self._rep,
         self._cstate) = self._install_fn(
            self._last, self._pos, self._keys, self._rep, self._cstate,
            last_row, jnp.int32(slot), jnp.int32(len(ids)),
            jax.random.PRNGKey(st.seed), jnp.asarray(mask_row), cs0)
        self._slots[slot] = st
        return True

    def _top_up_tables(self) -> None:
        """Before a decode launch: every active slot's table must cover
        the launch's worst-case write positions (drawn from its
        reservation). Plain mode writes one row per step up to
        pos + decode_chunk. Spec mode writes k+1 verify rows per round
        at pos..pos+k with pos advancing ≤ k+1 per round, so the horizon
        is pos + spec_steps·(k+1), capped at limit + spec_k (the freeze
        keeps pos < limit). The device position of an active slot is
        len(prompt) + produced in plain mode and len(prompt) + produced
        − 1 in spec mode (the pending token's KV row is written by the
        next verify), so no device fetch is needed here."""
        k = self.spec_k
        for i, st in enumerate(self._slots):
            if st is None:
                continue
            if k:
                pos = len(st.prompt_ids) + max(st.produced - 1, 0)
                horizon = min(pos + self.spec_steps * (k + 1),
                              st.limit + k, self.max_len)
            else:
                pos = len(st.prompt_ids) + st.produced
                horizon = min(pos + self.decode_chunk, st.limit,
                              self.max_len)
            while st.n_blocks * self.block_size < horizon:
                self._alloc_into(st, i)

    def _blk_lo(self) -> np.ndarray:
        """Per-slot first write-back block for the next launch (the
        device position math mirrors ``_top_up_tables``); clamped so the
        static-width window of ``_decode_chunk``/``_spec_decode`` stays
        in bounds. Empty slots stay 0 — their sentinel table drops."""
        k = self.spec_k
        bs = self.block_size
        span = self.spec_steps * (k + 1) if k else self.decode_chunk
        w = min(self.maxb, (span - 1) // bs + 2)
        lo = np.zeros(self.n_slots, np.int32)
        for i, st in enumerate(self._slots):
            if st is None:
                continue
            if k:
                pos = len(st.prompt_ids) + max(st.produced - 1, 0)
            else:
                pos = len(st.prompt_ids) + st.produced
            lo[i] = min(max(pos // bs, 0), self.maxb - w)
        return lo

    # --------------------------------------------------------------- worker
    def _control_vectors(self):
        s = self.n_slots
        temp = np.zeros(s, np.float32)
        top_p = np.full(s, 0.9, np.float32)
        topk = np.zeros(s, np.int32)
        minp = np.zeros(s, np.float32)
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
            limit[i] = st.limit
            active[i] = True
        return (jnp.asarray(temp), jnp.asarray(top_p), jnp.asarray(topk),
                jnp.asarray(minp), jnp.asarray(pen), jnp.asarray(eos),
                jnp.asarray(limit), jnp.asarray(active))

    def _finish(self, slot: int) -> None:
        st = self._slots[slot]
        if st is not None:
            self._release(st, slot)
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
                log.exception("paged decoder worker error: %s", e)
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
        for i, st in enumerate(self._slots):
            if st is not None and st.cancelled:
                self._finish(i)
        while pending and pending[0].cancelled:
            pending.popleft().out.put(None)
        # FIFO admission; stop at the first stream that does not fit so
        # a large waiting request cannot be starved by later small ones
        for i in range(self.n_slots):
            if not pending:
                break
            if self._slots[i] is None:
                st = pending[0]
                try:
                    if not self._try_admit(st, i):
                        break
                    pending.popleft()
                except BaseException as e:
                    log.exception("paged admission failed: %s", e)
                    pending.popleft()
                    self._release(st, i)  # undo partial allocs/refs
                    st.error = e
                    st.out.put(None)
                    self._slots[i] = None
        if pending:
            with self._cond:
                pending.extend(self._pending)
                self._pending = pending
        if not any(s is not None for s in self._slots):
            return
        self._top_up_tables()
        (temp, top_p, topk, minp, pen, eos, limit,
         active) = self._control_vectors()
        occ = sum(s is not None for s in self._slots)
        engine = "paged-spec" if self.spec_k else "paged"
        METRICS.inc("legalrag_gen_launches", engine=engine, occupancy=occ)
        jc = self.json_constraint
        ctable = None if jc is None else jc.table
        cacc = None if jc is None else jc.accepting
        if self.spec_k:
            ng = (self.ngram_draft.device_arrays(self.spec_k)
                  if self.ngram_draft is not None else (None, None, None))
            (em, self._pools, self._tokens, self._pos, self._keys,
             self._pend_tok, hit_eos, self._rep, self._cstate,
             dcache) = self._spec_decode_fn(
                self.params, self._pools, self._tokens, self._pos,
                self._keys, self._pend_tok, self._rep, self._table_dev(),
                jnp.asarray(self._blk_lo()),
                temp, top_p, topk, minp, pen, eos, limit, active,
                self._cstate, ctable, cacc, *ng, self.draft_params,
                self._dcache if self.draft_params is not None else None,
                cdist=None if jc is None else jc.dist)
            if self.draft_params is not None:
                self._dcache = dcache
            # deferred admission first tokens: the int() syncs overlap
            # the decode execution just dispatched above
            for st, slot, tok_dev in self._admitted_firsts:
                if self._slots[slot] is not st:
                    continue
                first = int(tok_dev)
                if st.eos_id is not None and first == st.eos_id:
                    self._finish(slot)   # discards this launch's row
                    continue
                st.produced = 1
                METRICS.inc("legalrag_gen_tokens", 1, engine="paged-spec")
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
                                    engine="paged-spec")
                if bool(eos_host[i]) or st.produced >= st.max_new:
                    self._finish(i)
            METRICS.inc("legalrag_gen_tokens", n_launch_toks,
                        engine="paged-spec")
        else:
            (toks, self._pools, self._last, self._pos, self._keys,
             self._rep, _, self._cstate) = self._decode_fn(
                self.params, self._pools, self._last, self._pos,
                self._keys, self._rep, self._cstate, self._table_dev(),
                jnp.asarray(self._blk_lo()),
                temp, top_p, topk, minp, pen, eos, limit, active, ctable,
                cacc, None if jc is None else jc.dist,
                n_steps=self.decode_chunk)
            toks_host = np.asarray(toks)                     # [n_steps, S]
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
            METRICS.inc("legalrag_gen_tokens", n_launch_toks,
                        engine="paged")
        r = self.radix
        METRICS.set_gauge("legalrag_paged_free_blocks", len(r.free))
        METRICS.set_gauge("legalrag_paged_cached_blocks", r.evictable)
        METRICS.set_gauge("legalrag_paged_reserved_blocks", r.reserved)
        METRICS.set_gauge("legalrag_paged_pending_streams",
                          len(self._pending))

    # ------------------------------------------------------------------ API
    def paged_stats(self) -> Dict[str, int]:
        """Pool/radix observability: block reuse is the whole point."""
        r = self.radix
        return {"n_blocks": self.n_blocks, "block_size": self.block_size,
                "free_blocks": len(r.free), "cached_blocks": r.evictable,
                "reserved_blocks": r.reserved,
                "reused_blocks": r.reused_blocks,
                "evicted_blocks": r.evicted_blocks}

    def generate_stream(self, prompt_ids: List[int],
                        max_new_tokens: int = 256, temperature: float = 0.0,
                        top_p: float = 0.9, eos_id: Optional[int] = None,
                        seed: int = 0, repetition_penalty: float = 1.0,
                        top_k: int = 0, min_p: float = 0.0,
                        constrain: bool = False) -> Iterator[int]:
        """Same contract as ``BatchedDecoderLM.generate_stream``.
        ``constrain=True`` applies the engine's schema-DFA JSON
        constraint to this stream (per-slot DFA states; unconstrained
        streams share the batch untouched)."""
        if constrain and self.json_constraint is None:
            raise ValueError("constrain=True but the engine was built "
                             "without a json_constraint")
        t = len(prompt_ids)
        if t >= self.max_len - self.spec_k:
            raise ValueError(
                f"prompt ({t} tokens) does not fit the {self.max_len}-token"
                f" budget (spec_k={self.spec_k}); truncate the prompt "
                "before generation")
        # spec mode reserves spec_k rows of KV headroom (every verify
        # writes k rows past the last accepted position)
        budget = self.max_len - t - self.spec_k
        if max_new_tokens > budget:
            log.warning("max_new_tokens %d exceeds cache budget %d "
                        "(prompt %d / max_len %d / spec_k %d); clamping",
                        max_new_tokens, budget, t, self.max_len,
                        self.spec_k)
            max_new_tokens = budget
        st = _Stream(list(prompt_ids), max_new_tokens, eos_id, temperature,
                     top_p, seed, repetition_penalty, top_k, min_p)
        st.constrained = bool(constrain)
        with self._cond:
            if self._closed:
                raise RuntimeError("PagedDecoderLM is closed")
            self._pending.append(st)
            self._cond.notify()
        try:
            while True:
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
            st.cancelled = True

    def close(self) -> None:
        """Stop the worker thread and fail open streams. Idempotent."""
        with self._cond:
            self._closed = True
            self._cond.notify()
        self._worker.join(timeout=30)
