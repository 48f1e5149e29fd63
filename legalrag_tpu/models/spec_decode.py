"""Prompt-lookup speculative decoding — entirely on device.

RAG answers quote the retrieved provisions: the statute text sits in the
prompt and the generation copies spans of it (citations, quoted rules,
article numbers). Prompt-lookup speculation exploits that: draft the next
``k`` tokens by finding the most recent earlier occurrence of the current
bigram in the sequence-so-far and copying what followed it, then verify
all ``k`` drafts with ONE forward pass of ``k+1`` tokens. Decode is
weights-bandwidth-bound, so a ``k+1``-token verify costs about the same
HBM traffic as a 1-token step — every accepted draft is a nearly-free
token. Greedy output is token-identical to plain decoding (the correction
token at the first mismatch is the true greedy token); sampled output is
distribution-exact by the standard speculative argument (each position is
sampled from the true conditional given the accepted prefix; acceptance =
"sample equals draft").

The TPU-native part: the whole loop — bigram match, draft gather, verify
forward, acceptance, token-buffer update, EOS/budget/capacity freezing —
runs inside a ``lax.scan`` of ``spec_steps`` iterations per dispatch, over
a device-resident ``[max_len]`` token buffer. No host round trip per
speculation round (a dispatch costs ~200 ms on remote-relay backends);
the host fetches one packed emissions array per launch. Static shapes
throughout: the program set is {prefill per bucket, one spec program,
per-token tail}.

Correctness invariant shared with models/batched_decoder.py: rejected
draft rows left in the KV cache sit at positions ≥ the new write pointer,
and every later step writes row ``p`` before attending ``kv_pos ≤ p`` —
stale rows are always overwritten before they can be attended.

Replaces the same surface as the reference's HF ``model.generate`` loop
(reference ``llm/client.py:306-369``), which decodes strictly one token
per forward.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from legalrag_tpu.models.constrain import budget_force
from legalrag_tpu.models.decoder import (DecoderConfig, JaxDecoderLM,
                                         _sample_top_p, _warp_filter,
                                         apply_repetition_penalty,
                                         decoder_forward, unpack_weights4)
from legalrag_tpu.utils import get_logger
from legalrag_tpu.utils.device import on_device

log = get_logger("models.spec_decode")


class SpecLookupDecoderLM(JaxDecoderLM):
    """``JaxDecoderLM`` with prompt-lookup speculative decoding.

    ``spec_k`` drafts are verified per speculation round; ``spec_steps``
    rounds run per device dispatch. Exposes ``last_stats`` (per-stream
    acceptance counters) for benchmarking. Falls back to the parent's
    per-token tail within ``spec_k`` tokens of cache capacity.
    """

    def __init__(self, params: Dict, cfg: DecoderConfig, tokenizer=None,
                 device=None, max_len: int = 4096, decode_chunk: int = 8,
                 spec_k: int = 8, spec_steps: int = 4,
                 prefix_cache: int = 0, prefill_chunk: int = 1024,
                 kv_quant: bool = False, json_constraint=None,
                 ngram_draft=None, draft=None, spec_adaptive: float = 0.0):
        super().__init__(params, cfg, tokenizer, device=device,
                         max_len=max_len, decode_chunk=decode_chunk,
                         prefix_cache=prefix_cache,
                         prefill_chunk=prefill_chunk, kv_quant=kv_quant,
                         json_constraint=json_constraint)
        self.spec_k = spec_k
        self.spec_steps = spec_steps
        # Adaptive speculation (round-5, after the on-chip 0.14×
        # measurement): speculation only pays when accepted drafts beat
        # the extra verify launches, which depends on how quotable the
        # generation is — a model property the engine can't know ahead
        # of time. With ``spec_adaptive > 0`` the engine measures its own
        # acceptance over the first probe launch (``spec_steps`` rounds)
        # and, if
        # emitted tokens/round < the threshold, STOPS speculating and
        # finishes the stream with the parent's chunked decode program —
        # worst case converges to plain chunk decode minus one probe.
        # Greedy output is unchanged either way (the chunk program is the
        # plain engine's). 0 disables (always speculate).
        self.spec_adaptive = float(spec_adaptive)
        # corpus-level bigram → continuation drafts (models/ngram_draft.py):
        # probed when the in-sequence lookup misses — first quotes of
        # corpus text not present in the prompt still draft-accelerate
        from legalrag_tpu.models.ngram_draft import resolve_ngram_draft

        self.ngram_draft = resolve_ngram_draft(ngram_draft)
        # DRAFT-MODEL speculation (``draft`` = (params, cfg) of a small
        # decoder, ``llm.draft_model``): the draft is generated by k
        # greedy steps of the small model INSIDE the verify program (a
        # lax.scan — zero extra host dispatches per round) instead of the
        # prompt-lookup table. The draft model keeps its own KV cache in
        # the scan carry under the same staleness invariant as the target
        # (rows ≥ the write pointer are rewritten before attention).
        # Draft quality only affects acceptance, never output.
        if draft is not None:
            dparams, dcfg = draft
            if dcfg.vocab_size != cfg.vocab_size:
                raise ValueError(
                    f"draft model vocab {dcfg.vocab_size} != target "
                    f"vocab {cfg.vocab_size}")
            self.draft_params, self.draft_cfg = dparams, dcfg
        else:
            self.draft_params = self.draft_cfg = None
        self.last_stats: Dict[str, float] = {}
        donate = (1, 2, 12) + ((21,) if draft is not None else ())
        self._spec_fn = jax.jit(self._spec_scan,
                                static_argnames=("greedy",),
                                donate_argnums=donate)
        if draft is not None:
            self._draft_prefill_fn = jax.jit(self._draft_prefill_chunk,
                                             donate_argnums=(1,))

    # ------------------------------------------------------------- program
    def _spec_scan(self, params, cache, tokens, pos, pending, key, temp,
                   top_p, top_k, min_p, eos_id, budget_left, rep, pen,
                   cstate, ctable, cacc, nka, nkb, nvals, dparams=None,
                   dcache=None, cdist=None, greedy: bool = True):
        """``spec_steps`` speculation rounds in ONE program.

        State: ``tokens[i]`` = sequence token at position ``i`` for
        ``i ≤ pos``; ``pending`` (= ``tokens[pos]``) is emitted but not
        yet forwarded; cache rows ``0..pos-1`` are valid.

        Per round: match the bigram ``(tokens[pos-1], tokens[pos])`` at
        the most recent earlier position, copy the following ``k`` tokens
        as the draft, forward ``[pending, draft]`` (k+1 tokens) writing
        cache rows ``pos..pos+k``, take per-position targets (argmax or
        sampled), accept the longest draft prefix that matches, emit the
        targets over the accepted prefix plus the correction token, and
        advance. Freezes in-program on EOS, token budget, or cache
        capacity; emissions are -1-padded.

        Returns (emissions [spec_steps, k+1], cache, tokens, pos, pending,
        key, packed [active, hit_eos, emitted_total, pos]).
        """
        params = unpack_weights4(params)
        dparams = unpack_weights4(dparams)
        k = self.spec_k
        max_len = self.max_len
        idx_row = jnp.arange(max_len)
        iota = jnp.arange(k + 1)
        nsize = nka.shape[0] if nvals is not None else 0

        def step(carry, _):
            if dparams is not None:
                (cache, dcache_c, tokens, pos, pending, key, c_left,
                 active, hit_eos, rep, cstate) = carry
            else:
                (cache, tokens, pos, pending, key, c_left, active,
                 hit_eos, rep, cstate) = carry
                dcache_c = None
            # --- draft, source 1: most recent earlier occurrence of the
            # current trigram (falling back to the bigram); the k tokens
            # that followed it. Draft quality only affects SPEED — a bad
            # draft is simply rejected by the verify — so the
            # longer-context match raises acceptance without touching
            # correctness. PREFER matches whose k-token continuation is
            # fully materialized (j ≤ pos − k): tokens past ``pos`` are
            # unwritten buffer, so the naive most-recent match — which in
            # self-repetitive text sits at pos−1, exactly the quoting
            # case speculation targets — drafts garbage beyond the
            # overlap and caps acceptance near 1 (the round-4 on-chip
            # 1.27/round oracle finding). A partial-window match is kept
            # only as a last resort.
            a_tok = tokens[jnp.maximum(pos - 1, 0)]
            a2_tok = tokens[jnp.maximum(pos - 2, 0)]
            prev = jnp.concatenate([tokens[:1], tokens[:-1]])
            prev2 = jnp.concatenate([tokens[:2], tokens[:-2]])
            hit2 = ((idx_row >= 1) & (idx_row < pos)
                    & (prev == a_tok) & (tokens == pending))
            hit3 = hit2 & (idx_row >= 2) & (prev2 == a2_tok) & (pos >= 2)
            full = idx_row <= pos - k      # tokens[j+1..j+k] all written
            j3f = jnp.max(jnp.where(hit3 & full, idx_row, -1))
            j2f = jnp.max(jnp.where(hit2 & full, idx_row, -1))
            jf = jnp.where(j3f >= 0, j3f, j2f)
            j3 = jnp.max(jnp.where(hit3, idx_row, -1))
            j2 = jnp.max(jnp.where(hit2, idx_row, -1))
            j = jnp.where(jf >= 0, jf,
                          jnp.where(j3 >= 0, j3, j2))
            draft = jax.lax.dynamic_slice(tokens, (j + 1,), (k,))
            havek = jf >= 0                # a full-window draft exists
            if nvals is not None:
                # source 2, corpus table when no FULL in-sequence window
                # exists (its k-token chain beats a partial window): one
                # hash probe of the direct-mapped bigram table (same
                # uint32 Knuth hash the host builder used); a key
                # mismatch keeps the (possibly partial) sliced draft —
                # both only affect acceptance
                h = ((a_tok.astype(jnp.uint32)
                      * jnp.uint32(2654435761)
                      + pending.astype(jnp.uint32))
                     & jnp.uint32(nsize - 1)).astype(jnp.int32)
                ok = (~havek) & (nka[h] == a_tok) & (nkb[h] == pending)
                draft = jnp.where(ok, nvals[h], draft)
                havek = havek | ok
            if dparams is not None:
                # source 3, DRAFT MODEL when neither a full in-sequence
                # window nor a table hit exists (model drafts beat a
                # partial window too): k greedy steps of the small
                # decoder inside this program (inner lax.scan of 1-token
                # forwards — zero host dispatches); lax.cond skips the
                # whole scan on quoting rounds where a full-window
                # lookup/table already hit. Draft-cache writes made here
                # are NOT trusted — the round-end catch-up forward below
                # rewrites rows pos..pos+k from the true verify targets,
                # keeping the draft cache correct below the write pointer
                # whichever source won.
                def model_draft(dc):
                    def dstep(c, i):
                        dcache_i, tok_i = c
                        lgd, dcache_i = decoder_forward(
                            dparams, self.draft_cfg, tok_i[None, None],
                            (pos + i)[None, None], kv_cache=dcache_i,
                            cache_len=pos + i)
                        nxt = jnp.argmax(lgd[0, -1]).astype(jnp.int32)
                        return (dcache_i, nxt), nxt
                    (dc2, _), d = jax.lax.scan(dstep, (dc, pending),
                                               iota[:k])
                    return dc2, d
                dcache_c, mdraft = jax.lax.cond(
                    ~havek, model_draft, lambda dc: (dc, draft), dcache_c)
                draft = jnp.where(~havek, mdraft, draft)
            # --- verify: one forward of [pending, draft] at pos..pos+k
            seq = jnp.concatenate([pending[None], draft])[None, :]
            positions = (pos + iota)[None, :]
            logits, cache = decoder_forward(params, self.cfg, seq, positions,
                                            kv_cache=cache, cache_len=pos)
            lg = logits[0]                                   # [k+1, V]
            # HF-exact repetition penalty UNDER speculation: verify
            # position i predicts the token after [..., pending,
            # draft[0..i-1]], and for every position that is actually
            # used (i ≤ acceptance) the drafts before it equal the tokens
            # emitted before it — so the per-position seen-set is exactly
            # ``rep ∪ draft[0..i-1]``, computable in parallel. pen == 1.0
            # is a bitwise identity (apply_repetition_penalty).
            v = lg.shape[-1]
            draft_seen = jnp.cumsum(
                jax.nn.one_hot(draft, v, dtype=jnp.int32), axis=0) > 0
            masks = jnp.concatenate(
                [jnp.zeros((1, v), bool), draft_seen]) | rep[None, :]
            lg = apply_repetition_penalty(lg, masks, pen)
            if ctable is not None:
                # schema-DFA constraint UNDER speculation, same fold trick
                # as the penalty above: verify position i's allowed set is
                # a function of the DFA state after draft[0..i-1]. A draft
                # token with no valid transition makes its own position
                # mismatch (its masked prob is 0), so positions past an
                # invalid draft prefix are never used — leave them
                # unmasked rather than produce an all-(-inf) logits row.
                sts = [cstate]
                for i in range(k):
                    s = sts[-1]
                    sts.append(jnp.where(
                        s >= 0, ctable[jnp.maximum(s, 0), draft[i]],
                        jnp.int32(-1)))
                st_mat = jnp.stack(sts)                      # [k+1]
                st_c = jnp.maximum(st_mat, 0)
                row_c = ctable[st_c]                         # [k+1, V]
                eos_col = jnp.arange(v)[None, :] == eos_id
                allow = jnp.where(eos_col, cacc[st_c][:, None], row_c >= 0)
                # budget-forced completion per verify position: position
                # i emits after i earlier targets this round, so its
                # remaining budget is c_left − i (incl. itself)
                allow = budget_force(allow, row_c, cdist,
                                     (c_left - iota)[:, None], eos_col)
                allow = jnp.where((st_mat >= 0)[:, None], allow, True)
                lg = jnp.where(allow, lg, -1e30)
            if greedy:
                targets = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            else:
                ks = jax.random.split(key, k + 2)
                key = ks[0]
                targets = jax.vmap(
                    lambda l, s: jax.random.categorical(
                        s, _warp_filter(l, top_p, top_k, min_p)))(
                    lg / jnp.maximum(temp, 1e-6), ks[1:]).astype(jnp.int32)
            if dparams is not None:
                # round-end draft-cache catch-up: rewrite rows pos..pos+k
                # with the KV of [pending, targets[:k]] — position
                # pos+1+i's true token is targets[i] for every emitted i,
                # so the draft cache is correct below the next write
                # pointer regardless of which draft source won; rows past
                # it are stale-by-design and rewritten before attention.
                seq_d = jnp.concatenate([pending[None], targets[:k]]
                                        )[None, :]
                _, dcache_c = decoder_forward(dparams, self.draft_cfg,
                                              seq_d, positions,
                                              kv_cache=dcache_c,
                                              cache_len=pos)
            # --- acceptance: longest draft prefix equal to the targets
            acc = jnp.cumprod((draft == targets[:k]).astype(jnp.int32))
            a = jnp.sum(acc)                                 # 0..k
            cand = iota <= a                                 # emit g[0..a]
            ie = jnp.min(jnp.where(cand & (targets == eos_id), iota, k + 1))
            emit_mask = active & cand & (iota < ie) & (iota < c_left)
            emissions = jnp.where(emit_mask, targets, -1)
            n_emit = jnp.sum(emit_mask.astype(jnp.int32))
            # --- advance (all no-ops when frozen: n_emit == 0 and the
            # token scatter drops masked rows)
            wr = jnp.where(emit_mask, pos + 1 + iota, max_len)
            tokens = tokens.at[wr].set(targets, mode="drop")
            # the seen-set grows by exactly the emitted tokens (the
            # correction/bonus token is emitted too, matching the plain
            # engine's mask update order)
            rep = rep | jnp.any(
                jax.nn.one_hot(targets, rep.shape[0], dtype=jnp.bool_)
                & emit_mask[:, None], axis=0)
            # new pending = the correction/bonus token targets[a]; only
            # meaningful when the round wasn't cut by EOS/budget — in the
            # cut cases the stream is frozen and pending is never used
            new_pending = targets[jnp.minimum(a, k)]
            pending = jnp.where(active & (ie > a), new_pending, pending)
            pos = pos + jnp.where(active, n_emit, 0)
            c_left = c_left - n_emit
            if ctable is not None:
                # the DFA state advances over exactly the emitted tokens
                # (all DFA-valid by construction of the mask above)
                cs = cstate
                for i in range(k + 1):
                    nxt = jnp.where(cs >= 0,
                                    ctable[jnp.maximum(cs, 0), targets[i]],
                                    cs)
                    cs = jnp.where(emit_mask[i], nxt, cs)
                cstate = cs
            step_eos = active & (ie <= a)
            hit_eos = hit_eos | step_eos
            active = (active & ~step_eos & (c_left > 0)
                      & (pos + k <= max_len - 1))
            if dparams is not None:
                return (cache, dcache_c, tokens, pos, pending, key,
                        c_left, active, hit_eos, rep, cstate), emissions
            return (cache, tokens, pos, pending, key, c_left, active,
                    hit_eos, rep, cstate), emissions

        if dparams is not None:
            carry0 = (cache, dcache, tokens, pos, pending, key,
                      budget_left, jnp.bool_(True), jnp.bool_(False), rep,
                      cstate)
            (cache, dcache, tokens, pos, pending, key, c_left, active,
             hit_eos, rep, cstate), emissions = jax.lax.scan(
                step, carry0, None, length=self.spec_steps)
        else:
            carry0 = (cache, tokens, pos, pending, key, budget_left,
                      jnp.bool_(True), jnp.bool_(False), rep, cstate)
            (cache, tokens, pos, pending, key, c_left, active, hit_eos,
             rep, cstate), emissions = jax.lax.scan(step, carry0, None,
                                                    length=self.spec_steps)
        packed = jnp.stack([active.astype(jnp.int32),
                            hit_eos.astype(jnp.int32),
                            (budget_left - c_left), pos])
        return (emissions, cache, tokens, pos, pending, key, packed, rep,
                cstate, dcache)

    # ------------------------------------------------------- draft model
    def _draft_empty_cache(self):
        # cache dtype must match what the draft forward writes: the
        # checkpoint dtype (same rule as JaxDecoderLM._empty_cache)
        dcfg = self.draft_cfg
        hkv, d = dcfg.num_key_value_heads, dcfg.head_dim
        dt = self.draft_params["embed"].dtype
        return [(jnp.zeros((1, self.max_len, hkv, d), dt),
                 jnp.zeros((1, self.max_len, hkv, d), dt))
                for _ in range(dcfg.num_hidden_layers)]

    def _draft_prefill_chunk(self, dparams, dcache, ids, off, n):
        dparams = unpack_weights4(dparams)
        t = ids.shape[1]
        positions = off + jnp.arange(t, dtype=jnp.int32)[None, :]
        _, dcache = decoder_forward(dparams, self.draft_cfg, ids, positions,
                                    kv_cache=dcache, cache_len=off)
        return dcache

    def _draft_prefill(self, prompt_ids: List[int]):
        """Prefill the DRAFT model's cache with the prompt (chunked; the
        draft's first logits are never needed — round 1 forwards
        ``pending`` through the draft model itself)."""
        from legalrag_tpu.models.decoder import pad_bucket

        t = len(prompt_ids)
        c = self.prefill_chunk
        dcache = self._draft_empty_cache()
        for off in range(0, t, c):
            piece = list(prompt_ids[off:off + c])
            n = len(piece)
            cb = c if n == c else pad_bucket(n, hi=self.max_len - off)
            piece += [0] * (cb - n)
            dcache = self._draft_prefill_fn(
                self.draft_params, dcache, jnp.asarray([piece], jnp.int32),
                jnp.int32(off), jnp.int32(n))
        return dcache

    # ------------------------------------------------------------------ API
    def generate_stream(self, prompt_ids: List[int],
                        max_new_tokens: int = 256, temperature: float = 0.0,
                        top_p: float = 0.9, eos_id: Optional[int] = None,
                        seed: int = 0,
                        repetition_penalty: float = 1.0,
                        top_k: int = 0,
                        min_p: float = 0.0,
                        constrain: bool = False) -> Iterator[int]:
        if constrain and self.json_constraint is None:
            raise ValueError("constrain=True requires an engine built "
                             "with json_constraint / constrain_json")
        # the stats dict is created here and passed down so concurrent
        # misuse can't cross-wire the metrics; last_stats is a snapshot
        stats = {"launches": 0, "tokens": 0, "spec_rounds": 0}
        gen = self._generate_impl(prompt_ids, max_new_tokens, temperature,
                                  top_p, eos_id, seed, repetition_penalty,
                                  stats, top_k, min_p, constrain)
        try:
            yield from gen
        finally:
            st = stats
            if st.get("tokens"):
                from legalrag_tpu.utils.metrics import METRICS

                METRICS.inc("legalrag_gen_tokens", st["tokens"],
                            engine="spec")
                METRICS.inc("legalrag_gen_launches", st["launches"],
                            engine="spec")
                METRICS.inc("legalrag_gen_spec_rounds", st["spec_rounds"],
                            engine="spec")

    def _generate_impl(self, prompt_ids: List[int],
                       max_new_tokens: int = 256, temperature: float = 0.0,
                       top_p: float = 0.9, eos_id: Optional[int] = None,
                       seed: int = 0,
                       repetition_penalty: float = 1.0,
                       stats: Optional[Dict] = None,
                       top_k: int = 0,
                       min_p: float = 0.0,
                       constrain: bool = False) -> Iterator[int]:
        if self.spec_k <= 0:
            yield from super().generate_stream(
                prompt_ids, max_new_tokens, temperature, top_p, eos_id,
                seed, repetition_penalty, top_k, min_p, constrain)
            return
        t = len(prompt_ids)
        if t >= self.max_len:
            raise ValueError(
                f"prompt ({t} tokens) does not fit the {self.max_len}-token "
                "KV cache; truncate the prompt before generation")
        budget = self.max_len - t
        if max_new_tokens > budget:
            log.warning("max_new_tokens %d exceeds cache budget %d; clamping",
                        max_new_tokens, budget)
            max_new_tokens = budget
        if stats is None:
            stats = {"launches": 0, "tokens": 0, "spec_rounds": 0}
        self.last_stats = stats
        greedy = not temperature > 0
        with on_device(self.device):
            last2d, cache = self._prefill_prompt(list(prompt_ids))
            dcache = (self._draft_prefill(list(prompt_ids))
                      if self.draft_params is not None else None)
            key = jax.random.PRNGKey(seed)
            pen_j = jnp.float32(repetition_penalty)
            mask0 = np.zeros(self.cfg.vocab_size, bool)
            mask0[list(prompt_ids)] = True
            rep = jnp.asarray(mask0)
            jc = self.json_constraint if constrain else None
            cs = jnp.int32(jc.start if jc else 0)
            ceos = jnp.int32(-1 if eos_id is None else eos_id)
            ng = (self.ngram_draft.device_arrays(self.spec_k)
                  if self.ngram_draft is not None else (None, None, None))
            # the admission-time first token samples with the prompt-mask
            # penalty, exactly like the plain engine's first decode step
            last = apply_repetition_penalty(last2d, rep[None, :], pen_j)[0]
            if jc is not None:
                row = jc.table[cs]
                eos_col = jnp.arange(row.shape[0]) == ceos
                allowed = jnp.where(eos_col, jc.accepting[cs], row >= 0)
                allowed = budget_force(allowed, row, jc.dist,
                                       jnp.int32(max_new_tokens), eos_col)
                last = jnp.where(allowed, last, -1e30)
            if greedy:
                pending_h = int(np.argmax(np.asarray(last)))
            else:
                key, sub = jax.random.split(key)
                pending_h = int(_sample_top_p(
                    (last / jnp.float32(max(temperature, 1e-6)))[None, :],
                    jnp.float32(top_p), sub, jnp.int32(top_k),
                    jnp.float32(min_p))[0])
            rep = rep.at[pending_h].set(True)
            if eos_id is not None and pending_h == eos_id:
                return
            if jc is not None:
                cs = jnp.maximum(jc.table[cs, pending_h], 0)
            yield pending_h
            produced = 1
            stats["tokens"] = 1
            if produced >= max_new_tokens:
                return
            buf = np.zeros(self.max_len, np.int32)
            buf[:t] = prompt_ids
            buf[t] = pending_h
            tokens = jnp.asarray(buf)
            pos = jnp.int32(t)
            pending = jnp.int32(pending_h)
            temp_j = jnp.float32(max(temperature, 1e-6))
            tp_j = jnp.float32(top_p)
            tk_j = jnp.int32(top_k)
            mp_j = jnp.float32(min_p)
            eos_j = jnp.int32(-1 if eos_id is None else eos_id)
            pos_h = t
            # the spec program writes rows pos..pos+k per round; never
            # launch it where that range would not fit (the scalar-offset
            # cache write clamps rather than drops out of range)
            while pos_h + self.spec_k <= self.max_len - 1:
                (emissions, cache, tokens, pos, pending, key, packed,
                 rep, cs, dcache) = \
                    self._spec_fn(self.params, cache, tokens, pos, pending,
                                  key, temp_j, tp_j, tk_j, mp_j, eos_j,
                                  jnp.int32(max_new_tokens - produced),
                                  rep, pen_j, cs,
                                  jc.table if jc else None,
                                  jc.accepting if jc else None,
                                  *ng, self.draft_params, dcache,
                                  cdist=jc.dist if jc else None,
                                  greedy=greedy)
                em = np.asarray(emissions)
                st = np.asarray(packed)
                stats["launches"] += 1
                for row in em:
                    any_emit = False
                    for tok in row.tolist():
                        if tok < 0:
                            continue
                        any_emit = True
                        yield int(tok)
                        produced += 1
                        stats["tokens"] += 1
                        stats["spec_tokens"] = \
                            stats.get("spec_tokens", 0) + 1
                    if any_emit:
                        stats["spec_rounds"] += 1
                hit_eos = bool(st[1])
                pos_h = int(st[3])
                if hit_eos or produced >= max_new_tokens:
                    return
                if self.spec_adaptive > 0.0:
                    rounds = stats["spec_rounds"]
                    per_round = (stats.get("spec_tokens", 0)
                                 / max(rounds, 1))
                    # graduated probe: every probe launch a non-quoting
                    # stream pays is ~pure overhead, but a QUOTING stream
                    # may need one launch before in-sequence repetition
                    # is established. So after one launch (spec_steps
                    # rounds) bail only below the halfway bar (near-zero
                    # acceptance); after two launches apply the full
                    # threshold.
                    bar = (self.spec_adaptive
                           if rounds >= 2 * self.spec_steps
                           else 1.0 + 0.5 * (self.spec_adaptive - 1.0))
                    if rounds >= self.spec_steps and per_round < bar:
                        stats["adaptive_bailed"] = True
                        log.info(
                            "speculation off after %d rounds: %.2f "
                            "tokens/round < %.2f bar; finishing "
                            "with chunk-%d decode", rounds, per_round,
                            bar, self.decode_chunk)
                        break
            # Adaptive bail-out OR within spec_k of capacity — either way
            # finish the stream with the parent's chunked decode program
            # (same greedy/sampling semantics, budget-forced constraint).
            yield from self._finish_chunked(
                cache, int(pending), pos_h, rep, cs, key, produced,
                max_new_tokens, temp_j, tp_j, tk_j, mp_j, eos_id, pen_j,
                jc, greedy, stats)

    def _finish_chunked(self, cache, pending_h: int, pos_h: int, rep, cs,
                        key, produced: int, max_new_tokens: int, temp, tp,
                        tk, mp, eos_id, pen, jc, greedy: bool,
                        stats: Dict) -> Iterator[int]:
        """Continue a partially-generated stream with the parent's chunked
        decode program. State contract on entry: cache rows ``0..pos_h-1``
        are valid, ``pending_h`` (= the token at ``pos_h``) was emitted
        but never forwarded, ``rep [V]`` marks seen tokens, ``cs`` is the
        constraint DFA state. Used by the adaptive speculation bail-out
        and the near-capacity tail (both previously per-token)."""
        ceos = jnp.int32(-1 if eos_id is None else eos_id)
        # the final pending token was emitted but never forwarded; its
        # logits exist only after a forward — run it now
        last, cache = self._decode_step(
            self.params, jnp.asarray([[pending_h]], jnp.int32),
            jnp.int32(pos_h), cache)
        stats["launches"] += 1
        pos = pos_h + 1
        rep2 = rep[None, :]
        ctable = jc.table if jc else None
        cacc = jc.accepting if jc else None
        cdist = jc.dist if jc else None
        climit = jnp.int32(pos + (max_new_tokens - produced))
        while (produced < max_new_tokens
               and pos + self.decode_chunk <= self.max_len):
            # an arbitrary remainder (the bail point is data-dependent)
            # must NOT fall to per-token launches — on a ~200 ms/dispatch
            # relay that throws the whole bail-out away. Run the SAME
            # compiled full-chunk program and discard the surplus: the
            # discarded steps write cache rows we never attend again
            # (the stream ends here) and sample tokens we never emit.
            emit_n = min(self.decode_chunk, max_new_tokens - produced)
            toks, last, cache, key, rep2, cs = self._decode_chunk_fn(
                self.params, last, pos, cache, key, temp, tp, tk, mp,
                rep2, pen, cs, ctable, cacc, ceos, cdist, climit,
                n_steps=self.decode_chunk, greedy=greedy)
            stats["launches"] += 1
            pos += self.decode_chunk
            produced += emit_n
            for tok_host in np.asarray(toks)[:emit_n, 0].tolist():
                if eos_id is not None and tok_host == eos_id:
                    return
                yield int(tok_host)
                stats["tokens"] += 1
        for i in range(max_new_tokens - produced):
            if pos + i >= self.max_len:
                return
            scored = apply_repetition_penalty(last, rep2, pen)
            if jc is not None:
                row = jc.table[cs]
                eos_col = jnp.arange(row.shape[0]) == ceos
                allowed = jnp.where(eos_col, jc.accepting[cs], row >= 0)
                allowed = budget_force(allowed, row, cdist,
                                       climit - (pos + i), eos_col)
                scored = jnp.where(allowed[None, :], scored, -1e30)
            if greedy:
                tok = int(np.argmax(np.asarray(scored[0])))
            else:
                key, sub = jax.random.split(key)
                tok = int(_sample_top_p(scored / temp, tp, sub, tk, mp)[0])
            rep2 = rep2.at[0, tok].set(True)
            if eos_id is not None and tok == eos_id:
                return
            if jc is not None:
                cs = jnp.maximum(jc.table[cs, tok], 0)
            yield tok
            stats["tokens"] += 1
            if produced + i + 1 < max_new_tokens and pos + i + 1 < self.max_len:
                last, cache = self._decode_step(
                    self.params, jnp.asarray([[tok]], jnp.int32),
                    jnp.int32(pos + i), cache)
                stats["launches"] += 1
