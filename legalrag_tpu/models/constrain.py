"""Schema-constrained JSON decoding — a token-level DFA mask, TPU-native.

The RAG answer contract is structured JSON (``{"sections": [{"heading":
…, "items": […]}]}`` — prompts/prompt_*.json; the SSE scanner
api/answer_scanner.py parses it incrementally). A free-running model can
emit malformed JSON and silently degrade the structured event stream;
this module makes that impossible: decoding is constrained so that every
emitted token keeps the output a prefix of a schema-valid JSON document,
and EOS is only reachable once the document is complete.

Design (the outlines/jsonformer idea, expressed for XLA):

1. ``build_schema_dfa`` compiles a JSON **schema** (fixed-key objects,
   homogeneous arrays, string/number/bool leaves) into a byte-level DFA.
   Schemas linearize JSON's nesting, so the automaton is finite and tiny
   (O(template length) states) — no pushdown needed.
2. ``compile_token_table`` lifts the byte DFA to the tokenizer's vocab:
   ``table[s, v]`` = DFA state after emitting token ``v``'s bytes from
   state ``s`` (−1 = forbidden). A vectorized numpy walk over the padded
   token-byte matrix — seconds even for 150k vocabs.
3. At decode time the engines carry one int32 DFA state per stream and
   apply ``table[state] >= 0`` as a hard logits mask (EOS allowed only in
   accepting states) — two gathers per step inside the jitted scan, no
   host round trips. State update: ``state = table[state, tok]``.
4. ``token_dist_to_accept`` precomputes each state's minimum tokens to
   acceptance; ``budget_force`` additionally masks to transitions that
   can still finish within the stream's remaining budget, so constrained
   streams END COMPLETE whenever ``max_new_tokens ≥ min_budget`` (the
   jsonformer/outlines max-length guarantee), in every engine including
   under speculation.

The constraint is a logits *processor* (HF ``prefix_allowed_tokens_fn``
altitude): it applies before the temperature/top-k/top-p/min-p warpers,
so sampling renormalizes over the valid set. The reference has no
structured-output guarantee at all (free-form ``model.generate``,
reference ``llm/client.py:306-369``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

WS = b" \t\n\r"
STRING_BODY_EXTRA = bytes(range(0x80, 0x100))  # raw UTF-8 continuation ok


class _DFA:
    """Mutable byte-DFA builder: states are ints, trans[s][byte] = s'."""

    def __init__(self):
        self.trans: List[Dict[int, int]] = []
        self.accepting: List[bool] = []
        self.number_aliases: List[Tuple[int, Tuple[int, ...]]] = []

    def state(self, accepting: bool = False) -> int:
        self.trans.append({})
        self.accepting.append(accepting)
        return len(self.trans) - 1

    def edge(self, src: int, chars: bytes, dst: int) -> None:
        for c in chars:
            self.trans[src][c] = dst

    def ws_loop(self, s: int) -> None:
        self.edge(s, WS, s)


def _add_string(d: _DFA, start: int, end: int) -> None:
    """Wire a JSON string literal from ``start`` (expects ``"``) to
    ``end`` (just after the closing quote). Handles escapes and \\uXXXX;
    any byte ≥ 0x20 except ``"``/``\\`` passes raw (incl. UTF-8 bytes)."""
    body = d.state()
    esc = d.state()
    hexs = [d.state() for _ in range(4)]
    d.edge(start, b'"', body)
    raw = bytes(c for c in range(0x20, 0x80) if c not in b'"\\')
    d.edge(body, raw + STRING_BODY_EXTRA, body)
    d.edge(body, b"\\", esc)
    d.edge(body, b'"', end)
    d.edge(esc, b'"\\/bfnrt', body)
    d.edge(esc, b"u", hexs[0])
    hexdig = b"0123456789abcdefABCDEF"
    for i in range(3):
        d.edge(hexs[i], hexdig, hexs[i + 1])
    d.edge(hexs[3], hexdig, body)


def _add_number(d: _DFA, start: int, end: int) -> None:
    """JSON number from ``start``; a number has no terminator byte of its
    own, so the complete-number states (int/frac/exp) are recorded as
    ALIASES of ``end`` — at finalize time they inherit ``end``'s outgoing
    delimiter/whitespace edges (which the parent wires after this call)
    and its accepting flag, without inheriting each other's digit edges
    (so ``12 3`` stays invalid)."""
    digits = b"0123456789"
    neg = d.state()
    ni = d.state()                               # integer part complete
    d.edge(start, b"-", neg)
    d.edge(start, digits, ni)
    d.edge(neg, digits, ni)
    d.edge(ni, digits, ni)
    dot = d.state()
    frac = d.state()
    d.edge(ni, b".", dot)
    d.edge(dot, digits, frac)
    d.edge(frac, digits, frac)
    e = d.state()
    esign = d.state()
    exp = d.state()
    d.edge(ni, b"eE", e)
    d.edge(frac, b"eE", e)
    d.edge(e, b"+-", esign)
    d.edge(e, digits, exp)
    d.edge(esign, digits, exp)
    d.edge(exp, digits, exp)
    d.number_aliases.append((end, (ni, frac, exp)))


def _add_literal(d: _DFA, start: int, word: bytes, end: int) -> None:
    s = start
    for i, c in enumerate(word):
        nxt = end if i == len(word) - 1 else d.state()
        d.edge(s, bytes([c]), nxt)
        s = nxt


def _add_value(d: _DFA, schema, start: int, end: int) -> None:
    """Wire one schema node from ``start`` (expects the value's first
    byte, whitespace-tolerant) to ``end`` (just after the value)."""
    d.ws_loop(start)
    if schema == "string":
        _add_string(d, start, end)
    elif schema == "number":
        _add_number(d, start, end)
    elif schema == "bool":
        _add_literal(d, start, b"true", end)
        _add_literal(d, start, b"false", end)
    elif isinstance(schema, list):
        # homogeneous array, zero or more elements
        assert len(schema) == 1, "array schema takes one element type"
        opened = d.state()
        d.edge(start, b"[", opened)
        d.ws_loop(opened)
        d.edge(opened, b"]", end)
        elem_end = d.state()
        _add_value(d, schema[0], opened, elem_end)
        d.ws_loop(elem_end)
        d.edge(elem_end, b"]", end)
        again = d.state()
        d.edge(elem_end, b",", again)
        _add_value(d, schema[0], again, elem_end)
    elif isinstance(schema, dict):
        # fixed keys, fixed order, all required
        assert schema, "object schema needs at least one key"
        opened = d.state()
        d.edge(start, b"{", opened)
        d.ws_loop(opened)
        cur = opened
        keys = list(schema.items())
        for i, (key, sub) in enumerate(keys):
            after_key = d.state()
            # the key is a fixed literal string
            _add_literal(d, cur, b'"' + key.encode("utf-8") + b'"',
                         after_key)
            d.ws_loop(after_key)
            colon = d.state()
            d.edge(after_key, b":", colon)
            val_end = d.state()
            _add_value(d, sub, colon, val_end)
            d.ws_loop(val_end)
            if i + 1 < len(keys):
                nxt = d.state()
                d.edge(val_end, b",", nxt)
                d.ws_loop(nxt)
                cur = nxt
            else:
                d.edge(val_end, b"}", end)
    else:
        raise ValueError(f"unsupported schema node: {schema!r}")


def build_schema_dfa(schema) -> Tuple[np.ndarray, np.ndarray]:
    """Schema → (trans [S, 256] int32 with −1 = forbidden, accepting [S]
    bool). Accepting = document complete (only trailing whitespace may
    follow)."""
    d = _DFA()
    start = d.state()
    end = d.state(accepting=True)
    _add_value(d, schema, start, end)
    d.ws_loop(end)
    # number aliases: complete-number states inherit their end state's
    # delimiter/whitespace edges and accepting flag (wired by the parent
    # after _add_number ran), keeping their own digit/dot/exp edges
    for base, aliases in d.number_aliases:
        for alias in aliases:
            for c, dst in d.trans[base].items():
                if c not in d.trans[alias]:
                    d.trans[alias][c] = dst
            if d.accepting[base]:
                d.accepting[alias] = True
    n = len(d.trans)
    trans = np.full((n, 256), -1, np.int32)
    for s, edges in enumerate(d.trans):
        for c, dst in edges.items():
            trans[s, c] = dst
    return trans, np.asarray(d.accepting, bool)


def compile_token_table(trans: np.ndarray, accepting: np.ndarray,
                        token_bytes: List[Optional[bytes]]
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Lift the byte DFA to the vocab: returns (table [S, V] int32 with
    −1 = forbidden, accepting [S] bool). ``token_bytes[v] = None`` (or
    ``b""``) bans token v everywhere (special / undecodable tokens)."""
    n_states, v = trans.shape[0], len(token_bytes)
    max_len = max((len(t) for t in token_bytes if t), default=1)
    mat = np.zeros((v, max_len), np.int32)
    lens = np.zeros(v, np.int32)
    for i, t in enumerate(token_bytes):
        if t:
            b = np.frombuffer(t, np.uint8)
            mat[i, :len(b)] = b
            lens[i] = len(b)
    # walk all (state, token) pairs one byte position at a time; a
    # forbidden transition pins the pair at -1
    state = np.broadcast_to(np.arange(n_states, dtype=np.int32)[:, None],
                            (n_states, v)).copy()
    for pos in range(max_len):
        mask = (lens > pos)[None, :] & (state >= 0)
        nxt = trans[np.maximum(state, 0), mat[:, pos][None, :]]
        state = np.where(mask, nxt, state)
    table = np.where((lens > 0)[None, :], state, -1).astype(np.int32)
    # prune DEAD ENDS at the token level: a byte-DFA state can be
    # reachable yet have no continuation in THIS vocab (e.g. a banned
    # byte mid-literal). Iteratively drop transitions into states that
    # are neither accepting nor lead (transitively) to a live state —
    # then every state the mask can reach has a token path to acceptance
    # and the engines never face an all-masked logits row.
    live = accepting.copy()
    while True:
        into_live = (table >= 0) & live[np.maximum(table, 0)]
        new_live = live | into_live.any(axis=1)
        if (new_live == live).all():
            break
        live = new_live
    if not live[0]:
        raise ValueError(
            "schema is unreachable with this vocabulary (every path hits "
            "a token-level dead end) — check token_bytes coverage")
    table = np.where((table >= 0) & live[np.maximum(table, 0)], table, -1)
    # post-condition the engines rely on (their in-scan advance clamps a
    # -1 transition to state 0 only as defense-in-depth): every state the
    # table can transition INTO is live — accepting, or with at least one
    # outgoing token transition — so a constrained slot can never face an
    # all-masked logits row / dead state at decode time.
    reached = np.unique(table[table >= 0])
    dead = reached[~(accepting[reached] | (table[reached] >= 0).any(axis=1))]
    assert dead.size == 0, f"token DFA kept dead states {dead.tolist()}"
    return table.astype(np.int32), accepting


def budget_force(allowed, row, cdist, left, eos_col):
    """Budget-forced completion mask (shared by every engine's in-scan
    constraint): restrict ``allowed`` ([..., V] bool) to transitions
    whose ``dist[next] <= left − 1`` so the remaining budget always
    suffices to finish the document. ``row`` is the DFA transition row
    ([..., V] int32), ``left`` the remaining token budget INCLUDING the
    token being sampled (broadcastable to [..., 1]), ``eos_col`` the EOS
    column mask (EOS keeps its ``allowed`` value — legal only in
    accepting states, where dist is already 0). When nothing fits (the
    budget was infeasible from the start) the row falls back to plain
    ``allowed``: best-effort valid prefix instead of an all-masked row."""
    import jax.numpy as jnp

    feas = allowed & (eos_col | (cdist[jnp.maximum(row, 0)] <= left - 1))
    ok = jnp.any(feas, axis=-1, keepdims=True)
    return jnp.where(ok, feas, allowed)


def token_dist_to_accept(table: np.ndarray,
                         accepting: np.ndarray) -> np.ndarray:
    """Minimum number of TOKENS from each DFA state to an accepting
    state, over the token-level table ([S, V] int32, −1 forbidden).

    Powers budget-forced completion: near the end of a stream's token
    budget the engines restrict the mask to transitions whose
    ``dist[next] <= tokens_left − 1``, so a constrained stream ends as a
    COMPLETE schema-valid document whenever the budget allows one (the
    jsonformer/outlines max-length guarantee; the reference has no
    structured output at all). ``compile_token_table`` prunes dead ends,
    so every state has finite distance; unreachable is clamped large."""
    big = np.int32(1 << 24)
    s_n = table.shape[0]
    # compact adjacency (unique successor states per state): the value
    # iteration is then O(iters × total_edges), not O(iters × S × V)
    nexts = [np.unique(table[s][table[s] >= 0]) for s in range(s_n)]
    dist = np.where(accepting, 0, int(big)).astype(np.int64)
    changed = True
    while changed:
        changed = False
        for s in range(s_n):
            if nexts[s].size:
                nd = 1 + dist[nexts[s]].min()
                if nd < dist[s]:
                    dist[s] = nd
                    changed = True
    return np.minimum(dist, big).astype(np.int32)


SECTIONS_SCHEMA = {"sections": [{"heading": "string",
                                 "items": ["string"]}]}


class JsonConstraint:
    """Device-ready constraint: ``table`` [S, V] int32 (−1 forbidden),
    ``accepting`` [S] bool, ``start`` state. One instance per engine
    (the schema is an engine-level contract); streams opt in per call."""

    def __init__(self, table: np.ndarray, accepting: np.ndarray,
                 start: int = 0):
        import jax.numpy as jnp

        dist = token_dist_to_accept(np.asarray(table),
                                    np.asarray(accepting))
        self.table = jnp.asarray(table)
        self.accepting = jnp.asarray(accepting)
        # [S] min tokens to acceptance (budget-forced completion)
        self.dist = jnp.asarray(dist)
        # smallest budget that can complete a document from the start
        # state — callers can validate max_new_tokens up front
        self.min_budget = int(dist[start])
        self.start = start

    @classmethod
    def from_schema(cls, schema, token_bytes: List[Optional[bytes]]
                    ) -> "JsonConstraint":
        trans, acc = build_schema_dfa(schema)
        table, acc = compile_token_table(trans, acc, token_bytes)
        return cls(table, acc)

    @classmethod
    def from_tokenizer(cls, schema, tokenizer) -> "JsonConstraint":
        """Build from a HF tokenizer. Tokens that do not round-trip to
        clean bytes (specials, byte-fallback pieces that decode to
        U+FFFD) are banned under constraint — output stays valid; exotic
        byte sequences lose a little expressivity."""
        v = len(tokenizer)
        token_bytes: List[Optional[bytes]] = [None] * v
        specials = set(getattr(tokenizer, "all_special_ids", []) or [])
        for i in range(v):
            if i in specials:
                continue
            text = tokenizer.decode([i])
            if not text or "�" in text:
                continue
            token_bytes[i] = text.encode("utf-8")
        return cls.from_schema(schema, token_bytes)
