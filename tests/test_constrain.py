"""Schema-constrained JSON decoding (models/constrain.py + engine
``constrain=True``): the byte DFA accepts exactly the schema language,
the token table lifts it over multi-byte tokens, and constrained
generation from a tiny RANDOM model always yields a prefix of a
schema-valid document — with EOS only at completion. CPU, no weights.

The reference has no structured-output guarantee (free-form HF
``model.generate``, reference ``llm/client.py:306-369``).
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.batched_decoder import BatchedDecoderLM
from legalrag_tpu.models.constrain import (SECTIONS_SCHEMA, JsonConstraint,
                                           build_schema_dfa,
                                           compile_token_table)
from legalrag_tpu.models.decoder import DecoderConfig, JaxDecoderLM
from legalrag_tpu.models.spec_decode import SpecLookupDecoderLM


def _accepts(trans, acc, text: str):
    st = 0
    for b in text.encode("utf-8"):
        st = trans[st, b]
        if st < 0:
            return None
    return bool(acc[st])


# ------------------------------------------------------------------ DFA

def test_dfa_accepts_schema_language():
    trans, acc = build_schema_dfa(SECTIONS_SCHEMA)
    good = [
        '{"sections": []}',
        '{"sections": [{"heading": "结论", "items": []}]}',
        '{"sections":[{"heading":"a","items":["x","y\\n"]},'
        '{"heading":"b","items":["第五百条"]}]} ',
        '{ "sections" : [ { "heading" : "h \\u4e2d", "items" : [ "i" ] } ] }',
    ]
    for g in good:
        assert _accepts(trans, acc, g) is True, g
        json.loads(g)  # and python agrees it is valid JSON
    prefixes = ['{"sections": [{"head', '{"sections": [{"heading": "a", ']
    for p in prefixes:
        assert _accepts(trans, acc, p) is False, p   # valid prefix, not done
    bad = ['{"wrong": []}', '{"sections": [],}', '{"sections": [{}]}',
           '{"sections": ["bare"]}', 'null', '{"sections": []}{',
           '{"sections": [ {"heading": "a"} ]}']
    for b in bad:
        assert _accepts(trans, acc, b) is None, b


def test_dfa_number_and_bool_leaves():
    trans, acc = build_schema_dfa({"n": "number", "ok": "bool"})
    assert _accepts(trans, acc, '{"n": -12.5e-3, "ok": true}') is True
    assert _accepts(trans, acc, '{"n": 12 3, "ok": true}') is None
    assert _accepts(trans, acc, '{"n": 4, "ok": maybe}') is None


# ----------------------------------------------------------- token table

def _toy_vocab():
    """id → text for a toy vocab that can COMPOSE complete schema
    documents (dead-end pruning removes token transitions that cannot
    reach acceptance, so the vocab must close everything it opens);
    id 0 = EOS (undecodable → banned except via accepting states)."""
    texts = [None,
             '{"sections"',        # 1
             ': [',                # 2
             '{"heading"',         # 3
             ': "',                # 4
             'law',                # 5
             '第五百条',            # 6
             '", "items": ["',     # 7: close heading, open first item
             '", "',               # 8: item separator
             '"]}',                # 9: close items + section object
             ', ',                 # 10: section separator
             ']}',                 # 11: close sections + root
             ' ',                  # 12
             'b',                  # 13
             '[]}',                # 14
             ]
    return texts


def test_token_table_multibyte_tokens():
    trans, acc = build_schema_dfa(SECTIONS_SCHEMA)
    texts = _toy_vocab()
    tb = [t.encode("utf-8") if t else None for t in texts]
    table, acc2 = compile_token_table(trans, acc, tb)
    assert table.shape == (trans.shape[0], len(texts))
    # from the start state, only document-opening tokens are legal
    start_allowed = {texts[v] for v in range(len(texts))
                     if table[0, v] >= 0}
    assert '{"sections"' in start_allowed
    assert 'law' not in start_allowed and '"' not in start_allowed
    # walk a full two-section document through the table
    st = 0
    for piece in ['{"sections"', ': [', '{"heading"', ': "', 'law',
                  '", "items": ["', '第五百条', '", "', 'law', '"]}',
                  ', ', '{"heading"', ': "', 'b', '", "items": ["', 'law',
                  '"]}', ']}']:
        v = texts.index(piece)
        st = table[st, v]
        assert st >= 0, piece
    assert bool(acc2[st])
    # the empty-document path also composes: {"sections": []}
    assert table[table[table[0, 1], 2], 11] >= 0


# ------------------------------------------------------ engine behavior

@pytest.fixture(scope="module")
def tiny_constrained():
    texts = _toy_vocab()
    cfg = DecoderConfig(vocab_size=len(texts), hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, intermediate_size=64,
                        max_position_embeddings=128)
    rng = np.random.default_rng(83)

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
    tb = [t.encode("utf-8") if t else None for t in texts]
    jc = JsonConstraint.from_schema(SECTIONS_SCHEMA, tb)
    return cfg, params, jc, texts


EOS = 0


def _decode_text(texts, toks):
    return "".join(texts[t] for t in toks if texts[t])


def _check_valid_prefix_or_doc(texts, toks, finished):
    """Constrained output must be a prefix of a schema-valid document;
    if the stream ended via EOS it must be the COMPLETE document."""
    trans, acc = build_schema_dfa(SECTIONS_SCHEMA)
    text = _decode_text(texts, toks)
    res = _accepts(trans, acc, text)
    assert res is not None, f"invalid output: {text!r}"
    if finished:
        assert res is True, f"EOS before completion: {text!r}"
        parsed = json.loads(text)
        assert "sections" in parsed


@pytest.mark.parametrize("temperature", [0.0, 0.9])
def test_single_stream_constrained_output_valid(tiny_constrained,
                                                temperature):
    cfg, params, jc, texts = tiny_constrained
    lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=4,
                      json_constraint=jc)
    for seed in range(3):
        toks = list(lm.generate_stream([12, 14, 12], max_new_tokens=40,
                                       temperature=temperature, seed=seed,
                                       eos_id=EOS, constrain=True))
        finished = len(toks) < 40
        _check_valid_prefix_or_doc(texts, toks, finished)


def test_unconstrained_same_engine_unaffected(tiny_constrained):
    cfg, params, jc, texts = tiny_constrained
    with_jc = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=4,
                           json_constraint=jc)
    without = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=4)
    a = list(with_jc.generate_stream([12, 14], max_new_tokens=10))
    b = list(without.generate_stream([12, 14], max_new_tokens=10))
    assert a == b


def test_constrain_requires_constraint(tiny_constrained):
    cfg, params, jc, texts = tiny_constrained
    lm = JaxDecoderLM(params, cfg, max_len=96)
    with pytest.raises(ValueError):
        next(lm.generate_stream([1, 2], max_new_tokens=4, constrain=True))


def test_batched_constrained_and_mixed(tiny_constrained):
    cfg, params, jc, texts = tiny_constrained
    import threading

    plain_ref = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    free_want = list(plain_ref.generate_stream([12, 14], max_new_tokens=12))
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              decode_chunk=4, json_constraint=jc)
    try:
        got = {}
        ts = [threading.Thread(target=lambda: got.__setitem__(
                  "c", list(engine.generate_stream(
                      [12, 14, 12], max_new_tokens=40, eos_id=EOS,
                      constrain=True)))),
              threading.Thread(target=lambda: got.__setitem__(
                  "f", list(engine.generate_stream(
                      [12, 14], max_new_tokens=12))))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        _check_valid_prefix_or_doc(texts, got["c"], len(got["c"]) < 40)
        assert got["f"] == free_want   # unconstrained slot untouched
    finally:
        engine.close()


def test_batched_matches_single_constrained_greedy(tiny_constrained):
    cfg, params, jc, texts = tiny_constrained
    lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1,
                      json_constraint=jc)
    want = list(lm.generate_stream([12, 14, 12], max_new_tokens=40,
                                   eos_id=EOS, constrain=True))
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              decode_chunk=4, json_constraint=jc)
    try:
        got = list(engine.generate_stream([12, 14, 12], max_new_tokens=40,
                                          eos_id=EOS, constrain=True))
    finally:
        engine.close()
    assert got == want


def test_spec_engine_constrained_greedy_exact(tiny_constrained):
    """The constraint is wired INTO the speculative verify program (a
    per-position DFA fold over the drafts, like the exact repetition
    penalty): greedy output is token-identical to the plain engine."""
    cfg, params, jc, texts = tiny_constrained
    plain = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1,
                         json_constraint=jc)
    want = list(plain.generate_stream([12, 14, 12], max_new_tokens=30,
                                      eos_id=EOS, constrain=True))
    spec = SpecLookupDecoderLM(params, cfg, max_len=96, spec_k=4,
                               spec_steps=2, json_constraint=jc)
    got = list(spec.generate_stream([12, 14, 12], max_new_tokens=30,
                                    eos_id=EOS, constrain=True))
    assert got == want


def test_spec_engine_constrained_sampled_valid(tiny_constrained):
    """Sampled constrained speculation still only emits schema-valid
    prefixes (acceptance may cut anywhere in the draft)."""
    cfg, params, jc, texts = tiny_constrained
    spec = SpecLookupDecoderLM(params, cfg, max_len=96, spec_k=4,
                               spec_steps=2, json_constraint=jc)
    for seed in range(3):
        toks = list(spec.generate_stream([12, 14, 12], max_new_tokens=36,
                                         temperature=0.9, seed=seed,
                                         eos_id=EOS, constrain=True))
        _check_valid_prefix_or_doc(texts, toks, len(toks) < 36)


def test_batched_spec_constrained_greedy_exact(tiny_constrained):
    """Constraint wired into the batched SPECULATIVE verify program
    (per-slot DFA fold over the drafts): greedy output is token-identical
    to the plain single-stream engine."""
    cfg, params, jc, texts = tiny_constrained
    plain = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1,
                         json_constraint=jc)
    want = list(plain.generate_stream([12, 14, 12], max_new_tokens=30,
                                      eos_id=EOS, constrain=True))
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              spec_k=4, spec_steps=2, json_constraint=jc)
    try:
        got = list(engine.generate_stream([12, 14, 12], max_new_tokens=30,
                                          eos_id=EOS, constrain=True))
    finally:
        engine.close()
    assert got == want


def test_batched_spec_constrained_mixed_slots(tiny_constrained):
    """A constrained and an unconstrained stream share the spec batch:
    the constrained one emits only schema-valid prefixes, the
    unconstrained one is bit-identical to running alone."""
    cfg, params, jc, texts = tiny_constrained
    import threading

    solo = BatchedDecoderLM(params, cfg, max_len=96, n_slots=1,
                            spec_k=4, spec_steps=2, json_constraint=jc)
    try:
        free_want = list(solo.generate_stream([12, 14],
                                              max_new_tokens=12))
    finally:
        solo.close()
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              spec_k=4, spec_steps=2, json_constraint=jc)
    try:
        got = {}
        ts = [threading.Thread(target=lambda: got.__setitem__(
                  "c", list(engine.generate_stream(
                      [12, 14, 12], max_new_tokens=36, temperature=0.9,
                      seed=5, eos_id=EOS, constrain=True)))),
              threading.Thread(target=lambda: got.__setitem__(
                  "f", list(engine.generate_stream(
                      [12, 14], max_new_tokens=12))))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        _check_valid_prefix_or_doc(texts, got["c"], len(got["c"]) < 36)
        assert got["f"] == free_want
    finally:
        engine.close()


def test_paged_matches_single_constrained_greedy(tiny_constrained):
    """Constraint wired into the PAGED engine's decode scan (per-slot
    DFA state, same token-table mask): greedy constrained output is
    token-identical to the plain single-stream engine."""
    from legalrag_tpu.models.paged_decoder import PagedDecoderLM

    cfg, params, jc, texts = tiny_constrained
    plain = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1,
                         json_constraint=jc)
    want = list(plain.generate_stream([12, 14, 12], max_new_tokens=40,
                                      eos_id=EOS, constrain=True))
    engine = PagedDecoderLM(params, cfg, max_len=96, n_slots=2,
                            decode_chunk=4, block_size=8,
                            json_constraint=jc)
    try:
        got = list(engine.generate_stream([12, 14, 12], max_new_tokens=40,
                                          eos_id=EOS, constrain=True))
    finally:
        engine.close()
    assert got == want


def test_paged_constrained_and_mixed(tiny_constrained):
    """A constrained and an unconstrained stream share the paged batch:
    the constrained one emits only schema-valid prefixes (sampled), the
    unconstrained one is bit-identical to the single-stream engine."""
    import threading

    from legalrag_tpu.models.paged_decoder import PagedDecoderLM

    cfg, params, jc, texts = tiny_constrained
    plain_ref = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    free_want = list(plain_ref.generate_stream([12, 14], max_new_tokens=12))
    engine = PagedDecoderLM(params, cfg, max_len=96, n_slots=2,
                            decode_chunk=4, block_size=8,
                            json_constraint=jc)
    try:
        got = {}
        ts = [threading.Thread(target=lambda: got.__setitem__(
                  "c", list(engine.generate_stream(
                      [12, 14, 12], max_new_tokens=36, temperature=0.9,
                      seed=5, eos_id=EOS, constrain=True)))),
              threading.Thread(target=lambda: got.__setitem__(
                  "f", list(engine.generate_stream(
                      [12, 14], max_new_tokens=12))))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
        _check_valid_prefix_or_doc(texts, got["c"], len(got["c"]) < 36)
        assert got["f"] == free_want
    finally:
        engine.close()


def test_paged_constrain_requires_constraint(tiny_constrained):
    from legalrag_tpu.models.paged_decoder import PagedDecoderLM

    cfg, params, jc, texts = tiny_constrained
    engine = PagedDecoderLM(params, cfg, max_len=96, n_slots=2,
                            decode_chunk=4, block_size=8)
    try:
        with pytest.raises(ValueError):
            next(engine.generate_stream([1, 2], max_new_tokens=4,
                                        constrain=True))
    finally:
        engine.close()


def test_tp_paged_constrained_matches_unsharded(tiny_constrained):
    """TP × json_constraint (ADVICE r3 #4): the constraint table and
    accepting arrays ride as plain replicated arrays inside the SHARDED
    paged decode program — greedy constrained output under
    apply_tp_to_engine must be token-identical to the unsharded
    constrained single-stream engine."""
    import jax

    from legalrag_tpu.models.paged_decoder import PagedDecoderLM
    from legalrag_tpu.parallel.decoder_tp import apply_tp_to_engine
    from legalrag_tpu.parallel.mesh import make_mesh

    devs = jax.devices("cpu")
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    cfg, params, jc, texts = tiny_constrained
    plain = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1,
                         json_constraint=jc)
    want = list(plain.generate_stream([12, 14, 12], max_new_tokens=40,
                                      eos_id=EOS, constrain=True))
    engine = PagedDecoderLM(params, cfg, max_len=96, n_slots=2,
                            decode_chunk=4, block_size=8,
                            json_constraint=jc)
    try:
        apply_tp_to_engine(engine, make_mesh(devs[:2], data=1, model=2))
        got = list(engine.generate_stream([12, 14, 12], max_new_tokens=40,
                                          eos_id=EOS, constrain=True))
    finally:
        engine.close()
    assert got == want
    _check_valid_prefix_or_doc(texts, got, len(got) < 40)


def test_apply_tp_rejects_active_streams(tiny_constrained):
    """apply_tp_to_engine swaps donated cache/pool buffers; it must
    refuse to run once a stream holds a slot (ADVICE r3 #3)."""
    import jax

    from legalrag_tpu.models.paged_decoder import PagedDecoderLM
    from legalrag_tpu.parallel.decoder_tp import apply_tp_to_engine
    from legalrag_tpu.parallel.mesh import make_mesh

    devs = jax.devices("cpu")
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    cfg, params, jc, texts = tiny_constrained
    engine = PagedDecoderLM(params, cfg, max_len=96, n_slots=2,
                            decode_chunk=4, block_size=8)
    try:
        # mark a slot occupied directly — driving a real stream here is
        # racy (the worker thread can finish it and free the slot before
        # the guard runs); the guard only inspects slot occupancy
        engine._slots[0] = object()
        with pytest.raises(RuntimeError, match="before any stream"):
            apply_tp_to_engine(engine, make_mesh(devs[:2], data=1,
                                                 model=2))
        engine._slots[0] = None
        apply_tp_to_engine(engine, make_mesh(devs[:2], data=1, model=2))
    finally:
        engine.close()


# --------------------------------------------- budget-forced completion

def test_token_dist_to_accept():
    """dist[s] = min tokens to acceptance over the token table; the toy
    vocab's shortest document is 3 tokens ({"sections" / : [ / ]})."""
    from legalrag_tpu.models.constrain import token_dist_to_accept

    trans, acc = build_schema_dfa(SECTIONS_SCHEMA)
    texts = _toy_vocab()
    tb = [t.encode("utf-8") if t else None for t in texts]
    table, acc2 = compile_token_table(trans, acc, tb)
    dist = token_dist_to_accept(table, acc2)
    assert (dist[acc2] == 0).all()
    assert dist[0] == 3
    # dead-end pruning guarantees every state the table reaches is live
    reached = np.unique(table[table >= 0])
    assert (dist[reached] < (1 << 24)).all()


def test_min_budget_exposed(tiny_constrained):
    cfg, params, jc, texts = tiny_constrained
    assert jc.min_budget == 3


def _assert_complete(texts, toks):
    text = _decode_text(texts, toks)
    trans, acc = build_schema_dfa(SECTIONS_SCHEMA)
    assert _accepts(trans, acc, text) is True, f"incomplete: {text!r}"
    json.loads(text)


@pytest.mark.parametrize("temperature", [0.0, 0.9])
@pytest.mark.parametrize("budget", [3, 7, 14])
def test_single_stream_budget_forced_complete(tiny_constrained,
                                              temperature, budget):
    """With budget forcing, every constrained stream whose budget covers
    the schema's shortest document ends COMPLETE — even when sampling
    would otherwise keep opening new sections/items past the budget."""
    cfg, params, jc, texts = tiny_constrained
    lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=4,
                      json_constraint=jc)
    for seed in range(3):
        toks = list(lm.generate_stream([12, 14, 12],
                                       max_new_tokens=budget,
                                       temperature=temperature, seed=seed,
                                       eos_id=EOS, constrain=True))
        assert len(toks) <= budget
        _assert_complete(texts, toks)


@pytest.mark.parametrize("temperature", [0.0, 0.9])
def test_batched_budget_forced_complete(tiny_constrained, temperature):
    """Batched engine: forcing starts at the first in-scan step (the
    admission token keeps the full budget), so budgets with one token of
    headroom over min_budget always complete."""
    cfg, params, jc, texts = tiny_constrained
    engine = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                              decode_chunk=4, json_constraint=jc)
    try:
        for seed, budget in ((0, 8), (1, 8), (2, 13)):
            toks = list(engine.generate_stream(
                [12, 14, 12], max_new_tokens=budget, eos_id=EOS,
                temperature=temperature, seed=seed, constrain=True))
            assert len(toks) <= budget
            _assert_complete(texts, toks)
    finally:
        engine.close()


@pytest.mark.parametrize("temperature", [0.0, 0.9])
def test_paged_budget_forced_complete(tiny_constrained, temperature):
    from legalrag_tpu.models.paged_decoder import PagedDecoderLM

    cfg, params, jc, texts = tiny_constrained
    engine = PagedDecoderLM(params, cfg, max_len=96, n_slots=2,
                            decode_chunk=4, block_size=8,
                            json_constraint=jc)
    try:
        for seed, budget in ((0, 8), (1, 13)):
            toks = list(engine.generate_stream(
                [12, 14, 12], max_new_tokens=budget, eos_id=EOS,
                temperature=temperature, seed=seed, constrain=True))
            assert len(toks) <= budget
            _assert_complete(texts, toks)
    finally:
        engine.close()


def test_spec_budget_forced_complete(tiny_constrained):
    """Speculative engine: forcing is applied per verify position with a
    per-position budget (c_left − i), so accepted drafts can never
    overshoot past a completable suffix."""
    cfg, params, jc, texts = tiny_constrained
    spec = SpecLookupDecoderLM(params, cfg, max_len=96, spec_k=4,
                               spec_steps=2, json_constraint=jc)
    for seed, budget in ((0, 7), (1, 12), (2, 16)):
        toks = list(spec.generate_stream([12, 14, 12],
                                         max_new_tokens=budget,
                                         temperature=0.9, seed=seed,
                                         eos_id=EOS, constrain=True))
        assert len(toks) <= budget
        _assert_complete(texts, toks)


def test_budget_forced_greedy_parity_across_engines(tiny_constrained):
    """Forcing preserves cross-engine greedy parity at tight budgets."""
    from legalrag_tpu.models.paged_decoder import PagedDecoderLM

    cfg, params, jc, texts = tiny_constrained
    plain = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1,
                         json_constraint=jc)
    want = list(plain.generate_stream([12, 14, 12], max_new_tokens=9,
                                      eos_id=EOS, constrain=True))
    _assert_complete(texts, want)
    batched = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2,
                               decode_chunk=4, json_constraint=jc)
    try:
        got_b = list(batched.generate_stream([12, 14, 12],
                                             max_new_tokens=9,
                                             eos_id=EOS, constrain=True))
    finally:
        batched.close()
    paged = PagedDecoderLM(params, cfg, max_len=96, n_slots=2,
                           decode_chunk=4, block_size=8,
                           json_constraint=jc)
    try:
        got_p = list(paged.generate_stream([12, 14, 12], max_new_tokens=9,
                                           eos_id=EOS, constrain=True))
    finally:
        paged.close()
    assert got_b == want and got_p == want


def test_infeasible_budget_still_valid_prefix(tiny_constrained):
    """A budget below the shortest document can't complete; forcing
    falls back to plain DFA masking (best-effort valid prefix)."""
    cfg, params, jc, texts = tiny_constrained
    lm = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=4,
                      json_constraint=jc)
    toks = list(lm.generate_stream([12, 14, 12], max_new_tokens=2,
                                   eos_id=EOS, constrain=True))
    trans, acc = build_schema_dfa(SECTIONS_SCHEMA)
    assert _accepts(trans, acc, _decode_text(texts, toks)) is not None
