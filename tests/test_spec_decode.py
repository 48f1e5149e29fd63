"""Prompt-lookup speculative decoding: greedy output must be
token-identical to plain decoding across acceptance/rejection mixes, EOS,
budget, and the capacity tail — tiny random-init config."""

import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.decoder import DecoderConfig, JaxDecoderLM
from legalrag_tpu.models.spec_decode import SpecLookupDecoderLM


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=128,
                        tie_word_embeddings=True)
    rng = np.random.default_rng(11)

    # 0.3/0.5 init keeps the greedy stream DIVERSE: at the earlier 0.05
    # init this tiny model collapsed to repeating the prompt's last token,
    # making every token-parity assertion in this file near-vacuous.
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


# prompts chosen to exercise both draft acceptance (repetitive structure
# the bigram lookup can exploit) and rejection (varied tokens)
PROMPTS = [
    [5, 6, 7, 5, 6, 7, 5, 6],          # strong bigram repeats
    [12, 41, 3, 3, 3, 3, 9],           # degenerate run + tail
    [22, 81, 14, 60, 33],              # no structure — rejections
    [2, 2],                            # minimal prompt
]


def test_greedy_token_identical_to_plain(tiny):
    cfg, params = tiny
    ref = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    spec = SpecLookupDecoderLM(params, cfg, max_len=96, spec_k=4,
                               spec_steps=2)
    for p in PROMPTS:
        want = list(ref.generate_stream(p, max_new_tokens=17))
        got = list(spec.generate_stream(p, max_new_tokens=17))
        assert got == want, p
        assert spec.last_stats["tokens"] == len(got)
        assert spec.last_stats["launches"] >= 1


def test_eos_matches_plain(tiny):
    cfg, params = tiny
    ref = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    spec = SpecLookupDecoderLM(params, cfg, max_len=96, spec_k=4,
                               spec_steps=2)
    for p in PROMPTS[:2]:
        full = list(ref.generate_stream(p, max_new_tokens=12))
        eos = full[5]
        want = list(ref.generate_stream(p, max_new_tokens=12, eos_id=eos))
        got = list(spec.generate_stream(p, max_new_tokens=12, eos_id=eos))
        assert got == want, p


def test_capacity_tail_matches_plain(tiny):
    """max_len small enough that the spec loop freezes for capacity and
    the per-token tail finishes the stream."""
    cfg, params = tiny
    ref = JaxDecoderLM(params, cfg, max_len=24, decode_chunk=1)
    spec = SpecLookupDecoderLM(params, cfg, max_len=24, spec_k=6,
                               spec_steps=2)
    p = PROMPTS[0]
    want = list(ref.generate_stream(p, max_new_tokens=100))  # clamps to 16
    got = list(spec.generate_stream(p, max_new_tokens=100))
    assert got == want
    assert len(got) == 24 - len(p)


def test_budget_exact(tiny):
    cfg, params = tiny
    spec = SpecLookupDecoderLM(params, cfg, max_len=96, spec_k=4,
                               spec_steps=3)
    for n in (1, 2, 7, 13):
        got = list(spec.generate_stream(PROMPTS[1], max_new_tokens=n))
        assert len(got) == n


def test_sampled_deterministic_and_valid(tiny):
    cfg, params = tiny
    spec = SpecLookupDecoderLM(params, cfg, max_len=96, spec_k=4,
                               spec_steps=2)
    kw = dict(max_new_tokens=9, temperature=0.8, top_p=0.9, seed=5)
    out1 = list(spec.generate_stream(PROMPTS[0], **kw))
    out2 = list(spec.generate_stream(PROMPTS[0], **kw))
    assert out1 == out2
    assert len(out1) == 9
    assert all(0 <= t < cfg.vocab_size for t in out1)


def test_spec_k_zero_is_plain_passthrough(tiny):
    cfg, params = tiny
    ref = JaxDecoderLM(params, cfg, max_len=64)
    spec = SpecLookupDecoderLM(params, cfg, max_len=64, spec_k=0)
    p = PROMPTS[2]
    assert (list(spec.generate_stream(p, max_new_tokens=8))
            == list(ref.generate_stream(p, max_new_tokens=8)))


def test_prompt_too_long_raises(tiny):
    cfg, params = tiny
    spec = SpecLookupDecoderLM(params, cfg, max_len=16, spec_k=4)
    with pytest.raises(ValueError):
        list(spec.generate_stream(list(range(1, 20)), max_new_tokens=2))


def test_sampled_spec_is_distribution_exact(tiny):
    """Speculative sampling must preserve the sampling distribution
    (accept-while-equal is exact for any proposal). Compare empirical
    next-token distributions, spec vs plain, over many seeds at a
    position INSIDE the speculation loop."""
    cfg, params = tiny
    plain = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=4)
    spec = SpecLookupDecoderLM(params, cfg, max_len=64, spec_k=4,
                               spec_steps=2)
    prompt = [5, 6, 7, 5, 6]
    n = 300
    kw = dict(max_new_tokens=3, temperature=1.2, top_p=0.95)

    def counts(engine):
        c = {}
        for seed in range(n):
            toks = list(engine.generate_stream(prompt, seed=seed, **kw))
            # position 2 = the second generated token: produced by the
            # first speculation round in the spec engine
            c[toks[1]] = c.get(toks[1], 0) + 1
        return c

    cp, cs = counts(plain), counts(spec)
    support = set(cp) | set(cs)
    tv = 0.5 * sum(abs(cp.get(t, 0) - cs.get(t, 0)) for t in support) / n
    # total-variation noise floor for n=300 is ~0.1; a broken acceptance
    # rule (e.g. biased toward drafts) shifts mass far more than 0.2
    assert tv < 0.2, (tv, cp, cs)


def test_adaptive_bailout_matches_plain(tiny):
    """Round-5: with ``spec_adaptive`` set, an engine whose measured
    acceptance is below the threshold must STOP speculating after the
    probe window and finish with the parent's chunked program —
    same tokens, fewer launches than per-token tailing."""
    cfg, params = tiny
    ref = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    # threshold above the k+1 per-round maximum -> always bails once the
    # probe window (spec_steps rounds = one launch) has run
    spec = SpecLookupDecoderLM(params, cfg, max_len=96, spec_k=4,
                               spec_steps=2, spec_adaptive=10.0,
                               decode_chunk=8)
    for p in PROMPTS:
        want = list(ref.generate_stream(p, max_new_tokens=40))
        got = list(spec.generate_stream(p, max_new_tokens=40))
        assert got == want, p
        assert spec.last_stats.get("adaptive_bailed") is True
        assert spec.last_stats["tokens"] == len(got)


def test_adaptive_bailout_respects_eos(tiny):
    cfg, params = tiny
    ref = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    spec = SpecLookupDecoderLM(params, cfg, max_len=96, spec_k=4,
                               spec_steps=2, spec_adaptive=10.0,
                               decode_chunk=8)
    p = PROMPTS[0]
    full = list(ref.generate_stream(p, max_new_tokens=40))
    eos = full[30]  # after the bail point
    want = list(ref.generate_stream(p, max_new_tokens=40, eos_id=eos))
    got = list(spec.generate_stream(p, max_new_tokens=40, eos_id=eos))
    assert got == want


def test_adaptive_keeps_speculating_when_accepting():
    """High-acceptance stream + a realistic threshold -> no bail-out; the
    adaptive knob must never turn off speculation that is paying."""
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=256,
                        tie_word_embeddings=True)
    rng = np.random.default_rng(3)

    def mat(i, o, scale=0.04):  # weak init -> repetitive greedy stream
        return jnp.asarray(rng.standard_normal((i, o)) * scale, jnp.float32)

    h, ff, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    hkv = cfg.num_key_value_heads
    embed = mat(cfg.vocab_size, h, 0.1)
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
    prompt = rng.integers(1, cfg.vocab_size - 1, 24).tolist()
    plain = JaxDecoderLM(params, cfg, max_len=256, decode_chunk=8)
    plain_out = list(plain.generate_stream(prompt, max_new_tokens=64))
    spec = SpecLookupDecoderLM(params, cfg, max_len=256, spec_k=8,
                               spec_steps=4, spec_adaptive=2.0)
    out = list(spec.generate_stream(prompt, max_new_tokens=64))
    assert out == plain_out
    st = spec.last_stats
    assert not st.get("adaptive_bailed", False), st
    assert (st["tokens"] - 1) / max(st["spec_rounds"], 1) >= 2.0


def test_client_plumbs_spec_adaptive(monkeypatch):
    from legalrag_tpu.config import LLMConfig
    from legalrag_tpu.llm.client import LLMClient

    captured = {}

    def fake(name, **kw):
        captured.update(kw, name=name)
        return object()

    monkeypatch.setattr(SpecLookupDecoderLM, "from_pretrained",
                        staticmethod(fake))
    c = LLMClient(LLMConfig(provider="local-jax", spec_k=4,
                            spec_adaptive=1.5))
    c._load_jax_lm()
    assert captured["spec_k"] == 4
    assert captured["spec_adaptive"] == 1.5


def test_full_window_acceptance_near_k():
    """Round-5 regression for the round-4 on-chip finding (VERDICT r4 #2:
    oracle acceptance 1.27/round vs ~k expected).

    Root cause: the in-sequence lookup took the MOST RECENT bigram match,
    which in self-repetitive text sits at pos-1 — its draft window runs
    past the filled region into unwritten buffer, so drafts were
    [good, 0, 0, ...] and acceptance capped near 1. The fix prefers the
    most recent match whose whole k-token continuation is already
    written (j <= pos - k).

    A weak-init tiny model collapses to a constant/cyclic greedy stream
    (the most speculation-friendly case); with the fix, accepted
    tokens/round must be >= 0.8*k. Also covers the --spec-oracle framing:
    an n-gram table built from the plain run's own output keeps the same
    bound when the in-sequence window is preferred correctly."""
    from legalrag_tpu.models.ngram_draft import NgramDraftTable

    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=256,
                        tie_word_embeddings=True)
    rng = np.random.default_rng(3)

    def mat(i, o, scale=0.04):  # weak init -> repetitive greedy stream
        return jnp.asarray(rng.standard_normal((i, o)) * scale, jnp.float32)

    h, ff, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    hkv = cfg.num_key_value_heads
    embed = mat(cfg.vocab_size, h, 0.1)
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
    prompt = rng.integers(1, cfg.vocab_size - 1, 24).tolist()
    k, new = 8, 64
    plain = JaxDecoderLM(params, cfg, max_len=256, decode_chunk=8)
    plain_out = list(plain.generate_stream(prompt, max_new_tokens=new))
    # the premise: the greedy stream really is self-repetitive
    assert len(set(plain_out[16:])) <= 4, plain_out

    oracle = NgramDraftTable.from_streams([prompt + plain_out], k=k)
    # without the table the first rounds (repetition not yet established
    # in-sequence) draft blind, so the bar is lower; WITH the oracle
    # table every round has a correct draft source -> near-full k
    for table, bar in ((None, 0.55 * k), (oracle, 0.8 * k)):
        spec = SpecLookupDecoderLM(params, cfg, max_len=256, spec_k=k,
                                   spec_steps=4, ngram_draft=table)
        out = list(spec.generate_stream(prompt, max_new_tokens=new))
        assert out == plain_out
        st = spec.last_stats
        rounds = max(st["spec_rounds"], 1)
        accepted = (st["tokens"] - 1) / rounds
        assert accepted >= bar, (table is not None, st, accepted)
