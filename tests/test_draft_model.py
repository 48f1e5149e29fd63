"""Draft-MODEL speculative decoding (models/spec_decode.py, ``draft=``):
k greedy steps of a small decoder generate the draft INSIDE the verify
program (inner lax.scan, zero extra host dispatches); the target model
verifies k+1 positions in one forward. Output must be token-identical
to plain decoding for ANY draft params — draft quality only affects
acceptance. CPU, tiny random configs.

Replaces the one-token-per-forward HF loop of the reference
(``llm/client.py:306-369``); the reference has no speculative path."""

import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.decoder import DecoderConfig, JaxDecoderLM
from legalrag_tpu.models.spec_decode import SpecLookupDecoderLM


def _mk(cfg, seed, scale=0.3):
    rng = np.random.default_rng(seed)

    def mat(i, o, s=scale):
        return jnp.asarray(rng.standard_normal((i, o)) * s, jnp.float32)

    h, ff, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    hkv = cfg.num_key_value_heads
    embed = mat(cfg.vocab_size, h, 0.5)
    return {
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


@pytest.fixture(scope="module")
def models():
    tcfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         intermediate_size=64, max_position_embeddings=128)
    dcfg = DecoderConfig(vocab_size=97, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, num_key_value_heads=1,
                         intermediate_size=32, max_position_embeddings=128)
    return tcfg, _mk(tcfg, 41), dcfg, _mk(dcfg, 99)


PROMPTS = [[5, 6, 7, 5, 6, 7, 5, 6], [12, 41, 3, 3, 3, 3, 9],
           [2, 2], list(range(20, 40))]


def test_greedy_parity_any_draft(models):
    """Exactness for an arbitrary (uncorrelated) draft model: the stream
    equals plain decoding token for token."""
    tcfg, tparams, dcfg, dparams = models
    plain = JaxDecoderLM(tparams, tcfg, max_len=96, decode_chunk=1)
    spec = SpecLookupDecoderLM(tparams, tcfg, max_len=96, spec_k=4,
                               spec_steps=2, draft=(dparams, dcfg))
    assert spec.draft_params is not None
    for p in PROMPTS:
        want = list(plain.generate_stream(p, max_new_tokens=16))
        got = list(spec.generate_stream(p, max_new_tokens=16))
        assert got == want, p


def test_self_draft_acceptance_beats_uncorrelated(models):
    """Acceptance tracks draft quality: drafting with the TARGET's own
    weights accepts far more per round than an uncorrelated random
    draft. (Not full k+1 even self-drafted: the 1-token draft forward
    and the (k+1)-token verify fuse differently, and a random-init
    model's tiny logit margins let trace-shape numerics flip argmax —
    real checkpoints have far larger margins.) Output stays exact in
    both cases (test_greedy_parity_any_draft)."""
    tcfg, tparams, dcfg, dparams = models
    plain = JaxDecoderLM(tparams, tcfg, max_len=96, decode_chunk=1)
    p = PROMPTS[0]
    want = list(plain.generate_stream(p, max_new_tokens=16))
    rates = {}
    for name, draft in (("self", (tparams, tcfg)),
                        ("random", (dparams, dcfg))):
        spec = SpecLookupDecoderLM(tparams, tcfg, max_len=96, spec_k=4,
                                   spec_steps=2, draft=draft)
        assert list(spec.generate_stream(p, max_new_tokens=16)) == want
        st = spec.last_stats
        rates[name] = st["tokens"] / max(st["spec_rounds"], 1)
    assert rates["self"] >= 2.0, rates
    assert rates["self"] > rates["random"] * 1.5, rates


def test_penalty_and_sampling_compose(models):
    tcfg, tparams, dcfg, dparams = models
    plain = JaxDecoderLM(tparams, tcfg, max_len=96, decode_chunk=1)
    spec = SpecLookupDecoderLM(tparams, tcfg, max_len=96, spec_k=4,
                               spec_steps=2, draft=(dparams, dcfg))
    p = PROMPTS[1]
    want = list(plain.generate_stream(p, max_new_tokens=14,
                                      repetition_penalty=1.3))
    got = list(spec.generate_stream(p, max_new_tokens=14,
                                    repetition_penalty=1.3))
    assert got == want
    # sampled decoding runs to budget without error and stays in-vocab
    out = list(spec.generate_stream(p, max_new_tokens=12, temperature=0.9,
                                    seed=3))
    assert len(out) <= 12 and all(0 <= t < tcfg.vocab_size for t in out)


def test_kv_quant_composes(models):
    tcfg, tparams, dcfg, dparams = models
    plain = JaxDecoderLM(tparams, tcfg, max_len=96, decode_chunk=1,
                         kv_quant=True)
    spec = SpecLookupDecoderLM(tparams, tcfg, max_len=96, spec_k=4,
                               spec_steps=2, kv_quant=True,
                               draft=(dparams, dcfg))
    for p in PROMPTS[:2]:
        want = list(plain.generate_stream(p, max_new_tokens=12))
        assert list(spec.generate_stream(p, max_new_tokens=12)) == want


def test_vocab_mismatch_raises(models):
    tcfg, tparams, _, _ = models
    bad = DecoderConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                        num_attention_heads=2, num_key_value_heads=1,
                        intermediate_size=32, max_position_embeddings=128)
    with pytest.raises(ValueError):
        SpecLookupDecoderLM(tparams, tcfg, max_len=96, spec_k=4,
                            draft=(_mk(bad, 1), bad))


def test_client_plumbs_draft_model(monkeypatch):
    import legalrag_tpu.models.decoder as dec
    from legalrag_tpu.config import LLMConfig
    from legalrag_tpu.llm.client import LLMClient
    from legalrag_tpu.models.spec_decode import SpecLookupDecoderLM as S

    captured = {}

    def fake(name, **kw):
        captured.update(kw)
        return object()

    monkeypatch.setattr(S, "from_pretrained", staticmethod(fake))
    c = LLMClient(LLMConfig(provider="local-jax", spec_k=4,
                            draft_model="tiny-draft"))
    c._load_jax_lm()
    assert captured["draft_model"] == "tiny-draft"
    assert captured["spec_k"] == 4


# --------------------------------------------------------------- batched

def test_batched_draft_model_parity(models):
    """The BATCHED engine with a draft model: every concurrent stream is
    token-identical to plain decoding, for an uncorrelated draft."""
    import threading

    from legalrag_tpu.models.batched_decoder import BatchedDecoderLM

    tcfg, tparams, dcfg, dparams = models
    plain = JaxDecoderLM(tparams, tcfg, max_len=96, decode_chunk=1)
    want = {tuple(p): list(plain.generate_stream(p, max_new_tokens=14))
            for p in PROMPTS}
    eng = BatchedDecoderLM(tparams, tcfg, max_len=96, n_slots=2, spec_k=4,
                           spec_steps=2, draft=(dparams, dcfg))
    try:
        got, errs = {}, []

        def run(p):
            try:
                got[tuple(p)] = list(
                    eng.generate_stream(p, max_new_tokens=14))
            except Exception as e:
                errs.append(e)

        ts = [threading.Thread(target=run, args=(p,)) for p in PROMPTS]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=600)
        assert not errs, errs
        for p in PROMPTS:
            assert got[tuple(p)] == want[tuple(p)], p
    finally:
        eng.close()


def test_batched_draft_with_shared_prefix(models):
    """Draft admission prefills the FULL prompt at absolute positions even
    when the target slot only stores suffix rows past the pinned shared
    segment — streams stay exact."""
    from legalrag_tpu.models.batched_decoder import BatchedDecoderLM

    tcfg, tparams, dcfg, dparams = models
    shared = list(range(1, 9))
    prompts = [shared + [70, 71, 72], shared + [7, 9] * 4,
               [60, 61, 62, 63]]                     # last: non-matching
    plain = JaxDecoderLM(tparams, tcfg, max_len=96, decode_chunk=1)
    want = {tuple(p): list(plain.generate_stream(p, max_new_tokens=12))
            for p in prompts}
    eng = BatchedDecoderLM(tparams, tcfg, max_len=96, n_slots=2, spec_k=4,
                           spec_steps=2, shared_prefix=shared,
                           draft=(dparams, dcfg))
    try:
        for p in prompts:
            got = list(eng.generate_stream(p, max_new_tokens=12))
            assert got == want[tuple(p)], p
    finally:
        eng.close()


def test_batched_draft_requires_spec(models):
    from legalrag_tpu.models.batched_decoder import BatchedDecoderLM

    tcfg, tparams, dcfg, dparams = models
    with pytest.raises(ValueError):
        BatchedDecoderLM(tparams, tcfg, max_len=96, n_slots=2,
                         draft=(dparams, dcfg))


def test_client_plumbs_batched_draft(monkeypatch):
    import legalrag_tpu.models.batched_decoder as bd
    from legalrag_tpu.config import LLMConfig
    from legalrag_tpu.llm.client import LLMClient

    captured = {}

    def fake(name, **kw):
        captured.update(kw)
        return object()

    monkeypatch.setattr(bd.BatchedDecoderLM, "from_pretrained",
                        staticmethod(fake))
    c = LLMClient(LLMConfig(provider="local-jax", batch_slots=2, spec_k=4,
                            draft_model="tiny-draft"))
    c._load_jax_lm()
    assert captured["draft_model"] == "tiny-draft"
    assert captured["spec_k"] == 4 and captured["n_slots"] == 2


# ---------------------------------------------------- hybrid draft source

def test_hybrid_lookup_preferred_parity(models):
    """Lookup + draft model on one engine: quoting prompts draft from the
    in-sequence lookup, non-quoting rounds from the model — output stays
    exact either way, in both engines."""
    from legalrag_tpu.models.batched_decoder import BatchedDecoderLM

    tcfg, tparams, dcfg, dparams = models
    plain = JaxDecoderLM(tparams, tcfg, max_len=96, decode_chunk=1)
    # the random-init greedy chain self-repeats, so lookup rounds occur;
    # fresh short prompts force model-draft rounds too
    prompts = PROMPTS
    want = {tuple(p): list(plain.generate_stream(p, max_new_tokens=16))
            for p in prompts}
    spec = SpecLookupDecoderLM(tparams, tcfg, max_len=96, spec_k=4,
                               spec_steps=2, draft=(dparams, dcfg))
    eng = BatchedDecoderLM(tparams, tcfg, max_len=96, n_slots=2, spec_k=4,
                           spec_steps=2, draft=(dparams, dcfg))
    try:
        for p in prompts:
            assert list(spec.generate_stream(p, max_new_tokens=16)) \
                == want[tuple(p)], p
            assert list(eng.generate_stream(p, max_new_tokens=16)) \
                == want[tuple(p)], p
    finally:
        eng.close()


def test_hybrid_with_ngram_table_parity(models, tmp_path):
    """All three draft sources on one engine (lookup, corpus table,
    model): greedy parity holds with an adversarial random table."""
    import numpy as _np

    tcfg, tparams, dcfg, dparams = models
    rng = _np.random.default_rng(7)
    size = 64
    tbl = dict(keys_a=rng.integers(0, 97, size).astype(_np.int32),
               keys_b=rng.integers(0, 97, size).astype(_np.int32),
               vals=rng.integers(0, 97, (size, 8)).astype(_np.int32))
    path = tmp_path / "tbl.npz"
    _np.savez(path, **tbl)
    plain = JaxDecoderLM(tparams, tcfg, max_len=96, decode_chunk=1)
    spec = SpecLookupDecoderLM(tparams, tcfg, max_len=96, spec_k=4,
                               spec_steps=2, draft=(dparams, dcfg),
                               ngram_draft=str(path))
    for p in PROMPTS[:3]:
        want = list(plain.generate_stream(p, max_new_tokens=14))
        assert list(spec.generate_stream(p, max_new_tokens=14)) == want, p
