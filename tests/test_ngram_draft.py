"""Corpus-level n-gram draft tables (models/ngram_draft.py): builder
semantics, persistence, unconditional greedy token-parity when wired into
the speculative engines, and a measured acceptance win when the table is
built from text the model actually produces. CPU, tiny random config.

The reference has no speculative decoding (HF ``model.generate``
token-by-token, reference ``llm/client.py:306-369``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.batched_decoder import BatchedDecoderLM
from legalrag_tpu.models.decoder import DecoderConfig, JaxDecoderLM
from legalrag_tpu.models.ngram_draft import NgramDraftTable
from legalrag_tpu.models.spec_decode import SpecLookupDecoderLM


# ------------------------------------------------------------ table build

def test_chained_continuations():
    t = NgramDraftTable.from_streams([[1, 2, 3, 4, 5, 6]], k=3,
                                     log2_size=8)
    assert t.lookup(1, 2) == [3, 4, 5]
    assert t.lookup(4, 5) == [6, 0, 0]     # corpus runs dry -> 0-padded
    assert t.lookup(9, 9) is None          # never seen

def test_most_frequent_continuation_wins():
    streams = [[7, 8, 1], [7, 8, 2], [7, 8, 2]]
    t = NgramDraftTable.from_streams(streams, k=1, log2_size=8)
    assert t.lookup(7, 8) == [2]

def test_collision_keeps_more_frequent_bigram():
    # size 4: bigrams (0,0) and (0,4) both hash to slot 0
    # ((a*2654435761 + b) & 3); the one seen more often must survive
    streams = [[0, 0, 5, 0, 0, 5], [0, 4, 7]]
    t = NgramDraftTable.from_streams(streams, k=1, log2_size=2)
    assert t.lookup(0, 0) == [5]
    assert t.lookup(0, 4) is None

def test_save_load_roundtrip(tmp_path):
    t = NgramDraftTable.from_streams([[1, 2, 3, 4]], k=2, log2_size=6)
    p = tmp_path / "draft.npz"
    t.save(p)
    t2 = NgramDraftTable.load(p)
    assert t2.lookup(1, 2) == t.lookup(1, 2) == [3, 4]
    assert t2.stats() == t.stats()

def test_size_must_be_power_of_two():
    with pytest.raises(ValueError):
        NgramDraftTable(np.full(6, -1, np.int32), np.full(6, -1, np.int32),
                        np.zeros((6, 4), np.int32))

def test_spec_k_over_table_k_raises():
    t = NgramDraftTable.from_streams([[1, 2, 3, 4]], k=2, log2_size=6)
    with pytest.raises(ValueError):
        t.device_arrays(4)


# ------------------------------------------------------- engine behavior

@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=128,
                        tie_word_embeddings=True)
    rng = np.random.default_rng(11)

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


PROMPTS = [
    [5, 6, 7, 5, 6, 7, 5, 6],
    [12, 41, 3, 3, 3, 3, 9],
    [22, 81, 14, 60, 33],
    [2, 2],
]


def _random_table(vocab=97, k=4, seed=3):
    rng = np.random.default_rng(seed)
    streams = [rng.integers(0, vocab, 64).tolist() for _ in range(8)]
    return NgramDraftTable.from_streams(streams, k=k, log2_size=10)


def test_spec_greedy_identical_with_arbitrary_table(tiny):
    """Correctness is unconditional in draft quality: with a table built
    from streams unrelated to the model, greedy output is still
    token-identical to plain decoding."""
    cfg, params = tiny
    ref = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    spec = SpecLookupDecoderLM(params, cfg, max_len=96, spec_k=4,
                               spec_steps=2, ngram_draft=_random_table())
    for p in PROMPTS:
        want = list(ref.generate_stream(p, max_new_tokens=17))
        got = list(spec.generate_stream(p, max_new_tokens=17))
        assert got == want, p


def test_batched_greedy_identical_with_arbitrary_table(tiny):
    cfg, params = tiny
    ref = JaxDecoderLM(params, cfg, max_len=96, decode_chunk=1)
    eng = BatchedDecoderLM(params, cfg, max_len=96, n_slots=2, spec_k=4,
                           spec_steps=2, ngram_draft=_random_table())
    try:
        for p in PROMPTS[:3]:
            want = list(ref.generate_stream(p, max_new_tokens=15))
            got = list(eng.generate_stream(p, max_new_tokens=15))
            assert got == want, p
    finally:
        eng.close()


def test_corpus_table_raises_acceptance(tiny):
    """A table built from the model's own output drafts successfully on a
    prompt with no internal structure: same tokens, fewer launches than
    the table-less engine (each rejected round emits one token)."""
    cfg, params = tiny
    prompt = [22, 81, 14, 60, 33]          # no bigram repeats
    base = SpecLookupDecoderLM(params, cfg, max_len=96, spec_k=4,
                               spec_steps=2)
    want = list(base.generate_stream(prompt, max_new_tokens=24))
    launches_base = base.last_stats["launches"]
    # the "corpus": what the model says after this prompt
    corpus_stream = prompt + want
    table = NgramDraftTable.from_streams([corpus_stream], k=4,
                                         log2_size=10)
    spec = SpecLookupDecoderLM(params, cfg, max_len=96, spec_k=4,
                               spec_steps=2, ngram_draft=table)
    got = list(spec.generate_stream(prompt, max_new_tokens=24))
    assert got == want                      # output unchanged
    assert spec.last_stats["launches"] < launches_base, (
        spec.last_stats, launches_base)


def test_client_knob_plumbs_path(tmp_path):
    """llm.ngram_draft_path reaches the engine constructor kwargs."""
    from legalrag_tpu.config import LLMConfig

    cfg = LLMConfig(provider="local-jax", spec_k=4,
                    ngram_draft_path=str(tmp_path / "t.npz"))
    assert cfg.ngram_draft_path.endswith("t.npz")
    _random_table().save(cfg.ngram_draft_path)
    from legalrag_tpu.models.ngram_draft import resolve_ngram_draft

    t = resolve_ngram_draft(cfg.ngram_draft_path)
    assert t is not None and t.k == 4
