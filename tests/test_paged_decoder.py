"""Paged-KV continuous batching (models/paged_decoder.py): greedy
streams must be token-identical to the single-stream ``JaxDecoderLM``
while the cache lives in a shared block pool, prompt prefixes are
reused by REFERENCE through the radix tree, and eviction/reservation
keep the pool sound under churn — tiny random-init config."""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.models.decoder import DecoderConfig, JaxDecoderLM
from legalrag_tpu.models.paged_decoder import PagedDecoderLM


@pytest.fixture(scope="module")
def tiny():
    cfg = DecoderConfig(vocab_size=97, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=64,
                        tie_word_embeddings=True)
    rng = np.random.default_rng(7)

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


PROMPTS = [[1, 2, 3], [4, 5, 6, 7, 8], [9, 10], [11, 12, 13, 14],
           [15, 16, 17, 18, 19, 20]]


@pytest.fixture(scope="module")
def reference_outputs(tiny):
    cfg, params = tiny
    lm = JaxDecoderLM(params, cfg, max_len=48, decode_chunk=1)
    refs = {tuple(p): list(lm.generate_stream(p, max_new_tokens=10))
            for p in PROMPTS}
    assert any(len(set(r)) >= 4 for r in refs.values()), \
        "fixture collapsed; token-parity tests would be vacuous"
    return refs


def _collect_concurrently(engine, prompts, **kw):
    results = {}

    def run(p):
        results[tuple(p)] = list(engine.generate_stream(p, **kw))

    threads = [threading.Thread(target=run, args=(p,)) for p in prompts]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    return results


def test_concurrent_greedy_matches_single_stream(tiny, reference_outputs):
    cfg, params = tiny
    engine = PagedDecoderLM(params, cfg, max_len=48, n_slots=3,
                            decode_chunk=4, block_size=8)
    try:
        got = _collect_concurrently(engine, PROMPTS[:3], max_new_tokens=10)
        for p in PROMPTS[:3]:
            assert got[tuple(p)] == reference_outputs[tuple(p)], p
    finally:
        engine.close()


def test_slot_reuse_more_requests_than_slots(tiny, reference_outputs):
    cfg, params = tiny
    engine = PagedDecoderLM(params, cfg, max_len=48, n_slots=2,
                            decode_chunk=4, block_size=8)
    try:
        got = _collect_concurrently(engine, PROMPTS, max_new_tokens=10)
        for p in PROMPTS:
            assert got[tuple(p)] == reference_outputs[tuple(p)], p
    finally:
        engine.close()


def test_radix_reuses_shared_prefix_blocks(tiny):
    """Two prompts sharing a 16-token (2-block) prefix: the second
    admission must attach those blocks by reference (zero prefill for
    them) and still match the single-stream engine token-for-token."""
    cfg, params = tiny
    rng = np.random.default_rng(11)
    shared = list(rng.integers(1, 90, 16))
    a = shared + list(rng.integers(1, 90, 5))
    b = shared + list(rng.integers(1, 90, 7))
    ref_lm = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=1)
    want_a = list(ref_lm.generate_stream(a, max_new_tokens=8))
    want_b = list(ref_lm.generate_stream(b, max_new_tokens=8))
    engine = PagedDecoderLM(params, cfg, max_len=64, n_slots=2,
                            decode_chunk=4, block_size=8)
    try:
        got_a = list(engine.generate_stream(a, max_new_tokens=8))
        s1 = engine.paged_stats()
        got_b = list(engine.generate_stream(b, max_new_tokens=8))
        s2 = engine.paged_stats()
        assert got_a == want_a
        assert got_b == want_b
        # stream B reused A's two published prefix blocks
        assert s2["reused_blocks"] - s1["reused_blocks"] == 2
        # finished streams leave their full prompt blocks cached
        assert s2["cached_blocks"] >= 2
    finally:
        engine.close()


def test_concurrent_identical_prompts_share_blocks(tiny):
    """The same long prompt submitted twice concurrently: one physical
    copy of the shared full blocks serves both streams."""
    cfg, params = tiny
    rng = np.random.default_rng(13)
    p = list(rng.integers(1, 90, 24))
    ref_lm = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=1)
    want = list(ref_lm.generate_stream(p, max_new_tokens=8))
    engine = PagedDecoderLM(params, cfg, max_len=64, n_slots=2,
                            decode_chunk=4, block_size=8)
    try:
        got = _collect_concurrently(engine, [p, list(p)], max_new_tokens=8)
        assert got[tuple(p)] == want
    finally:
        engine.close()


def test_eviction_under_small_pool(tiny):
    """A pool with barely more than one stream's worth of blocks: cached
    blocks from earlier prompts are LRU-evicted to admit later ones, and
    every stream still decodes exactly."""
    cfg, params = tiny
    rng = np.random.default_rng(17)
    prompts = [list(rng.integers(1, 90, 20)) for _ in range(4)]
    ref_lm = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=1)
    want = {tuple(p): list(ref_lm.generate_stream(p, max_new_tokens=6))
            for p in prompts}
    engine = PagedDecoderLM(params, cfg, max_len=64, n_slots=1,
                            decode_chunk=4, block_size=8, pool_blocks=9)
    try:
        for p in prompts:
            assert list(engine.generate_stream(p, max_new_tokens=6)) \
                == want[tuple(p)]
        assert engine.paged_stats()["evicted_blocks"] > 0
    finally:
        engine.close()


def test_admission_waits_for_pool_capacity(tiny):
    """Two concurrent streams against a pool that fits one at a time
    (each needs 6 of 7 blocks): the second waits in pending until the
    first frees blocks — no failure, exact output."""
    cfg, params = tiny
    rng = np.random.default_rng(19)
    prompts = [list(rng.integers(1, 90, 33)) for _ in range(2)]
    ref_lm = JaxDecoderLM(params, cfg, max_len=48, decode_chunk=1)
    want = {tuple(p): list(ref_lm.generate_stream(p, max_new_tokens=10))
            for p in prompts}
    engine = PagedDecoderLM(params, cfg, max_len=48, n_slots=2,
                            decode_chunk=4, block_size=8, pool_blocks=7)
    try:
        got = _collect_concurrently(engine, prompts, max_new_tokens=10)
        for p in prompts:
            assert got[tuple(p)] == want[tuple(p)], p
    finally:
        engine.close()


def test_eos_budget_cancellation(tiny, reference_outputs):
    cfg, params = tiny
    ref = reference_outputs[tuple(PROMPTS[0])]
    eos = ref[4]
    engine = PagedDecoderLM(params, cfg, max_len=48, n_slots=1,
                            decode_chunk=2, block_size=8)
    try:
        got = list(engine.generate_stream(PROMPTS[0], max_new_tokens=10,
                                          eos_id=eos))
        assert got == ref[:ref.index(eos)]
        gen = engine.generate_stream(PROMPTS[0], max_new_tokens=10)
        assert next(gen) == ref[0]
        gen.close()  # client disconnect frees the slot AND its blocks
        got2 = list(engine.generate_stream(PROMPTS[1], max_new_tokens=10))
        assert got2 == reference_outputs[tuple(PROMPTS[1])]
        stats = engine.paged_stats()
        assert stats["reserved_blocks"] == 0
        assert stats["free_blocks"] + stats["cached_blocks"] \
            == stats["n_blocks"]
    finally:
        engine.close()


def test_sampled_streams_deterministic_and_valid(tiny):
    cfg, params = tiny
    engine = PagedDecoderLM(params, cfg, max_len=48, n_slots=2,
                            decode_chunk=4, block_size=8)
    try:
        kw = dict(max_new_tokens=8, temperature=0.8, top_p=0.9, seed=3)
        out1 = list(engine.generate_stream(PROMPTS[2], **kw))
        out2 = list(engine.generate_stream(PROMPTS[2], **kw))
        assert out1 == out2
        assert len(out1) == 8
        assert all(0 <= t < cfg.vocab_size for t in out1)
    finally:
        engine.close()


def test_kv_quant_pool_matches_contiguous_quant_engine(tiny):
    """int8 block pools: the paged engine under kv_quant must equal the
    single-stream engine under the same quantization (quantize-on-write
    / dequantize-on-read is shared via decoder_forward)."""
    cfg, params = tiny
    ref_lm = JaxDecoderLM(params, cfg, max_len=48, decode_chunk=1,
                          kv_quant=True)
    want = list(ref_lm.generate_stream(PROMPTS[1], max_new_tokens=8))
    engine = PagedDecoderLM(params, cfg, max_len=48, n_slots=2,
                            decode_chunk=4, block_size=8, kv_quant=True)
    try:
        got = list(engine.generate_stream(PROMPTS[1], max_new_tokens=8))
        assert got == want
    finally:
        engine.close()


def test_chunked_admission_matches_single_shot(tiny):
    """Prompts longer than prefill_chunk prefill in sequential chunks
    through the block table — token-identical to the single-stream
    engine, incl. a non-multiple tail chunk."""
    cfg, params = tiny
    rng = np.random.default_rng(41)
    prompts = [list(rng.integers(1, 90, n)) for n in (17, 33, 45)]
    ref_lm = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=1)
    want = {tuple(p): list(ref_lm.generate_stream(p, max_new_tokens=8))
            for p in prompts}
    engine = PagedDecoderLM(params, cfg, max_len=64, n_slots=2,
                            decode_chunk=4, block_size=8,
                            prefill_chunk=16)
    try:
        got = _collect_concurrently(engine, prompts, max_new_tokens=8)
        for p in prompts:
            assert got[tuple(p)] == want[tuple(p)], len(p)
    finally:
        engine.close()


def test_validation_and_close(tiny):
    cfg, params = tiny
    with pytest.raises(ValueError):
        PagedDecoderLM(params, cfg, max_len=50, block_size=8)  # 50 % 8
    engine = PagedDecoderLM(params, cfg, max_len=16, n_slots=1,
                            decode_chunk=4, block_size=8)
    try:
        with pytest.raises(ValueError):
            list(engine.generate_stream(list(range(1, 20)),
                                        max_new_tokens=4))
        got = list(engine.generate_stream(list(range(1, 13)),
                                          max_new_tokens=100))
        assert len(got) == 4  # clamped to the 16-token budget
    finally:
        engine.close()
    engine.close()
    with pytest.raises(RuntimeError):
        next(engine.generate_stream([1, 2], max_new_tokens=2))


def test_sentinel_blocks_never_cover_attended_positions(tiny,
                                                        reference_outputs):
    """The mode="clip" gather in decoder_forward makes sentinel (NB)
    table entries read block NB-1 — possibly another live stream's real
    KV rows (ADVICE r3 #2). Correctness relies on the invariant that a
    sentinel entry only ever covers positions >= the slot's filled
    horizon, which the filled/causal mask zeroes. Check it at EVERY
    decode launch: for each active slot, blocks covering positions below
    pos + decode_chunk are real; outputs stay token-identical."""
    cfg, params = tiny
    engine = PagedDecoderLM(params, cfg, max_len=48, n_slots=3,
                            decode_chunk=4, block_size=8)
    violations = []
    orig = engine._top_up_tables

    def checked():
        orig()
        nb, bs = engine.n_blocks, engine.block_size
        for i, st in enumerate(engine._slots):
            if st is None:
                continue
            horizon = min(len(st.prompt_ids) + st.produced
                          + engine.decode_chunk, st.limit, engine.max_len)
            # every block index whose FIRST position is attended this
            # launch (j*bs < horizon) must hold a real block id
            need = (horizon + bs - 1) // bs
            row = engine._tables[i, :need]
            if (row >= nb).any():
                violations.append((i, horizon, row.copy()))

    engine._top_up_tables = checked
    try:
        got = _collect_concurrently(engine, PROMPTS, max_new_tokens=10)
    finally:
        engine.close()
    assert not violations, violations[:3]
    assert got == reference_outputs
