"""MaxSim ops vs a NumPy oracle; TokenIndex roundtrip."""

import jax.numpy as jnp
import numpy as np

from legalrag_tpu.index.token_index import TokenIndex
from legalrag_tpu.ops.maxsim import maxsim_candidates, maxsim_full


def _oracle(doc_tok, doc_mask, q_tok, q_mask):
    b, n = q_tok.shape[0], doc_tok.shape[0]
    out = np.zeros((b, n), np.float32)
    for bi in range(b):
        for ni in range(n):
            s = 0.0
            for qi in range(q_tok.shape[1]):
                if not q_mask[bi, qi]:
                    continue
                sims = doc_tok[ni] @ q_tok[bi, qi]
                sims = sims[doc_mask[ni]]
                if sims.size:
                    s += sims.max()
            out[bi, ni] = s
    return out


def _rand(rng, *shape):
    x = rng.standard_normal(shape).astype(np.float32)
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-9)


def test_full_matches_oracle():
    rng = np.random.default_rng(1)
    n, l, d, b, lq = 8, 6, 16, 3, 4
    doc_tok = _rand(rng, n, l, d)
    doc_mask = rng.random((n, l)) > 0.3
    doc_mask[0] = False  # fully-empty doc must score 0
    q_tok = _rand(rng, b, lq, d)
    q_mask = rng.random((b, lq)) > 0.2
    got = np.asarray(maxsim_full(jnp.asarray(doc_tok), jnp.asarray(doc_mask),
                                 jnp.asarray(q_tok), jnp.asarray(q_mask),
                                 tile_n=4))
    want = _oracle(doc_tok, doc_mask, q_tok, q_mask)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_candidates_matches_full():
    rng = np.random.default_rng(2)
    n, l, d, b, lq, c = 16, 5, 8, 2, 3, 6
    doc_tok = _rand(rng, n, l, d)
    doc_mask = np.ones((n, l), bool)
    q_tok = _rand(rng, b, lq, d)
    q_mask = np.ones((b, lq), bool)
    cand = rng.integers(0, n, (b, c)).astype(np.int32)
    full = np.asarray(maxsim_full(jnp.asarray(doc_tok), jnp.asarray(doc_mask),
                                  jnp.asarray(q_tok), jnp.asarray(q_mask),
                                  tile_n=8))
    got = np.asarray(maxsim_candidates(jnp.asarray(doc_tok), jnp.asarray(doc_mask),
                                       jnp.asarray(q_tok), jnp.asarray(q_mask),
                                       jnp.asarray(cand)))
    want = np.take_along_axis(full, cand, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_token_index_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    idx = TokenIndex(token_dim=16, doc_maxlen=4, dtype="float32",
                     capacity_round=8)
    emb = _rand(rng, 5, 4, 16)
    mask = np.ones((5, 4), bool)
    idx.add(emb, mask)
    q = _rand(rng, 2, 3, 16)
    qm = np.ones((2, 3), bool)
    s1, i1 = idx.topk(q, qm, 3, tile_n=8)
    idx.save(tmp_path / "tokens.npz")
    loaded = TokenIndex.load(tmp_path / "tokens.npz", dtype="float32")
    s2, i2 = loaded.topk(q, qm, 3, tile_n=8)
    np.testing.assert_allclose(s1, s2, rtol=1e-2)
    assert (i1 == i2).all()
    # incremental add past capacity
    idx.add(_rand(rng, 10, 4, 16), np.ones((10, 4), bool))
    assert idx.n == 15 and idx.capacity == 16


def test_int8_token_index_close_to_f32(tmp_path):
    rng = np.random.default_rng(5)
    emb = _rand(rng, 20, 6, 32)
    mask = rng.random((20, 6)) > 0.2
    q = _rand(rng, 3, 4, 32)
    qm = np.ones((3, 4), bool)

    f32 = TokenIndex(token_dim=32, doc_maxlen=6, dtype="float32",
                     capacity_round=32)
    f32.add(emb, mask)
    q8 = TokenIndex(token_dim=32, doc_maxlen=6, dtype="int8",
                    capacity_round=32)
    q8.add(emb, mask)
    s32, i32 = f32.topk(q, qm, 5, tile_n=4)
    s8, i8 = q8.topk(q, qm, 5, tile_n=4)
    np.testing.assert_allclose(s8, s32, atol=0.05)  # quantization noise
    assert (i8[:, 0] == i32[:, 0]).all()  # top-1 stable
    # persistence round trip keeps quantized payload (no double quantization)
    q8.save(tmp_path / "t8.npz")
    loaded = TokenIndex.load(tmp_path / "t8.npz")
    s8b, _ = loaded.topk(q, qm, 5, tile_n=4)
    np.testing.assert_allclose(s8b, s8, atol=1e-6)
