"""Dense top-k op: XLA path vs Pallas kernel (interpret mode) vs NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.ops.topk import dense_topk_pallas, dense_topk_xla


def _oracle(emb, q, valid_n, k):
    scores = q.astype(np.float32) @ emb.astype(np.float32).T
    scores[:, valid_n:] = -1e30
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    n, d, b = 1024, 256, 8
    emb = rng.standard_normal((n, d), dtype=np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((b, d), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return emb, q


def test_xla_matches_oracle(data):
    emb, q = data
    valid_n = 1000
    s, i = dense_topk_xla(jnp.asarray(emb), jnp.asarray(q),
                          jnp.int32(valid_n), 10)
    os, oi = _oracle(emb, q, valid_n, 10)
    np.testing.assert_allclose(np.asarray(s), os, rtol=1e-4, atol=1e-5)
    # indices may differ on exact ties; scores matching is the contract
    assert (np.asarray(i) < valid_n).all()


def test_pallas_matches_xla(data):
    emb, q = data
    valid_n = 900
    s_x, i_x = dense_topk_xla(jnp.asarray(emb), jnp.asarray(q),
                              jnp.int32(valid_n), 17)
    s_p, i_p = dense_topk_pallas(jnp.asarray(emb), jnp.asarray(q),
                                 jnp.int32(valid_n), 17, tile_n=256,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x),
                               rtol=1e-4, atol=1e-5)
    assert (np.asarray(i_p) < valid_n).all()
    # where scores are distinct, indices must agree
    s_np = np.asarray(s_x)
    distinct = np.abs(np.diff(s_np, axis=1)) > 1e-5
    agree = np.asarray(i_p)[:, :-1] == np.asarray(i_x)[:, :-1]
    assert (agree | ~distinct).all()


def test_pallas_k_larger_than_valid(data):
    emb, q = data
    # valid_n smaller than k: padding rows must never surface
    s, i = dense_topk_pallas(jnp.asarray(emb), jnp.asarray(q),
                             jnp.int32(5), 8, tile_n=256, interpret=True)
    assert (np.asarray(i)[:, :5] < 5).all()
    assert (np.asarray(s)[:, 5:] <= -1e29).all()
