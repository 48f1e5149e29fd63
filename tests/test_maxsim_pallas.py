"""Pallas MaxSim kernel (interpret mode) vs the XLA reference path."""

import jax.numpy as jnp
import numpy as np

from legalrag_tpu.ops.maxsim import maxsim_full
from legalrag_tpu.ops.maxsim_pallas import maxsim_scores_pallas


def _rand(rng, *shape):
    x = rng.standard_normal(shape).astype(np.float32)
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-9)


def test_matches_xla_path():
    rng = np.random.default_rng(0)
    n, l, dt, b, lq = 32, 12, 16, 4, 6
    doc_tok = _rand(rng, n, l, dt)
    doc_mask = rng.random((n, l)) > 0.3
    doc_mask[3] = False  # empty doc
    q_tok = _rand(rng, b, lq, dt)
    q_mask = rng.random((b, lq)) > 0.2
    want = np.asarray(maxsim_full(jnp.asarray(doc_tok), jnp.asarray(doc_mask),
                                  jnp.asarray(q_tok), jnp.asarray(q_mask),
                                  tile_n=8))
    got = np.asarray(maxsim_scores_pallas(
        jnp.asarray(doc_tok), jnp.asarray(doc_mask), jnp.asarray(q_tok),
        jnp.asarray(q_mask), tile_t=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_negative_similarities_preserved():
    # MaxSim keeps negative best-matches (no relu) — check explicitly
    doc_tok = -np.ones((8, 2, 4), np.float32) / 2.0
    doc_mask = np.ones((8, 2), bool)
    q_tok = np.ones((1, 1, 4), np.float32) / 2.0
    q_mask = np.ones((1, 1), bool)
    got = np.asarray(maxsim_scores_pallas(
        jnp.asarray(doc_tok), jnp.asarray(doc_mask), jnp.asarray(q_tok),
        jnp.asarray(q_mask), tile_t=8, interpret=True))
    assert (got < 0).all()


def test_formulation2_matches_xla():
    from legalrag_tpu.ops.maxsim_pallas2 import maxsim_scores_pallas2

    rng = np.random.default_rng(1)
    n, l, dt, b, lq = 24, 8, 16, 3, 5
    doc_tok = _rand(rng, n, l, dt)
    doc_mask = rng.random((n, l)) > 0.3
    doc_mask[0] = False
    q_tok = _rand(rng, b, lq, dt)
    q_mask = rng.random((b, lq)) > 0.2
    want = np.asarray(maxsim_full(jnp.asarray(doc_tok), jnp.asarray(doc_mask),
                                  jnp.asarray(q_tok), jnp.asarray(q_mask),
                                  tile_n=8))
    got = np.asarray(maxsim_scores_pallas2(
        jnp.asarray(doc_tok), jnp.asarray(doc_mask), jnp.asarray(q_tok),
        jnp.asarray(q_mask), tile_t=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
