"""Dense top-k op: XLA path vs Pallas kernel (interpret mode) vs NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.ops.topk import (
    TWO_PASS_MIN_N,
    default_backend,
    dense_topk_2pass,
    dense_topk_pallas,
    dense_topk_xla,
    topk_2pass,
    topk_large,
)


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


# ---------------------------------------------------------------------------
# two-pass block-max selection (round-3 large-N path)


@pytest.mark.parametrize("n,k,block", [
    (4096, 64, 512),     # k < g: the interesting regime
    (4096, 10, 512),
    (4100, 16, 512),     # N not a multiple of block (rounding pad)
    (1024, 5, 128),
    (700, 64, 128),      # k > g·? — kb clamps to g
    (512, 512, 128),     # k == n: falls through to plain top_k
])
def test_topk_2pass_matches_lax(n, k, block):
    rng = np.random.default_rng(3)
    scores = rng.standard_normal((6, n)).astype(np.float32)
    s2, i2 = topk_2pass(jnp.asarray(scores), k, block=block)
    sl, il = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(sl),
                               rtol=0, atol=0)  # identical f32 values
    # continuous random scores: ties are measure-zero → indices identical
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(il))


def test_topk_2pass_adversarial_block_layout():
    # all top-k values packed into ONE block, plus a decoy block whose max
    # is just below — exercises the block-selection bound
    n, block, k = 2048, 256, 8
    scores = np.full((2, n), -5.0, np.float32)
    scores[0, 300:308] = np.arange(8, 0, -1, dtype=np.float32) + 100.0
    scores[0, 1500] = 100.5     # decoy: single high value in another block
    scores[1, :k] = 50.0        # exact ties across one block
    s2, i2 = topk_2pass(jnp.asarray(scores), k, block=block)
    sl, _ = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(sl))
    assert (np.asarray(i2) < n).all() and (np.asarray(i2) >= 0).all()


def test_topk_2pass_neg_inf_padding_rows_clamped():
    # every column masked: ids must stay in range, scores at NEG_INF
    scores = np.full((3, 1000), -1e30, np.float32)
    s2, i2 = topk_2pass(jnp.asarray(scores), 16, block=128)
    assert (np.asarray(i2) >= 0).all() and (np.asarray(i2) < 1000).all()
    assert (np.asarray(s2) <= -1e29).all()


def test_dense_topk_2pass_matches_xla(data):
    emb, q = data
    valid_n = 1000
    s1, i1 = dense_topk_xla(jnp.asarray(emb), jnp.asarray(q),
                            jnp.int32(valid_n), 10)
    s2, i2 = dense_topk_2pass(jnp.asarray(emb), jnp.asarray(q),
                              jnp.int32(valid_n), 10, block=128)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                               rtol=1e-6, atol=1e-6)
    assert (np.asarray(i2) < valid_n).all()


def test_backend_routing_by_size():
    assert default_backend(65_536) == "xla"
    assert default_backend(TWO_PASS_MIN_N) == "xla2"
    assert default_backend(1_048_576) == "xla2"


def test_topk_large_small_n_is_plain_topk():
    scores = np.random.default_rng(1).standard_normal((2, 256)).astype(
        np.float32)
    s, i = topk_large(jnp.asarray(scores), 8)
    sl, il = jax.lax.top_k(jnp.asarray(scores), 8)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(il))
    np.testing.assert_allclose(np.asarray(s), np.asarray(sl))


def test_topk_2pass_k_exceeds_n():
    """k > n must sort-all and pad (lax.top_k alone would raise)."""
    import jax.numpy as jnp

    from legalrag_tpu.ops.topk import topk_2pass

    scores = jnp.asarray(np.random.default_rng(0)
                         .standard_normal((2, 10)).astype(np.float32))
    s, i = topk_2pass(scores, 16)
    assert s.shape == (2, 16) and i.shape == (2, 16)
    np.testing.assert_allclose(np.asarray(s[:, :10]),
                               -np.sort(-np.asarray(scores), axis=1),
                               rtol=1e-6)
    assert np.all(np.isneginf(np.asarray(s[:, 10:])) |
                  (np.asarray(s[:, 10:]) < -1e29))


# ------------------------------------------------------- unit-int8 store

def test_dense_scores_int8_close_and_rank_stable(data):
    """unit-int8 dense scoring (implicit 1/127 scale): scores within
    ~1e-2 of f32 on unit vectors and the top-k ids agree wherever the
    f32 score margin exceeds the quantization error."""
    from legalrag_tpu.ops.topk import dense_scores

    emb, q = data
    emb8 = jnp.asarray(np.rint(np.clip(emb, -1, 1) * 127.0), jnp.int8)
    s8 = np.asarray(dense_scores(emb8, jnp.asarray(q)))
    sf = q @ emb.T
    assert np.abs(s8 - sf).max() < 1.5e-2, np.abs(s8 - sf).max()
    k = 10
    ids8 = np.argsort(-s8, axis=1)[:, :k]
    idsf = np.argsort(-sf, axis=1)[:, :k]
    for b in range(q.shape[0]):
        margin = sf[b, idsf[b, k - 1]] - np.sort(sf[b])[::-1][k]
        if margin > 3e-2:  # clear separation → identical sets
            assert set(ids8[b]) == set(idsf[b])


def test_dense_topk_int8_routes_and_matches(data):
    from legalrag_tpu.ops.topk import dense_topk

    emb, q = data
    emb8 = jnp.asarray(np.rint(np.clip(emb, -1, 1) * 127.0), jnp.int8)
    for backend in ("xla", "xla2", "pallas", "auto"):
        s, i = dense_topk(emb8, jnp.asarray(q), emb.shape[0], 5,
                          backend=backend)
        assert s.shape == (q.shape[0], 5) and s.dtype == jnp.float32
        sf = q @ emb.T
        want = np.take_along_axis(sf, np.asarray(i), axis=1)
        # returned scores equal the quantized products of the returned ids
        np.testing.assert_allclose(np.asarray(s), want, atol=1.5e-2)


def test_dense_index_int8_end_to_end(tmp_path):
    from legalrag_tpu.index.dense_index import DenseIndex

    rng = np.random.default_rng(5)
    emb = rng.standard_normal((256, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    a = DenseIndex(64, dtype="bfloat16")
    b = DenseIndex(64, dtype="int8")
    a.add(emb)
    b.add(emb)
    assert b.emb.dtype == jnp.int8
    q = emb[:4] + rng.standard_normal((4, 64)).astype(np.float32) * 0.05
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    sa, ia = a.topk(q, 5)
    sb, ib = b.topk(q, 5)
    assert (ia[:, 0] == ib[:, 0]).all()         # self-match survives
    np.testing.assert_allclose(sa, sb, atol=2e-2)
    # graph-channel scorer parity
    rows = np.asarray([0, 7, 33])
    np.testing.assert_allclose(b.score_rows(q[0], rows),
                               a.score_rows(q[0], rows), atol=2e-2)
    # save → load roundtrip re-quantizes from the dtype-agnostic artifact
    b.save(tmp_path / "i8.npz")
    c = DenseIndex.load(tmp_path / "i8.npz", dtype="int8")
    assert c.emb.dtype == jnp.int8 and c.n == 256
    sc, ic = c.topk(q, 5)
    assert (ic[:, 0] == ib[:, 0]).all()


@pytest.mark.parametrize("n,k,valid,block", [
    (4096, 16, 4096, 128),      # full validity
    (4096, 16, 3000, 128),      # valid_n straddles a block
    (4096, 16, 3968, 128),      # valid_n exactly block-aligned
    (4100, 16, 4100, 128),      # n not a block multiple
    (4096, 64, 40, 128),        # fewer valid docs than k
    (1024, 8, 1000, 512),       # small-n fallback path (n < 2*block)
    (65536, 64, 50001, 512),    # wide row, recursion engaged
])
def test_topk_2pass_masked_matches_masked_oracle(n, k, valid, block):
    from legalrag_tpu.ops.topk import NEG_INF, topk_2pass_masked

    rng = np.random.default_rng(n + k + valid)
    scores = rng.standard_normal((4, n)).astype(np.float32)
    masked = scores.copy()
    masked[:, valid:] = NEG_INF
    want_s, _ = jax.lax.top_k(jnp.asarray(masked), k)
    got_s, got_i = topk_2pass_masked(jnp.asarray(scores),
                                     jnp.int32(valid), k, block=block)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=0, atol=0)
    gi, gs = np.asarray(got_i), np.asarray(got_s)
    real = gs > NEG_INF / 2
    assert (gi[real] < valid).all()          # never an invalid row id
    assert (gi < n).all()                    # clamped into range
    # returned scores really are the scores at the returned ids
    for r in range(4):
        np.testing.assert_array_equal(gs[r][real[r]],
                                      scores[r][gi[r][real[r]]])


def test_dense_topk_2pass_bf16_map_exact_scores():
    """map_bf16 selection: returned scores are EXACT f32 inner products
    and the selected set matches f32 selection wherever scores are
    separated by more than a bf16 ulp."""
    from legalrag_tpu.ops.topk import dense_topk_2pass

    rng = np.random.default_rng(7)
    n, d, k, b = 4096, 64, 16, 4
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    want_s, want_i = dense_topk_2pass(jnp.asarray(emb), jnp.asarray(q),
                                      jnp.int32(n), k, block=128)
    got_s, got_i = dense_topk_2pass(jnp.asarray(emb), jnp.asarray(q),
                                    jnp.int32(n), k, block=128,
                                    map_bf16=True)
    ws, wi = np.asarray(want_s), np.asarray(want_i)
    gs, gi = np.asarray(got_s), np.asarray(got_i)
    for r in range(b):
        common = set(wi[r].tolist()) & set(gi[r].tolist())
        assert len(common) >= k - 2, (r, len(common))  # near-tie swaps only
        # exact rescoring: every returned score equals the f32 product
        exact = emb[gi[r]] @ q[r]
        np.testing.assert_allclose(gs[r], exact, rtol=0, atol=1e-6)
        # descending order after the re-sort
        assert (np.diff(gs[r]) <= 1e-7).all()
