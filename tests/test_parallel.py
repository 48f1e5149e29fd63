"""Multi-chip sharding on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from legalrag_tpu.parallel import DATA_AXIS, MODEL_AXIS, local_devices, make_mesh
from legalrag_tpu.parallel.sharded_search import (
    make_sharded_dense_topk,
    make_sharded_hybrid_step,
)
from legalrag_tpu.parallel.training import (
    init_projection,
    make_contrastive_train_step,
)


@pytest.fixture(scope="module")
def mesh():
    devs = local_devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual cpu devices")
    return make_mesh(devs[:8], data=2, model=4)


def test_mesh_shape(mesh):
    assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)
    assert mesh.devices.shape == (2, 4)


def test_sharded_dense_topk_matches_single(mesh):
    rng = np.random.default_rng(0)
    n, d, b, k = 512, 64, 8, 10
    emb = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    valid_n = 490

    fn = make_sharded_dense_topk(mesh, k)
    emb_sh = jax.device_put(emb, NamedSharding(mesh, P(MODEL_AXIS, None)))
    q_sh = jax.device_put(q, NamedSharding(mesh, P(DATA_AXIS, None)))
    s, i = fn(emb_sh, q_sh, jnp.int32(valid_n))

    scores = q @ emb.T
    scores[:, valid_n:] = -1e30
    want_i = np.argsort(-scores, axis=1)[:, :k]
    want_s = np.take_along_axis(scores, want_i, axis=1)
    np.testing.assert_allclose(np.asarray(s), want_s, rtol=1e-5, atol=1e-5)
    assert (np.asarray(i) < valid_n).all()
    got_sets = [set(row) for row in np.asarray(i)]
    want_sets = [set(row) for row in want_i]
    assert got_sets == want_sets


def test_sharded_hybrid_step_runs(mesh):
    rng = np.random.default_rng(1)
    n, d, v, b = 256, 32, 64, 4
    emb = rng.standard_normal((n, d)).astype(np.float32)
    impact_rows = np.abs(rng.standard_normal((n, v))).astype(np.float32)
    qvec = rng.standard_normal((b, d)).astype(np.float32)
    qtf = np.zeros((b, v), np.float32)
    qtf[:, :5] = 1.0

    fn = make_sharded_hybrid_step(mesh, k=5, eff_k=16)
    emb_sh = jax.device_put(emb, NamedSharding(mesh, P(MODEL_AXIS, None)))
    imp_sh = jax.device_put(impact_rows, NamedSharding(mesh, P(MODEL_AXIS, None)))
    q_sh = jax.device_put(qvec, NamedSharding(mesh, P(DATA_AXIS, None)))
    t_sh = jax.device_put(qtf, NamedSharding(mesh, P(DATA_AXIS, None)))
    s, i = fn(emb_sh, imp_sh, q_sh, t_sh, jnp.int32(n))
    s, i = np.asarray(s), np.asarray(i)
    assert s.shape == (b, 5) and i.shape == (b, 5)
    assert (np.diff(s, axis=1) <= 1e-6).all()  # sorted desc
    assert (i >= 0).all() and (i < n).all()
    # no duplicate rows within a query's results
    for row in i:
        assert len(set(row.tolist())) == len(row)


def test_contrastive_train_step_learns(mesh):
    rng = np.random.default_rng(2)
    d_in, d_out, b = 32, 16, 16
    q = rng.standard_normal((b, d_in)).astype(np.float32)
    # hard positives: heavy noise so the task is not solved at init
    docs = (0.6 * q + 1.0 * rng.standard_normal((b, d_in))).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)

    step = make_contrastive_train_step(mesh, lr=0.5, temperature=1.0)
    w = init_projection(mesh, d_in, d_out, seed=0)
    q_sh = jax.device_put(q, NamedSharding(mesh, P(DATA_AXIS, None)))
    d_sh = jax.device_put(docs, NamedSharding(mesh, P(DATA_AXIS, None)))
    losses = []
    for _ in range(20):
        w, loss = step(w, q_sh, d_sh)
        losses.append(float(loss))
    assert losses[0] > 0.5  # non-trivial at init
    assert losses[-1] < losses[0] - 0.05  # it optimizes
    assert np.isfinite(losses).all()


class _StubDev:
    def __init__(self, slice_index, process_index, id_):
        self.slice_index = slice_index
        self.process_index = process_index
        self.id = id_


def test_slice_major_order_policy():
    """model axis (ICI) = chips within a slice, data axis (DCN) = slices:
    ordering is slice-major so the reshape puts each slice's chips in one
    mesh row."""
    from legalrag_tpu.parallel.mesh import slice_major_order

    devs = [_StubDev(s, p, i) for i in (1, 0) for p in (1, 0) for s in (1, 0)]
    n_slices, order = slice_major_order(devs)
    assert n_slices == 2
    assert [(d.slice_index, d.process_index, d.id) for d in order] == [
        (0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
        (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)]


def test_make_global_mesh_single_slice_cpu():
    from legalrag_tpu.parallel.mesh import (
        DATA_AXIS, MODEL_AXIS, local_devices, make_global_mesh)

    mesh = make_global_mesh(local_devices("cpu"))
    assert mesh.shape[DATA_AXIS] == 1          # one slice on CPU
    assert mesh.shape[MODEL_AXIS] == len(local_devices("cpu"))


def test_init_multihost_noop_without_env(monkeypatch):
    from legalrag_tpu.parallel import mesh as m

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert m.init_multihost() is False


def test_n_index_shards_all_devices(zh_chunks, tmp_path_factory):
    """engine.n_index_shards=-1 shards over every visible device."""
    from legalrag_tpu.retrieval.by_lang import BundleCache
    from legalrag_tpu.index.bundle import IndexBundle
    from legalrag_tpu.config import AppConfig
    from legalrag_tpu.parallel.mesh import MODEL_AXIS, local_devices

    root = tmp_path_factory.mktemp("allshards")
    cfg = AppConfig()
    cfg.engine.capacity_round = 64
    cfg.engine.late_doc_maxlen = 32
    cfg.engine.n_index_shards = -1
    for name in ("data_dir", "raw_dir", "processed_dir", "index_dir",
                 "graph_dir", "eval_dir", "upload_dir"):
        setattr(cfg.paths, name, root / name)
    cfg.paths.ensure_tree()
    bundle = IndexBundle.build_from_chunks(zh_chunks[:60],
                                           cfg.with_lang("zh"), "zh")
    bundle.save(root / "index_dir" / "zh")
    cache = BundleCache(cfg)
    loaded = cache.get("zh")
    assert loaded.mesh is not None
    assert loaded.mesh.shape[MODEL_AXIS] == len(local_devices("cpu"))


def test_bad_n_index_shards_rejected(tmp_path):
    from legalrag_tpu.config import AppConfig
    from legalrag_tpu.retrieval.by_lang import BundleCache

    cfg = AppConfig()
    cfg.engine.n_index_shards = 0
    with pytest.raises(ValueError, match="n_index_shards"):
        BundleCache(cfg)._serving_mesh()
    cfg.engine.n_index_shards = -2
    with pytest.raises(ValueError, match="n_index_shards"):
        BundleCache(cfg)._serving_mesh()


def test_moe_expert_parallel_matches_unsharded(mesh):
    """Expert parallelism: the MoE block with its stacked expert weights
    sharded over MODEL_AXIS (each device holds E/n_model experts) must
    produce the same output as the fully-replicated block — XLA's SPMD
    partitioner splits the expert einsums and inserts the psum combine."""
    from legalrag_tpu.models.decoder import DecoderConfig, _moe_block

    e, h, f, b, t = 8, 16, 24, 2, 6
    cfg = DecoderConfig(vocab_size=64, hidden_size=h, num_hidden_layers=1,
                        num_attention_heads=2, num_key_value_heads=1,
                        intermediate_size=f, model_type="mixtral",
                        num_local_experts=e, num_experts_per_tok=2)
    rng = np.random.default_rng(7)
    moe_np = {
        "router": rng.standard_normal((h, e)).astype(np.float32),
        "gate": rng.standard_normal((e, h, f)).astype(np.float32),
        "up": rng.standard_normal((e, h, f)).astype(np.float32),
        "down": rng.standard_normal((e, f, h)).astype(np.float32),
    }
    y = rng.standard_normal((b, t, h)).astype(np.float32)

    want = np.asarray(_moe_block(jnp.asarray(y), jax.tree_util.tree_map(
        jnp.asarray, moe_np), cfg))

    put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    moe_sh = {
        "router": put(moe_np["router"], P(None, None)),
        "gate": put(moe_np["gate"], P(MODEL_AXIS, None, None)),
        "up": put(moe_np["up"], P(MODEL_AXIS, None, None)),
        "down": put(moe_np["down"], P(MODEL_AXIS, None, None)),
    }
    y_sh = put(y, P(None, None, None))
    got = jax.jit(lambda yy, mm: _moe_block(yy, mm, cfg))(y_sh, moe_sh)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)
