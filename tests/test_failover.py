"""Device-loss failover: serving survives the accelerator dying mid-flight
(observed in the wild on relay tunnels — every op raises
FAILED_PRECONDITION) by rebuilding the index on host CPU."""

import jax
import pytest

from legalrag_tpu.config import AppConfig
from legalrag_tpu.index.bundle import IndexBundle
from legalrag_tpu.retrieval.by_lang import BundleCache, ByLangRetriever


@pytest.fixture()
def served_root(en_chunks, tmp_path_factory):
    root = tmp_path_factory.mktemp("failover")
    cfg = AppConfig()
    cfg.llm.provider = "disabled"
    cfg.engine.capacity_round = 256
    cfg.engine.late_doc_maxlen = 32
    for name in ("data_dir", "raw_dir", "processed_dir", "index_dir",
                 "graph_dir", "eval_dir", "upload_dir"):
        setattr(cfg.paths, name, root / name)
    cfg.paths.ensure_tree()
    bundle = IndexBundle.build_from_chunks(en_chunks[:60],
                                           cfg.with_lang("en"), "en")
    bundle.save(root / "index_dir" / "en")
    return cfg


def test_search_fails_over_to_cpu(served_root):
    retr = ByLangRetriever(served_root)
    q = "security interest of the buyer"
    assert retr.search(q, top_k=5)          # healthy path works

    # kill the live retriever: every search raises like a dead accelerator
    broken = retr.retriever("en")

    def dead(*a, **kw):
        raise jax.errors.JaxRuntimeError(
            "FAILED_PRECONDITION: TPU backend error")

    broken.search = dead
    hits = retr.search(q, top_k=5)
    assert hits and hits[0].chunk.article_id
    assert retr.cache.failed_over
    assert retr.cache.device == jax.devices("cpu")[0]
    # subsequent searches keep working on the rebuilt CPU bundle
    assert retr.search("delivery of the goods", top_k=3)


def test_failover_disables_sharding(served_root):
    served_root.engine.n_index_shards = 2
    cache = BundleCache(served_root)
    b = cache.get("en")
    assert b.mesh is not None
    cache.failover_to_cpu()
    b2 = cache.get("en")
    assert b2.mesh is None                   # mesh lived on the dead device


def test_failover_mid_shard_transfer(served_root, monkeypatch):
    """Device dies DURING ``shard_views()``: the first shard array transfers,
    the second ``device_put`` raises — the bundle is left partially
    transferred (mesh set, ``_shard_views`` never cached). Recovery must
    rebuild on CPU from disk, not from the half-placed state."""
    from jax.sharding import NamedSharding

    import copy

    q = "security interest of the buyer"
    control_cfg = copy.deepcopy(served_root)
    control_cfg.engine.n_index_shards = 1
    want = [h.chunk.article_id
            for h in ByLangRetriever(control_cfg).search(q, top_k=5)]

    served_root.engine.n_index_shards = 2

    retr = ByLangRetriever(served_root)
    real_put = jax.device_put
    calls = {"mesh_puts": 0}

    def dying_put(x, device=None, **kw):
        if isinstance(device, NamedSharding):
            calls["mesh_puts"] += 1
            if calls["mesh_puts"] >= 2:      # first shard lands, second dies
                raise jax.errors.JaxRuntimeError(
                    "FAILED_PRECONDITION: device disappeared mid-transfer")
        return real_put(x, device, **kw)

    monkeypatch.setattr(jax, "device_put", dying_put)
    hits = retr.search(q, top_k=5)           # transfer dies inside search
    assert calls["mesh_puts"] >= 2           # the seam actually fired
    assert retr.cache.failed_over
    assert retr.cache.get("en").mesh is None
    assert [h.chunk.article_id for h in hits] == want
    # still serving after the patch is gone (no stale half-transferred views)
    monkeypatch.setattr(jax, "device_put", real_put)
    assert [h.chunk.article_id
            for h in retr.search(q, top_k=5)] == want


def test_failover_dead_mesh_mid_execution(served_root, monkeypatch):
    """Device dies AFTER a healthy sharded search: views are genuinely
    transferred and cached on the mesh, then the sharded program starts
    failing. Recovery must abandon the (real, now-dead) cached views."""
    import legalrag_tpu.parallel.sharded_search as ss

    served_root.engine.n_index_shards = 2
    retr = ByLangRetriever(served_root)
    q = "security interest of the buyer"
    healthy = [h.chunk.article_id for h in retr.search(q, top_k=5)]
    assert healthy
    bundle = retr.cache.get("en")
    assert bundle.mesh is not None and bundle._shard_views is not None

    def dead_program(*a, **kw):
        raise jax.errors.JaxRuntimeError(
            "FAILED_PRECONDITION: mesh device unreachable")

    monkeypatch.setattr(ss, "sharded_channels_topk", dead_program)
    hits = retr.search(q, top_k=5)
    assert retr.cache.failed_over
    assert [h.chunk.article_id for h in hits] == healthy
    # the rebuilt CPU bundle never touches the dead sharded path again
    assert retr.cache.get("en").mesh is None
    assert [h.chunk.article_id
            for h in retr.search("delivery of the goods", top_k=3)]
