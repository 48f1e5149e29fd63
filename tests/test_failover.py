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
