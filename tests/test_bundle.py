"""IndexBundle: build → query sanity → save/load → incremental add."""

import numpy as np
import pytest

from legalrag_tpu.config import AppConfig
from legalrag_tpu.index.bundle import IndexBundle


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("bundle")
    cfg = AppConfig()
    cfg.engine.capacity_round = 64
    cfg.engine.late_doc_maxlen = 64
    return cfg


@pytest.fixture(scope="module")
def bundle(cfg, en_chunks):
    return IndexBundle.build_from_chunks(en_chunks[:120], cfg, "en")


def test_build_counts(bundle):
    assert bundle.n_docs == 120
    assert bundle.dense.n == 120
    assert bundle.bm25.n == 120
    assert bundle.tokens.n == 120


def test_dense_retrieval_sanity(bundle):
    # query with a near-verbatim phrase from § 1-106 (singular/plural rules)
    q = bundle.encoder.encode_queries(
        ["words in the singular number include the plural"])
    s, rows = bundle.dense.topk(q, 5)
    hits = [bundle.chunks[r].article_id for r in rows[0]]
    assert "1-106" in hits


def test_bm25_retrieval_sanity(bundle):
    s, rows = bundle.bm25.topk(["buyer in ordinary course of business"], 5)
    hits = [bundle.chunks[r].article_id for r in rows[0]]
    assert "1-201" in hits


def test_save_load_roundtrip(bundle, cfg, tmp_path):
    bundle.save(tmp_path / "en")
    loaded = IndexBundle.load(tmp_path / "en", cfg, "en")
    assert loaded.n_docs == bundle.n_docs
    q = loaded.encoder.encode_queries(["security interest in collateral"])
    s1, r1 = loaded.dense.topk(q, 5)
    q2 = bundle.encoder.encode_queries(["security interest in collateral"])
    s2, r2 = bundle.dense.topk(q2, 5)
    assert (r1 == r2).all()
    np.testing.assert_allclose(s1, s2, rtol=1e-2, atol=1e-2)


def test_incremental_add(cfg, en_chunks):
    b = IndexBundle.build_from_chunks(en_chunks[:50], cfg, "en")
    n0 = b.generation
    added = b.add_chunks(en_chunks[40:70])
    assert added == 20  # 10 dups skipped
    assert b.n_docs == 70 and b.dense.n == 70 and b.bm25.n == 70
    assert b.generation > n0
    # re-adding the same chunks is a no-op
    assert b.add_chunks(en_chunks[40:70]) == 0


def test_stale_fingerprint_refuses_load(tmp_path, cfg, en_chunks):
    """ADVICE r4: featurization changes must force a rebuild — an index
    whose manifest carries a different tokenize fingerprint (or none:
    pre-fingerprint artifacts) must refuse to load."""
    import json

    import pytest

    from legalrag_tpu.index.bundle import IndexBundle, StaleIndexError

    b = IndexBundle.build_from_chunks(en_chunks[:20], cfg, "en")
    d = tmp_path / "idx"
    b.save(d)
    IndexBundle.load(d, cfg, "en")  # fresh: loads fine
    m = json.loads((d / "manifest.json").read_text())
    m["tokenize_fingerprint"] = "secref-v2-stale"
    (d / "manifest.json").write_text(json.dumps(m))
    with pytest.raises(StaleIndexError):
        IndexBundle.load(d, cfg, "en")
    del m["tokenize_fingerprint"]   # pre-fingerprint manifest
    (d / "manifest.json").write_text(json.dumps(m))
    with pytest.raises(StaleIndexError):
        IndexBundle.load(d, cfg, "en")
