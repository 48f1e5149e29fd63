"""Fused device query vs host-side channel + fusion path: ranking agreement."""

import numpy as np
import pytest

from legalrag_tpu.config import AppConfig
from legalrag_tpu.index.bundle import IndexBundle
from legalrag_tpu.retrieval.engine import FusedQueryEngine, bucket_batch
from legalrag_tpu.retrieval.fusion import ChannelResult, fuse


@pytest.fixture(scope="module")
def setup(en_chunks):
    cfg = AppConfig()
    cfg.engine.capacity_round = 256
    cfg.engine.late_doc_maxlen = 64
    bundle = IndexBundle.build_from_chunks(en_chunks[:200], cfg, "en")
    return bundle, FusedQueryEngine(bundle, cfg)


QUERIES = ["buyer in ordinary course of business",
           "security interest attaches when value is given",
           "negotiable instrument payable to bearer"]


def _host_rank(bundle, cfg, q, eff_k):
    r = cfg.retrieval
    qv = bundle.encoder.encode_queries([q])
    ds, dr = bundle.dense.topk(qv, eff_k)
    bs, br = bundle.bm25.topk([q], eff_k)
    qt, qm = bundle.encoder.encode_tokens([q], cfg.engine.max_query_tokens)
    ls, lr = bundle.tokens.topk(qt, qm, eff_k)
    fused = fuse([
        ChannelResult("dense", r.dense_weight, dr[0], ds[0]),
        ChannelResult("bm25", r.bm25_weight, br[0], bs[0]),
        ChannelResult("colbert", r.colbert_weight, lr[0], ls[0]),
    ], method=r.fusion_method, rrf_k=r.rrf_k, alpha=r.rrf_alpha)
    return [c.row for c in fused], {c.row: c.score for c in fused}


def test_fused_matches_host_fusion(setup):
    bundle, engine = setup
    cfg = engine.cfg
    top_k = 10
    scores, rows, comps = engine.search_batch(QUERIES, top_k)
    params = engine._params(top_k)
    for qi, q in enumerate(QUERIES):
        host_rows, host_scores = _host_rank(bundle, cfg, q, params.eff_k)
        got = [int(r) for r in rows[qi]]
        want = host_rows[:top_k]
        # scores must agree to float tolerance...
        for r_got in got:
            assert r_got in host_scores
            np.testing.assert_allclose(
                scores[qi][got.index(r_got)], host_scores[r_got], atol=2e-2)
        # ...and the top-5 ranking must agree exactly
        assert got[:5] == want[:5], (q, got[:5], want[:5])


def test_search_hits_shape(setup):
    _bundle, engine = setup
    hits = engine.search_hits(QUERIES[:2], top_k=5)
    assert len(hits) == 2
    assert all(h.score_breakdown["per_channel"] for hs in hits for h in hs)
    assert hits[0][0].chunk.text


def test_batch_bucketing():
    assert bucket_batch(1) == 1
    assert bucket_batch(3) == 4
    assert bucket_batch(64) == 64
    assert bucket_batch(200) == 200


def test_padded_batch_matches_single(setup):
    _bundle, engine = setup
    s1, r1, _ = engine.search_batch([QUERIES[0]], 5)
    s3, r3, _ = engine.search_batch(QUERIES, 5)  # padded to bucket 4
    assert (r1[0] == r3[0]).all()
    np.testing.assert_allclose(s1[0], s3[0], atol=1e-5)


def test_fused_engine_int8_dense_store(en_chunks):
    """engine.dtype='int8' (unit-int8 dense store, ops.topk.dense_scores):
    the fused engine serves the same top results as the bf16 store on the
    real corpus slice — the dense channel's HBM stream halves."""
    import jax.numpy as jnp

    cfg8 = AppConfig()
    cfg8.engine.capacity_round = 256
    cfg8.engine.late_doc_maxlen = 64
    cfg8.engine.dtype = "int8"
    b8 = IndexBundle.build_from_chunks(en_chunks[:200], cfg8, "en")
    assert b8.dense.emb.dtype == jnp.int8
    e8 = FusedQueryEngine(b8, cfg8)

    cfg = AppConfig()
    cfg.engine.capacity_round = 256
    cfg.engine.late_doc_maxlen = 64
    bf = IndexBundle.build_from_chunks(en_chunks[:200], cfg, "en")
    ef = FusedQueryEngine(bf, cfg)

    s8, r8, _ = e8.search_batch(QUERIES, 10)
    sf, rf, _ = ef.search_batch(QUERIES, 10)
    for qi in range(len(QUERIES)):
        # top-3 identical; fused scores within quantization tolerance
        assert [int(x) for x in r8[qi][:3]] == [int(x) for x in rf[qi][:3]]
        np.testing.assert_allclose(s8[qi], sf[qi], atol=3e-2)
