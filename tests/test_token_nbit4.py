"""PLAID-class nbits=4 residual token compression (VERDICT r1 #8).

Reference builds nbits=4 residual ColBERT indexes
(``/root/reference/legalrag/retrieval/builders/colbert_builder.py:119-134``);
here the equivalent is ``Residual4TokenIndex``: K=256 centroids + per-dim
4-bit residual codes, dequantized inside the MaxSim score producers.
"""

import numpy as np
import pytest

from legalrag_tpu.config import AppConfig
from legalrag_tpu.index.bundle import IndexBundle
from legalrag_tpu.index.token_index import Residual4TokenIndex, TokenIndex


def _random_tokens(n, l, dt, seed=0):
    rng = np.random.default_rng(seed)
    # cluster-structured unit vectors (quantization-friendly like real
    # embeddings, unlike pure iid noise)
    centers = rng.standard_normal((32, dt))
    x = centers[rng.integers(0, 32, n * l)] + 0.3 * rng.standard_normal(
        (n * l, dt))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    mask = rng.random((n, l)) < 0.9
    mask[:, 0] = True
    return x.reshape(n, l, dt).astype(np.float32), mask


def test_reconstruction_quality():
    tok, mask = _random_tokens(256, 16, 32)
    idx = Residual4TokenIndex(32, 16, capacity_round=256)
    idx.add(tok, mask)
    recon, _ = idx.dequantized()
    recon = recon[:256]
    cos = (recon * tok).sum(-1) / np.maximum(
        np.linalg.norm(recon, axis=-1) * np.linalg.norm(tok, axis=-1), 1e-9)
    assert float(cos[mask].mean()) > 0.97


def test_memory_is_quarter_of_bf16():
    tok, mask = _random_tokens(512, 16, 64)
    idx = Residual4TokenIndex(64, 16, capacity_round=512)
    idx.add(tok, mask)
    bf16_bytes = 512 * 16 * 64 * 2
    # marginal per-token payload: codes (1 B) + packed (dt/2 B) = 33 B vs
    # 128 B bf16 ≈ 0.26x; the K×dt centroid table is a constant that
    # amortizes away at corpus scale
    const = idx.centroids.nbytes + idx.scales.nbytes
    assert (idx.nbytes - const) < 0.27 * bf16_bytes
    assert idx.nbytes < 0.35 * bf16_bytes


def test_maxsim_channel_agreement_vs_exact():
    """Top-k over the compressed store must closely match exact f32 MaxSim
    (scores within a few %, strong top-k overlap)."""
    tok, mask = _random_tokens(512, 12, 32, seed=1)
    exact = TokenIndex(32, 12, dtype="float32", capacity_round=512)
    exact.add(tok, mask)
    comp = Residual4TokenIndex(32, 12, capacity_round=512)
    comp.add(tok, mask)

    rng = np.random.default_rng(2)
    q = rng.standard_normal((4, 6, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    qm = np.ones((4, 6), bool)
    es, ei = exact.topk(q, qm, 10)
    cs, ci = comp.topk(q, qm, 10)
    overlap = np.mean([len(set(a) & set(b)) / 10
                       for a, b in zip(ei.tolist(), ci.tolist())])
    assert overlap >= 0.8
    np.testing.assert_allclose(cs[:, 0], es[:, 0], rtol=0.05, atol=0.05)


def test_candidate_scoring_path():
    tok, mask = _random_tokens(256, 12, 32, seed=3)
    comp = Residual4TokenIndex(32, 12, capacity_round=256)
    comp.add(tok, mask)
    rng = np.random.default_rng(4)
    q = rng.standard_normal((2, 6, 32)).astype(np.float32)
    qm = np.ones((2, 6), bool)
    cand = rng.integers(0, 256, (2, 8)).astype(np.int32)
    s = comp.score_candidates(q, qm, cand)
    assert s.shape == (2, 8) and np.isfinite(s).all()


def test_save_load_roundtrip(tmp_path):
    tok, mask = _random_tokens(128, 8, 32, seed=5)
    comp = Residual4TokenIndex(32, 8, capacity_round=128)
    comp.add(tok, mask)
    comp.save(tmp_path / "tokens.npz")
    # generic TokenIndex.load dispatches on the payload format
    loaded = TokenIndex.load(tmp_path / "tokens.npz", capacity_round=128)
    assert isinstance(loaded, Residual4TokenIndex)
    assert loaded.n == comp.n
    a, _ = comp.dequantized()
    b, _ = loaded.dequantized()
    np.testing.assert_array_equal(np.asarray(comp.packed),
                                  np.asarray(loaded.packed))
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.fixture(scope="module")
def nbit4_bundle(zh_chunks):
    cfg = AppConfig()
    cfg.engine.capacity_round = 256
    cfg.engine.late_doc_maxlen = 64
    cfg.engine.token_dtype = "nbit4"
    bundle = IndexBundle.build_from_chunks(zh_chunks[:150],
                                           cfg.with_lang("zh"), "zh")
    return bundle, cfg


def test_bundle_end_to_end_with_nbit4(nbit4_bundle):
    from legalrag_tpu.retrieval.hybrid import HybridRetriever

    bundle, cfg = nbit4_bundle
    assert isinstance(bundle.tokens, Residual4TokenIndex)
    hy = HybridRetriever(bundle, cfg.with_lang("zh"))
    one = hy._channels_topk_all("买卖合同的标的物风险", 16)
    assert one is not None and "colbert" in one
    hits = hy.search("买卖合同的标的物风险", top_k=5)
    assert hits


def test_nbit4_recall_delta_on_real_corpus(nbit4_bundle, zh_chunks):
    """Fused-engine recall with the compressed store must stay within 2 pts
    of the bf16 store on the extractive eval (the measured recall cost of
    4-bit compression)."""
    from scripts.parity_gate import make_queries, recall_mrr
    from legalrag_tpu.retrieval.engine import FusedQueryEngine

    comp_bundle, cfg = nbit4_bundle
    base_cfg = AppConfig()
    base_cfg.engine.capacity_round = 256
    base_cfg.engine.late_doc_maxlen = 64
    base_bundle = IndexBundle.build_from_chunks(zh_chunks[:150],
                                                base_cfg.with_lang("zh"), "zh")
    queries, gold = make_queries(base_bundle, 60)
    r = {}
    for name, (b, c) in {"bf16": (base_bundle, base_cfg),
                         "nbit4": (comp_bundle, cfg)}.items():
        engine = FusedQueryEngine(b, c.with_lang("zh"))
        rows = [x[:10].tolist() for x in engine.search_batch(queries, 10)[1]]
        r[name], _ = recall_mrr(rows, gold, 10)
    assert r["nbit4"] >= r["bf16"] - 0.02, r
