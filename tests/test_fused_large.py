"""Large-corpus fused mode (sparse BM25 + candidate MaxSim) vs standard mode."""

import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.config import AppConfig
from legalrag_tpu.index.bundle import IndexBundle
from legalrag_tpu.ops.bm25_sparse import build_postings
from legalrag_tpu.ops.fused_query import FusedParams, fused_hybrid_topk


@pytest.fixture(scope="module")
def setup(en_chunks):
    cfg = AppConfig()
    cfg.engine.capacity_round = 256
    cfg.engine.late_doc_maxlen = 64
    bundle = IndexBundle.build_from_chunks(en_chunks[:200], cfg, "en")
    return bundle, cfg


def _query_inputs(bundle, cfg, queries):
    enc = bundle.encoder
    qvec = jnp.asarray(enc.encode_queries(queries))
    ids, mask = bundle.bm25.query_term_ids(queries, 32)
    qt, qm = enc.encode_tokens(queries, 32)
    return qvec, ids, mask, jnp.asarray(qt, bundle.tokens.dtype), jnp.asarray(qm)


def test_large_mode_matches_standard(setup):
    bundle, cfg = setup
    queries = ["buyer in ordinary course of business",
               "negotiable instrument payable to bearer"]
    qvec, ids, mask, qt, qm = _query_inputs(bundle, cfg, queries)
    n = bundle.dense.capacity
    base = FusedParams(eff_k=32, final_k=10, rrf_k=60.0, alpha=0.5,
                       w_dense=0.6, w_bm25=0.4, w_late=0.35)

    standard = fused_hybrid_topk(
        bundle.dense.emb, bundle.bm25.impact, bundle.tokens.tok,
        bundle.tokens.mask, qvec, (jnp.asarray(ids), jnp.asarray(mask)),
        qt, qm, jnp.int32(bundle.dense.n), base)

    offsets, post_docs, post_w = build_postings(
        bundle.bm25.doc_term_ids, bundle.bm25.doc_term_freqs,
        len(bundle.bm25.vocab), bundle.bm25.k1, bundle.bm25.b,
        bundle.bm25.epsilon)
    # candidates = full corpus → candidate mode must agree exactly
    large = FusedParams(eff_k=32, final_k=10, rrf_k=60.0, alpha=0.5,
                        w_dense=0.6, w_bm25=0.4, w_late=0.35,
                        late_candidates=n, max_postings=32 * 256)
    got = fused_hybrid_topk(
        bundle.dense.emb,
        (jnp.asarray(offsets), jnp.asarray(post_docs), jnp.asarray(post_w)),
        bundle.tokens.tok, bundle.tokens.mask, qvec,
        (jnp.asarray(ids), jnp.asarray(mask)), qt, qm,
        jnp.int32(bundle.dense.n), large)

    np.testing.assert_array_equal(np.asarray(got["rows"]),
                                  np.asarray(standard["rows"]))
    gp, sp = np.asarray(got["packed"]), np.asarray(standard["packed"])
    # dense score: identical math
    np.testing.assert_allclose(gp[..., 1], sp[..., 1], rtol=1e-4, atol=1e-4)
    # fused score / rrf_norm / weighted_sum: identical up to the starved-
    # channel divergence (the map path pads a channel short of eff_k
    # positive docs with zero-score candidates, shifting min-max stats by
    # ~1e-3 — see _fused_lists docstring; ranking order already asserted)
    for ci in (0, 3, 4):
        np.testing.assert_allclose(gp[..., ci], sp[..., ci],
                                   rtol=1e-2, atol=5e-3)
    # bm25/colbert components: the list path reports 0 for docs OUTSIDE the
    # channel's own top-eff_k (reference list semantics,
    # hybrid_retriever.py:389-551); the map path gathers the raw map value.
    # Where the list path reports a value it must match the map exactly.
    for ci in (2, 5):
        reported = np.abs(gp[..., ci]) > 1e-9
        np.testing.assert_allclose(gp[..., ci][reported],
                                   sp[..., ci][reported],
                                   rtol=1e-4, atol=1e-4)
        assert reported.mean() > 0.5  # most final hits come from the lists


def test_two_pass_routing_inside_fused_lists(setup, monkeypatch):
    """Round-3: past TWO_PASS_MIN_N columns the large-corpus program's
    dense selection routes through topk_2pass. Force the threshold down so
    the route triggers at test scale and assert the program's output is
    unchanged vs the plain lax.top_k route."""
    import jax

    from legalrag_tpu.ops import topk as topk_mod

    bundle, cfg = setup
    queries = ["lease contract default remedies",
               "warranty of merchantability goods"]
    qvec, ids, mask, qt, qm = _query_inputs(bundle, cfg, queries)
    offsets, post_docs, post_w = build_postings(
        bundle.bm25.doc_term_ids, bundle.bm25.doc_term_freqs,
        len(bundle.bm25.vocab))
    params = FusedParams(eff_k=16, final_k=10, rrf_k=60.0, alpha=0.5,
                         w_dense=0.6, w_bm25=0.4, w_late=0.35,
                         late_candidates=32)

    def run():
        return fused_hybrid_topk(
            bundle.dense.emb,
            (jnp.asarray(offsets), jnp.asarray(post_docs),
             jnp.asarray(post_w)),
            bundle.tokens.tok, bundle.tokens.mask, qvec,
            (jnp.asarray(ids), jnp.asarray(mask)), qt, qm,
            jnp.int32(bundle.dense.n), params)

    plain = run()
    plain_rows = np.asarray(plain["rows"]).copy()
    plain_scores = np.asarray(plain["packed"])[..., 0].copy()

    monkeypatch.setattr(topk_mod, "TWO_PASS_MIN_N", 64)
    jax.clear_caches()  # force a re-trace so topk_large re-reads the gate
    try:
        routed = run()
        np.testing.assert_array_equal(np.asarray(routed["rows"]),
                                      plain_rows)
        np.testing.assert_allclose(np.asarray(routed["packed"])[..., 0],
                                   plain_scores, atol=1e-6)
    finally:
        monkeypatch.undo()
        jax.clear_caches()


def test_candidate_mode_prefilters(setup):
    bundle, cfg = setup
    queries = ["security interest attaches when value is given"]
    qvec, ids, mask, qt, qm = _query_inputs(bundle, cfg, queries)
    params = FusedParams(eff_k=16, final_k=5, rrf_k=60.0, alpha=0.5,
                         w_dense=0.6, w_bm25=0.4, w_late=0.35,
                         late_candidates=32)
    offsets, post_docs, post_w = build_postings(
        bundle.bm25.doc_term_ids, bundle.bm25.doc_term_freqs,
        len(bundle.bm25.vocab))
    out = fused_hybrid_topk(
        bundle.dense.emb,
        (jnp.asarray(offsets), jnp.asarray(post_docs), jnp.asarray(post_w)),
        bundle.tokens.tok, bundle.tokens.mask, qvec,
        (jnp.asarray(ids), jnp.asarray(mask)), qt, qm,
        jnp.int32(bundle.dense.n), params)
    rows = np.asarray(out["rows"])
    assert rows.shape == (1, 5)
    assert (rows < bundle.dense.n).all()
    scores = np.asarray(out["packed"])[..., 0]
    assert (np.diff(scores[0]) <= 1e-6).all()


def test_candidate_mode_eff_k_exceeds_late_candidates(setup):
    """Regression: fuse_row built RRF ranks from the FIRST list's length,
    so a late-channel list shorter than eff_k (late_candidates < eff_k —
    any top_k >= 33 with the default 128-candidate prefilter) crashed at
    trace time with a broadcast ValueError."""
    bundle, cfg = setup
    queries = ["firm offer by a merchant in a signed writing"]
    qvec, ids, mask, qt, qm = _query_inputs(bundle, cfg, queries)
    params = FusedParams(eff_k=32, final_k=10, rrf_k=60.0, alpha=0.5,
                         w_dense=0.6, w_bm25=0.4, w_late=0.35,
                         late_candidates=8)
    offsets, post_docs, post_w = build_postings(
        bundle.bm25.doc_term_ids, bundle.bm25.doc_term_freqs,
        len(bundle.bm25.vocab))
    out = fused_hybrid_topk(
        bundle.dense.emb,
        (jnp.asarray(offsets), jnp.asarray(post_docs), jnp.asarray(post_w)),
        bundle.tokens.tok, bundle.tokens.mask, qvec,
        (jnp.asarray(ids), jnp.asarray(mask)), qt, qm,
        jnp.int32(bundle.dense.n), params)
    rows = np.asarray(out["rows"])
    assert rows.shape == (1, 10)
    assert (rows < bundle.dense.n).all()
    scores = np.asarray(out["packed"])[..., 0]
    assert (np.diff(scores[0]) <= 1e-6).all()


def test_bf16_dense_map_recall_parity(setup):
    """dense_map_bf16: same program with a bf16 score map must return
    near-identical rankings (winners are rescored exactly in f32; only
    sub-ulp near-ties may swap) on the real corpus slice."""
    bundle, cfg = setup
    queries = ["buyer in ordinary course of business",
               "negotiable instrument payable to bearer",
               "security interest attaches when value is given",
               "warranty of merchantability goods"]
    qvec, ids, mask, qt, qm = _query_inputs(bundle, cfg, queries)
    offsets, post_docs, post_w = build_postings(
        bundle.bm25.doc_term_ids, bundle.bm25.doc_term_freqs,
        len(bundle.bm25.vocab))

    def run(bf16):
        params = FusedParams(eff_k=32, final_k=10, rrf_k=60.0, alpha=0.5,
                             w_dense=0.6, w_bm25=0.4, w_late=0.35,
                             late_candidates=32, max_postings=32 * 256,
                             dense_map_bf16=bf16)
        return fused_hybrid_topk(
            bundle.dense.emb,
            (jnp.asarray(offsets), jnp.asarray(post_docs),
             jnp.asarray(post_w)),
            bundle.tokens.tok, bundle.tokens.mask, qvec,
            (jnp.asarray(ids), jnp.asarray(mask)), qt, qm,
            jnp.int32(bundle.dense.n), params)

    f32 = run(False)
    b16 = run(True)
    rf, rb = np.asarray(f32["rows"]), np.asarray(b16["rows"])
    for r in range(len(queries)):
        overlap = len(set(rf[r].tolist()) & set(rb[r].tolist()))
        assert overlap >= 9, (r, overlap)           # ≥9/10 identical
        assert rf[r][0] == rb[r][0], r              # top-1 stable
    # dense components of common hits are exact f32 (rescored)
    pf, pb = np.asarray(f32["packed"]), np.asarray(b16["packed"])
    for r in range(len(queries)):
        common = np.intersect1d(rf[r], rb[r])
        for doc in common.tolist():
            i, j = list(rf[r]).index(doc), list(rb[r]).index(doc)
            np.testing.assert_allclose(pf[r, i, 1], pb[r, j, 1],
                                       rtol=1e-5, atol=1e-5)
