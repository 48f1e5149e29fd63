"""Sparse postings BM25 kernel (interpret mode) vs the impact-matrix path."""

import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.index.bm25_index import BM25Index
from legalrag_tpu.ops.bm25_sparse import bm25_sparse_scores, build_postings
from legalrag_tpu.tokenize import tokenize

DOCS = [
    "the seller must deliver conforming goods to the buyer",
    "a security interest attaches when value is given by the secured party",
    "the buyer in ordinary course takes free of the security interest",
    "rent is payable under the lease and the lessee must pay the lessor",
    "negotiable instruments are payable to bearer or to order",
] * 3  # repeat so postings exceed one chunk when chunk is small


@pytest.fixture(scope="module")
def index():
    idx = BM25Index("en")
    idx.build_from_texts(DOCS)
    return idx


def test_sparse_matches_impact(index):
    queries = ["security interest of the buyer", "lease rent",
               "unknownword only"]
    vocab_size = len(index.vocab)
    offsets, post_docs, post_w = build_postings(
        index.doc_term_ids, index.doc_term_freqs, vocab_size,
        index.k1, index.b, index.epsilon, chunk=8)
    maxlen = 8
    ids = np.zeros((len(queries), maxlen), np.int32)
    counts = np.zeros((len(queries), maxlen), np.int32)
    for qi, q in enumerate(queries):
        toks = [index.vocab[t] for t in tokenize(q, "en") if t in index.vocab]
        uniq = {}
        for t in toks:
            uniq[t] = uniq.get(t, 0) + 1
        for j, (t, c) in enumerate(list(uniq.items())[:maxlen]):
            ids[qi, j] = t
            counts[qi, j] = c

    n_pad = -(-index.n // 128) * 128
    got = np.asarray(bm25_sparse_scores(
        jnp.asarray(ids), jnp.asarray(counts), jnp.asarray(offsets),
        jnp.asarray(post_docs), jnp.asarray(post_w), n_pad, chunk=8,
        interpret=True))[:, : index.n]
    want = index.scores(queries)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_padding_terms_are_noops(index):
    vocab_size = len(index.vocab)
    offsets, post_docs, post_w = build_postings(
        index.doc_term_ids, index.doc_term_freqs, vocab_size, chunk=8)
    # all-padding query (term id 0 with count 0) scores zero everywhere
    ids = np.zeros((1, 4), np.int32)
    counts = np.zeros((1, 4), np.int32)
    n_pad = -(-index.n // 128) * 128
    got = np.asarray(bm25_sparse_scores(
        jnp.asarray(ids), jnp.asarray(counts), jnp.asarray(offsets),
        jnp.asarray(post_docs), jnp.asarray(post_w), n_pad, chunk=8,
        interpret=True))
    np.testing.assert_array_equal(got, 0.0)


def test_xla_scatter_variant_matches(index):
    import jax.numpy as jnp

    from legalrag_tpu.ops.bm25_sparse import bm25_sparse_scores_xla

    vocab_size = len(index.vocab)
    offsets, post_docs, post_w = build_postings(
        index.doc_term_ids, index.doc_term_freqs, vocab_size,
        index.k1, index.b, index.epsilon, chunk=8)
    queries = ["security interest of the buyer", "lease rent"]
    maxlen = 8
    ids = np.zeros((len(queries), maxlen), np.int32)
    counts = np.zeros((len(queries), maxlen), np.int32)
    for qi, q in enumerate(queries):
        toks = [index.vocab[t] for t in tokenize(q, "en") if t in index.vocab]
        uniq = {}
        for t in toks:
            uniq[t] = uniq.get(t, 0) + 1
        for j, (t, c) in enumerate(list(uniq.items())[:maxlen]):
            ids[qi, j] = t
            counts[qi, j] = c
    n_pad = -(-index.n // 128) * 128
    got = np.asarray(bm25_sparse_scores_xla(
        jnp.asarray(ids), jnp.asarray(counts), jnp.asarray(offsets),
        jnp.asarray(post_docs), jnp.asarray(post_w), n_pad,
        max_postings=maxlen * 32))[:, : index.n]
    want = index.scores(queries)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sorted_topk_matches_scatter_map():
    """Scatter-free sorted-segment BM25 top-k must reproduce the scatter
    map's candidates and scores (the scatter path serialized on TPU and
    dominated the large-corpus program — this is its replacement)."""
    import jax.numpy as jnp

    from legalrag_tpu.ops.bm25_sparse import (
        bm25_sparse_scores_xla,
        bm25_sparse_topk_sorted,
        build_postings,
    )

    rng = np.random.default_rng(0)
    V, N, B, T, k = 200, 500, 4, 8, 16
    doc_ids, doc_tfs = [], []
    for _ in range(N):
        n_terms = rng.integers(3, 20)
        doc_ids.append(rng.choice(V, n_terms, replace=False).astype(np.int64))
        doc_tfs.append(rng.integers(1, 5, n_terms).astype(np.float64))
    offsets, post_docs, post_w = build_postings(doc_ids, doc_tfs, V)
    term_ids = rng.integers(0, V, (B, T)).astype(np.int32)
    term_counts = np.ones((B, T), np.int32)
    term_counts[0, 5:] = 0  # padded query slots

    args = (jnp.asarray(term_ids), jnp.asarray(term_counts),
            jnp.asarray(offsets), jnp.asarray(post_docs),
            jnp.asarray(post_w))
    full = np.asarray(bm25_sparse_scores_xla(*args, 512,
                                             max_postings=4096))[:, :N]
    s, i = (np.asarray(x) for x in
            bm25_sparse_topk_sorted(*args, k, max_postings=4096))
    ref_i = np.argsort(-full, axis=1, kind="stable")[:, :k]
    for q in range(B):
        want = full[q][ref_i[q]]
        pos = want > 1e-9
        # cumsum vs scatter accumulation order: f32 noise ~1e-5
        np.testing.assert_allclose(np.sort(s[q][s[q] > 1e-9]),
                                   np.sort(want[pos]), rtol=1e-5, atol=1e-4)
        assert set(i[q][s[q] > 1e-9]) == set(ref_i[q][pos])


def test_merge_topk_matches_sorted_and_auto_routes():
    """The merge-network top-k (the production route via
    ``bm25_sparse_topk_auto`` whenever per_term is a power of two) must
    agree with the sorted-segment path — including the awkward geometry:
    non-power-of-two max_terms (sentinel blocks pad the merge tree),
    duplicate query terms, padded slots, and k larger than the real
    candidate count."""
    import jax.numpy as jnp

    from legalrag_tpu.ops.bm25_sparse import (
        bm25_sparse_topk_auto,
        bm25_sparse_topk_merge,
        bm25_sparse_topk_sorted,
        build_postings,
    )

    rng = np.random.default_rng(7)
    V, N, B, k = 150, 400, 5, 32
    T, max_postings = 6, 3072            # per_term=512 pow2, t_pad=8 != T
    doc_ids, doc_tfs = [], []
    for _ in range(N):
        n_terms = rng.integers(2, 15)
        doc_ids.append(rng.choice(V, n_terms, replace=False).astype(np.int64))
        doc_tfs.append(rng.integers(1, 4, n_terms).astype(np.float64))
    offsets, post_docs, post_w = build_postings(doc_ids, doc_tfs, V)
    term_ids = rng.integers(0, V, (B, T)).astype(np.int32)
    term_ids[2, 1] = term_ids[2, 0]      # duplicate query term
    term_counts = np.ones((B, T), np.int32)
    term_counts[0, 3:] = 0               # padded slots
    term_counts[4, :] = 0                # fully-padded query

    args = (jnp.asarray(term_ids), jnp.asarray(term_counts),
            jnp.asarray(offsets), jnp.asarray(post_docs),
            jnp.asarray(post_w))
    ss, si = (np.asarray(x) for x in
              bm25_sparse_topk_sorted(*args, k, max_postings=max_postings))
    ms, mi = (np.asarray(x) for x in
              bm25_sparse_topk_merge(*args, k, max_postings=max_postings))
    as_, ai = (np.asarray(x) for x in
               bm25_sparse_topk_auto(*args, k, max_postings=max_postings))
    np.testing.assert_allclose(as_, ms, rtol=0, atol=0)  # auto routed merge
    np.testing.assert_array_equal(ai, mi)
    for q in range(B):
        pos_s, pos_m = ss[q] > 1e-9, ms[q] > 1e-9
        assert set(mi[q][pos_m]) == set(si[q][pos_s])
        assert len(set(mi[q][pos_m])) == pos_m.sum()  # one emission per doc
        a = dict(zip(si[q][pos_s], ss[q][pos_s]))
        b = dict(zip(mi[q][pos_m], ms[q][pos_m]))
        for d, v in a.items():
            np.testing.assert_allclose(b[d], v, rtol=1e-5, atol=1e-4)
    assert not (ms[4] > 1e-9).any()      # fully-padded query scores nothing


def test_eq_topk_matches_sorted():
    """The sort-free equality-contraction top-k must agree with the
    sorted-segment path: same candidate set, same totals (f32 order
    noise), one emission per doc."""
    import jax.numpy as jnp

    from legalrag_tpu.ops.bm25_sparse import (
        bm25_sparse_topk_eq,
        bm25_sparse_topk_sorted,
        build_postings,
    )

    rng = np.random.default_rng(1)
    V, N, B, T, k = 200, 500, 4, 8, 16
    doc_ids, doc_tfs = [], []
    for _ in range(N):
        n_terms = rng.integers(3, 20)
        doc_ids.append(rng.choice(V, n_terms, replace=False).astype(np.int64))
        doc_tfs.append(rng.integers(1, 5, n_terms).astype(np.float64))
    offsets, post_docs, post_w = build_postings(doc_ids, doc_tfs, V)
    term_ids = rng.integers(0, V, (B, T)).astype(np.int32)
    term_ids[1, 3] = term_ids[1, 2]  # duplicate query term: both contribute
    term_counts = np.ones((B, T), np.int32)
    term_counts[0, 5:] = 0  # padded query slots

    args = (jnp.asarray(term_ids), jnp.asarray(term_counts),
            jnp.asarray(offsets), jnp.asarray(post_docs),
            jnp.asarray(post_w))
    ss, si = (np.asarray(x) for x in
              bm25_sparse_topk_sorted(*args, k, max_postings=4096))
    es, ei = (np.asarray(x) for x in
              bm25_sparse_topk_eq(*args, k, max_postings=4096, chunk=512))
    for q in range(B):
        pos_s, pos_e = ss[q] > 1e-9, es[q] > 1e-9
        assert set(ei[q][pos_e]) == set(si[q][pos_s])
        # no duplicate doc may occupy two top-k slots
        assert len(set(ei[q][pos_e])) == pos_e.sum()
        a = dict(zip(si[q][pos_s], ss[q][pos_s]))
        b = dict(zip(ei[q][pos_e], es[q][pos_e]))
        for d, v in a.items():
            np.testing.assert_allclose(b[d], v, rtol=1e-5, atol=1e-4)


def test_sorted_and_merge_exact_with_negative_weights():
    """Degenerate corpora produce NEGATIVE epsilon-floored idf weights
    (mean raw idf < 0 when most terms appear in most docs). The segment
    totals must stay exact — the old cummax-over-values prefix
    propagation silently under-counted here."""
    import jax.numpy as jnp

    from legalrag_tpu.ops.bm25_sparse import (
        bm25_sparse_scores_xla,
        bm25_sparse_topk_merge,
        bm25_sparse_topk_sorted,
        build_postings,
    )

    rng = np.random.default_rng(3)
    V, N, B, T, k = 8, 30, 3, 4, 8
    # every doc contains almost every term -> negative idf everywhere
    doc_ids = [np.arange(V - 1, dtype=np.int64) for _ in range(N)]
    doc_tfs = [rng.integers(1, 6, V - 1).astype(np.float64)
               for _ in range(N)]
    offsets, post_docs, post_w = build_postings(doc_ids, doc_tfs, V)
    assert np.asarray(post_w).min() < 0  # the scenario under test
    term_ids = rng.integers(0, V - 1, (B, T)).astype(np.int32)
    term_counts = np.ones((B, T), np.int32)
    args = (jnp.asarray(term_ids), jnp.asarray(term_counts),
            jnp.asarray(offsets), jnp.asarray(post_docs),
            jnp.asarray(post_w))
    full = np.asarray(bm25_sparse_scores_xla(*args, 32,
                                             max_postings=256))[:, :N]
    for fn in (bm25_sparse_topk_sorted, bm25_sparse_topk_merge):
        s, i = (np.asarray(x) for x in fn(*args, k, max_postings=256))
        for q in range(B):
            got = {int(d): float(v) for d, v in zip(i[q], s[q])
                   if v > -1e29}
            for d, v in got.items():
                np.testing.assert_allclose(v, full[q][d], rtol=1e-5,
                                           atol=1e-5)
            # the top-k by value must match the dense oracle's top-k
            want_top = np.sort(full[q])[-len(got):]
            np.testing.assert_allclose(np.sort(list(got.values())),
                                       want_top, rtol=1e-5, atol=1e-5)
