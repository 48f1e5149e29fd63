"""BM25 numeric parity: device impact-matrix scoring vs the BM25Okapi oracle."""

import numpy as np
import pytest

from legalrag_tpu.index.bm25_index import BM25Index
from legalrag_tpu.ops.bm25 import bm25_scores_oracle
from legalrag_tpu.tokenize import tokenize

EN_DOCS = [
    "A buyer in ordinary course of business takes free of a security interest created by the seller.",
    "The lessee must pay rent under the lease contract. The lease contract governs rent.",
    "Negotiable instruments include checks, drafts and promissory notes payable to bearer.",
    "A security interest attaches when value is given and the debtor has rights in the collateral.",
    "Delivery of goods requires tender at a reasonable hour and the buyer must accept.",
]


def test_en_scores_match_oracle():
    idx = BM25Index("en")
    idx.build_from_texts(EN_DOCS)
    queries = ["security interest of the buyer", "lease rent payment",
               "promissory notes", "zzz unknown words only"]
    got = idx.scores(queries)
    doc_toks = [tokenize(d, "en") for d in EN_DOCS]
    for qi, q in enumerate(queries):
        want = bm25_scores_oracle(doc_toks, tokenize(q, "en"))
        np.testing.assert_allclose(got[qi], want, rtol=1e-5, atol=1e-5)


def test_repeated_query_terms_double():
    idx = BM25Index("en")
    idx.build_from_texts(EN_DOCS)
    s1 = idx.scores(["rent"])
    s2 = idx.scores(["rent rent"])
    np.testing.assert_allclose(s2, 2 * s1, rtol=1e-5, atol=1e-6)


def test_zh_scores_match_oracle(zh_chunks):
    docs = [c.text for c in zh_chunks[:100]]
    idx = BM25Index("zh")
    idx.build_from_texts(docs)
    doc_toks = [tokenize(d, "zh") for d in docs]
    queries = ["自然人下落不明宣告失踪", "监护人的职责"]
    got = idx.scores(queries)
    for qi, q in enumerate(queries):
        want = bm25_scores_oracle(doc_toks, tokenize(q, "zh"))
        np.testing.assert_allclose(got[qi], want, rtol=1e-4, atol=1e-4)


def test_topk_and_relevance():
    idx = BM25Index("en")
    idx.build_from_texts(EN_DOCS)
    s, i = idx.topk(["lease rent"], 3)
    assert i[0, 0] == 1
    assert s[0, 0] > s[0, 1]


def test_incremental_rebuild_matches_full():
    full = BM25Index("en")
    full.build_from_texts(EN_DOCS)
    inc = BM25Index("en")
    inc.build_from_texts(EN_DOCS[:3])
    inc.add_texts(EN_DOCS[3:])
    q = ["security interest delivery"]
    np.testing.assert_allclose(inc.scores(q), full.scores(q), rtol=1e-5, atol=1e-6)


def test_save_load_roundtrip(tmp_path):
    idx = BM25Index("en")
    idx.build_from_texts(EN_DOCS)
    p = tmp_path / "bm25.npz"
    idx.save(p)
    loaded = BM25Index.load(p)
    q = ["buyer security interest"]
    np.testing.assert_allclose(loaded.scores(q), idx.scores(q), rtol=1e-6)
