"""Hash encoder: determinism, normalization, retrieval sanity, persistence."""

import numpy as np

from legalrag_tpu.models.hash_encoder import HashEncoder


def test_deterministic_and_normalized():
    e1 = HashEncoder(lang="en", dim=128, sketch_dim=2048)
    e2 = HashEncoder(lang="en", dim=128, sketch_dim=2048)
    texts = ["the seller must deliver the goods", "buyer in ordinary course"]
    a, b = e1.encode_passages(texts), e2.encode_passages(texts)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)


def test_similarity_sanity_en():
    enc = HashEncoder(lang="en", dim=256, sketch_dim=4096)
    docs = [
        "A buyer in ordinary course of business takes free of a security interest.",
        "The lessee must pay rent when the lease contract is signed.",
        "Negotiable instruments include checks and promissory notes.",
    ]
    enc.fit_idf(docs)
    d = enc.encode_passages(docs)
    q = enc.encode_queries(["when does a buyer take free of security interests"])
    sims = (q @ d.T)[0]
    assert np.argmax(sims) == 0


def test_similarity_sanity_zh():
    enc = HashEncoder(lang="zh", dim=256, sketch_dim=4096)
    docs = ["夫妻双方可以协议离婚，应当签订书面离婚协议。",
            "买卖合同是出卖人转移标的物所有权于买受人的合同。",
            "继承开始后，按照法定继承办理。"]
    enc.fit_idf(docs)
    d = enc.encode_passages(docs)
    q = enc.encode_queries(["离婚需要什么手续"])
    assert np.argmax((q @ d.T)[0]) == 0


def test_token_encoding_shapes():
    enc = HashEncoder(lang="en", dim=128, token_dim=64)
    emb, mask = enc.encode_tokens(["hello world", "one two three four"], maxlen=3)
    assert emb.shape == (2, 3, 64)
    assert mask.tolist() == [[True, True, False], [True, True, True]]
    np.testing.assert_allclose(np.linalg.norm(emb[mask], axis=-1), 1.0, atol=1e-5)


def test_state_roundtrip():
    enc = HashEncoder(lang="en", dim=64, sketch_dim=1024)
    enc.fit_idf(["alpha beta gamma", "beta gamma delta"])
    clone = HashEncoder.from_state(enc.state())
    texts = ["alpha delta"]
    np.testing.assert_array_equal(enc.encode_queries(texts),
                                  clone.encode_queries(texts))


def test_fnv1a_batch_matches_scalar():
    from legalrag_tpu.tokenize import fnv1a
    from legalrag_tpu.tokenize.tokenizers import fnv1a_batch

    feats = ["", "a", "hello", "世界", "买卖合同", "#tok#", "x" * 40]
    got = fnv1a_batch(feats, seed=7)
    for f, h in zip(feats, got):
        assert int(h) == fnv1a(f, seed=7), f
