"""Multi-chip serving parity (VERDICT r1 #3).

The sharded channels step (shard-local top-k + all_gather merge over the
model axis) must return EXACTLY the single-device candidate lists, so the
full host pipeline (fusion → min-score → graph → rerank → dedup) is
byte-identical on a sharded corpus. Replaces the reference's
docker-compose HTTP scale-out (``/root/reference/docker-compose.yml:1-23``).

Runs on the 8-virtual-CPU-device mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legalrag_tpu.config import AppConfig
from legalrag_tpu.index.bundle import IndexBundle
from legalrag_tpu.parallel.mesh import local_devices, make_mesh


def _cfg(root):
    cfg = AppConfig()
    cfg.llm.provider = "disabled"
    cfg.llm.api_key = None
    cfg.engine.capacity_round = 64
    cfg.engine.late_doc_maxlen = 32
    cfg.server.prewarm_buckets = 0  # suite speed
    for name in ("data_dir", "raw_dir", "processed_dir", "index_dir",
                 "graph_dir", "eval_dir", "upload_dir"):
        setattr(cfg.paths, name, root / name)
    cfg.paths.ensure_tree()
    return cfg


@pytest.fixture(scope="module")
def corpus(zh_chunks):
    return zh_chunks[:100]


@pytest.fixture(scope="module")
def bundles(corpus, tmp_path_factory):
    """One bundle, served unsharded and sharded over 4 devices."""
    root = tmp_path_factory.mktemp("shard")
    cfg = _cfg(root)
    bundle = IndexBundle.build_from_chunks(corpus, cfg.with_lang("zh"), "zh")
    sharded = IndexBundle.build_from_chunks(corpus, cfg.with_lang("zh"), "zh")
    mesh = make_mesh(local_devices("cpu")[:4], data=1, model=4)
    sharded.enable_sharding(mesh)
    return bundle, sharded, cfg


QUERIES = ["买卖合同的标的物风险", "抵押权的设立", "债务人不履行到期债务"]


def test_sharded_channel_lists_exact(bundles):
    """Library level: sharded_channels_topk == fused_channels_topk for every
    channel's (scores, ids)."""
    from legalrag_tpu.retrieval.hybrid import HybridRetriever

    bundle, sharded, cfg = bundles
    plain = HybridRetriever(bundle, cfg.with_lang("zh"))
    shard = HybridRetriever(sharded, cfg.with_lang("zh"))
    for q in QUERIES:
        a = plain._channels_topk_all(q, 32)
        b = shard._channels_topk_all(q, 32)
        assert set(a) == set(b) and "colbert" in a
        for name in ("dense", "bm25", "colbert"):
            np.testing.assert_array_equal(a[name][1], b[name][1],
                                          err_msg=f"{name} ids for {q!r}")
            np.testing.assert_allclose(a[name][0], b[name][0], atol=1e-5,
                                       err_msg=f"{name} scores for {q!r}")
        np.testing.assert_allclose(a["qvec"], b["qvec"], atol=1e-6)


def test_sharded_full_search_parity(bundles):
    """Full HybridRetriever.search (fusion+rerank+dedup) must produce the
    same hits, scores and breakdowns on the sharded bundle."""
    from legalrag_tpu.retrieval.hybrid import HybridRetriever

    bundle, sharded, cfg = bundles
    plain = HybridRetriever(bundle, cfg.with_lang("zh"))
    shard = HybridRetriever(sharded, cfg.with_lang("zh"))
    for q in QUERIES:
        h1 = plain.search(q, top_k=10)
        h2 = shard.search(q, top_k=10)
        assert [h.chunk.id for h in h1] == [h.chunk.id for h in h2]
        np.testing.assert_allclose([h.score for h in h1],
                                   [h.score for h in h2], atol=1e-6)
        assert [h.score_breakdown.get("channels") or
                [h.score_breakdown.get("channel")] for h in h1] == \
               [h.score_breakdown.get("channels") or
                [h.score_breakdown.get("channel")] for h in h2]


def test_sharded_views_refresh_on_ingest(bundles, corpus, zh_chunks):
    """Incremental adds must invalidate the sharded copies: a doc added
    after enable_sharding must be retrievable."""
    _, sharded, cfg = bundles
    extra = zh_chunks[100:110]
    n0 = sharded.n_docs
    sharded.add_chunks(extra)
    assert sharded.n_docs == n0 + len(extra)

    from legalrag_tpu.retrieval.hybrid import HybridRetriever

    shard = HybridRetriever(sharded, cfg.with_lang("zh"))
    # query with the exact text of an added article → must be row 1 dense hit
    q = extra[0].text[:40]
    out = shard._channels_topk_all(q, 16)
    rows = set(out["dense"][1][0].tolist())
    assert any(r >= n0 for r in rows)


def test_sharded_through_http_api(corpus, tmp_path_factory):
    """/rag/retrieve through the TestClient: a 4-shard server must return
    the same hits as a single-device server (VERDICT r1 #3 done-criterion)."""
    from legalrag_tpu.api.server import create_app
    from legalrag_tpu.api.webcore import TestClient

    responses = {}
    for shards in (1, 4):
        root = tmp_path_factory.mktemp(f"srv{shards}")
        cfg = _cfg(root)
        cfg.engine.n_index_shards = shards
        for lang in ("zh",):
            b = IndexBundle.build_from_chunks(corpus, cfg.with_lang(lang), lang)
            b.save(root / "index_dir" / lang)
        client = TestClient(create_app(cfg, build_async=False))
        r = client.post("/rag/retrieve",
                        json_body={"question": QUERIES[0], "top_k": 8})
        assert r.status == 200
        responses[shards] = r.json()

    h1 = responses[1]["hits"]
    h4 = responses[4]["hits"]
    assert [h["chunk"]["id"] for h in h1] == [h["chunk"]["id"] for h in h4]
    s1 = [h["score"] for h in h1]
    s4 = [h["score"] for h in h4]
    np.testing.assert_allclose(s1, s4, atol=1e-6)


def test_sharded_hybrid_step_with_late_channel():
    """The fused multi-chip throughput step now covers the MaxSim channel:
    results must match the single-device fused_hybrid_topk program."""
    from legalrag_tpu.ops.fused_query import FusedParams, fused_hybrid_topk
    from legalrag_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    from legalrag_tpu.parallel.sharded_search import make_sharded_hybrid_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    devs = local_devices("cpu")[:8]
    mesh = make_mesh(devs, data=2, model=4)
    n, d, v, b, l_doc, lq, dt = 128, 32, 64, 4, 8, 4, 16
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    impact_rows = np.abs(rng.standard_normal((n, v))).astype(np.float32)
    doc_tok = rng.standard_normal((n, l_doc, dt)).astype(np.float32)
    doc_mask = np.ones((n, l_doc), bool)
    qvec = rng.standard_normal((b, d)).astype(np.float32)
    qtf = np.zeros((b, v), np.float32)
    qtf[:, :5] = 1.0
    q_tok = rng.standard_normal((b, lq, dt)).astype(np.float32)
    q_mask = np.ones((b, lq), bool)
    valid_n = 120

    step = make_sharded_hybrid_step(mesh, k=8, eff_k=16, has_late=True)
    sh = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    s, i = step(sh(emb, P(MODEL_AXIS, None)),
                sh(impact_rows, P(MODEL_AXIS, None)),
                sh(doc_tok, P(MODEL_AXIS, None, None)),
                sh(doc_mask, P(MODEL_AXIS, None)),
                sh(qvec, P(DATA_AXIS, None)), sh(qtf, P(DATA_AXIS, None)),
                sh(q_tok, P(DATA_AXIS, None, None)),
                sh(q_mask, P(DATA_AXIS, None)), jnp.int32(valid_n))
    s, i = np.asarray(s), np.asarray(i)

    params = FusedParams(eff_k=16, final_k=8, rrf_k=60.0, alpha=0.5,
                         w_dense=0.6, w_bm25=0.4, w_late=0.35)
    ref = fused_hybrid_topk(jnp.asarray(emb), jnp.asarray(impact_rows.T),
                            jnp.asarray(doc_tok), jnp.asarray(doc_mask),
                            jnp.asarray(qvec), jnp.asarray(qtf),
                            jnp.asarray(q_tok), jnp.asarray(q_mask),
                            jnp.int32(valid_n), params)
    ref_i = np.asarray(ref["rows"])
    ref_s = np.asarray(ref["packed"])[..., 0]
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, ref_s, atol=1e-5)


@pytest.mark.parametrize("n_docs,shards,eff_k", [
    (37, 4, 16),    # n % shards != 0: capacity padding in play
    (5, 4, 32),     # near-single-doc shards, eff_k > n_docs
    (100, 8, 64),   # eff_k > n_local (100/8 ≈ 13 rows per shard)
    (101, 4, 8),    # odd size, small k
])
def test_sharded_geometry_matrix(zh_chunks, tmp_path_factory, n_docs,
                                 shards, eff_k):
    """Awkward shard geometry (VERDICT r2 #10): n_docs not divisible by the
    shard count, eff_k above the per-shard row count, near-empty shards —
    the padding logic in _gather_topk/shard_views must keep the sharded
    channel lists EXACTLY equal to the single-device ones."""
    from legalrag_tpu.retrieval.hybrid import HybridRetriever

    root = tmp_path_factory.mktemp(f"geo{n_docs}x{shards}")
    cfg = _cfg(root)
    cfg.engine.capacity_round = 8  # keep capacity close to n: real padding
    corpus = zh_chunks[:n_docs]
    bundle = IndexBundle.build_from_chunks(corpus, cfg.with_lang("zh"), "zh")
    sharded = IndexBundle.build_from_chunks(corpus, cfg.with_lang("zh"), "zh")
    mesh = make_mesh(local_devices("cpu")[:shards], data=1, model=shards)
    sharded.enable_sharding(mesh)

    plain = HybridRetriever(bundle, cfg.with_lang("zh"))
    shard = HybridRetriever(sharded, cfg.with_lang("zh"))
    for q in QUERIES[:2]:
        a = plain._channels_topk_all(q, eff_k)
        b = shard._channels_topk_all(q, eff_k)
        assert set(a) == set(b)
        for name in ("dense", "bm25", "colbert"):
            if name not in a:
                continue
            # compare only the REAL rows (scores above the NEG_INF mask);
            # both paths return identical validity patterns
            sa, ia = np.asarray(a[name][0]), np.asarray(a[name][1])
            sb, ib = np.asarray(b[name][0]), np.asarray(b[name][1])
            real = sa > -1e29
            np.testing.assert_array_equal(real, sb > -1e29,
                                          err_msg=f"{name} validity for {q!r}")
            np.testing.assert_array_equal(ia[real], ib[real],
                                          err_msg=f"{name} ids for {q!r}")
            np.testing.assert_allclose(sa[real], sb[real], atol=1e-5,
                                       err_msg=f"{name} scores for {q!r}")
        # every returned id must be a real corpus row
        assert (np.asarray(b["dense"][1]) < bundle.dense.capacity).all()


def test_sharded_bert_is_one_execution_and_exact(en_chunks,
                                                 tmp_path_factory):
    """VERDICT r2 #4: sharded + bert serving must run encoder + channels in
    ONE program (no separate encode_query_bundle execution) and match the
    unsharded bert engine exactly."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel, BertTokenizerFast

    ckpt = tmp_path_factory.mktemp("tiny_bert_sh")
    torch.manual_seed(0)
    BertModel(BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         max_position_embeddings=64)).save_pretrained(ckpt)
    vocab = ckpt / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "seller",
         "buyer", "goods", "security", "interest", "of", "a", "delivery"]))
    BertTokenizerFast(vocab_file=str(vocab)).save_pretrained(ckpt)

    from legalrag_tpu.models.bert import FlaxBertEncoder
    from legalrag_tpu.retrieval.hybrid import HybridRetriever

    def make(enc_seed_dir):
        cfg = AppConfig()
        cfg.llm.provider = "disabled"
        cfg.engine.capacity_round = 64
        cfg.engine.late_doc_maxlen = 32
        cfg.engine.late_dim = 16
        cfg.engine.max_query_tokens = 24
        enc = FlaxBertEncoder.from_pretrained(
            str(ckpt), instruction="Represent this question: ",
            max_length=48, token_dim=16)
        bundle = IndexBundle.build_from_chunks(en_chunks[:80], cfg, "en",
                                               encoder=enc)
        return bundle, cfg

    bundle, cfg = make("a")
    sharded, _ = make("b")
    mesh = make_mesh(local_devices("cpu")[:4], data=1, model=4)
    sharded.enable_sharding(mesh)

    plain = HybridRetriever(bundle, cfg)
    shard = HybridRetriever(sharded, cfg)

    # the fused sharded program must NOT fall back to a separate encoder
    # execution — poison the two-step entry points
    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("sharded+bert took the two-execution path")

    shard.bundle.encoder.encode_query_bundle = boom
    shard.bundle.encoder.encode_queries = boom

    q = "security interest attaches when value is given"
    a = plain._channels_topk_all(q, 16)
    b = shard._channels_topk_all(q, 16)
    assert b is not None and set(a) == set(b)
    for name in ("dense", "bm25", "colbert"):
        np.testing.assert_array_equal(a[name][1], b[name][1],
                                      err_msg=f"{name} ids")
        np.testing.assert_allclose(a[name][0], b[name][0], atol=1e-4,
                                   err_msg=f"{name} scores")
    np.testing.assert_allclose(a["qvec"], b["qvec"], atol=1e-5)

    # and the full search pipeline agrees end-to-end
    h1 = plain.search(q, top_k=8)
    h2 = shard.search(q, top_k=8)
    assert [h.chunk.id for h in h1] == [h.chunk.id for h in h2]
    np.testing.assert_allclose([h.score for h in h1],
                               [h.score for h in h2], atol=1e-5)


def test_sharded_nbit4_store(corpus, tmp_path_factory):
    """A compressed (nbit4) token store must shard via per-slice host
    reconstruction (regression: shard_views dequantized the WHOLE store
    on the default device first) and agree with the unsharded engine's
    in-kernel dequant scoring."""
    root = tmp_path_factory.mktemp("shard4")
    cfg = _cfg(root)
    cfg.engine.token_dtype = "nbit4"
    from legalrag_tpu.retrieval.hybrid import HybridRetriever

    bundle = IndexBundle.build_from_chunks(corpus, cfg.with_lang("zh"), "zh")
    sharded = IndexBundle.build_from_chunks(corpus, cfg.with_lang("zh"), "zh")
    mesh = make_mesh(local_devices("cpu")[:4], data=1, model=4)
    sharded.enable_sharding(mesh)
    views = sharded.shard_views()
    assert views["tok"].shape[0] % 4 == 0

    plain = HybridRetriever(bundle, cfg.with_lang("zh"))
    shard = HybridRetriever(sharded, cfg.with_lang("zh"))
    for q in QUERIES:
        a = plain._channels_topk_all(q, 16)
        b = shard._channels_topk_all(q, 16)
        # reconstruction math is identical; the sharded copy stores the
        # engine dtype (bf16) so scores match to bf16 resolution and the
        # top lists agree as sets (ties may reorder)
        ids_a = np.asarray(a["colbert"][1]).ravel().tolist()
        ids_b = np.asarray(b["colbert"][1]).ravel().tolist()
        assert len(set(ids_a) & set(ids_b)) >= 15
        np.testing.assert_allclose(
            np.sort(np.asarray(a["colbert"][0]).ravel()),
            np.sort(np.asarray(b["colbert"][0]).ravel()),
            atol=2e-2, err_msg=f"colbert scores for {q!r}")
        np.testing.assert_array_equal(a["dense"][1], b["dense"][1])
