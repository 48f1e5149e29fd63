"""Golden checkpoint-parity harness (SURVEY.md §7.4.1, VERDICT r1 #2).

torch + transformers are installed in this image, so the FULL weight-loading
path is exercised with tiny randomly-initialized HF checkpoints saved to
safetensors: HF-name mapping, CLS pooling + L2 norm + query instruction
(reference semantics at ``/root/reference/legalrag/retrieval/vector_store.py:131-155``),
the cross-encoder head (``rerankers.py:100-116`` in the reference), per-token
encoding, and the decoder's RoPE/GQA/SwiGLU stack (Qwen2 family). With real
BGE/Qwen weights later, parity becomes plug-and-measure.

Also covers ADVICE r1: bf16 checkpoints must load and generate (KV-cache
dtype), generation must stop at cache capacity, and explicit ``head_dim``
configs must be honored.
"""

import json
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

ATOL = 2e-4


def _tiny_vocab_tokenizer(tmp_path: Path):
    """A real BertTokenizerFast over a tiny wordpiece vocab."""
    from transformers import BertTokenizerFast

    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "contract", "buyer", "seller", "goods", "law",
             "article", "shall", "of", "a", "delivery", "payment",
             "为", "这", "个", "法", "律", "问", "题", "生", "成", "表", "示",
             "：", "what", "is", "risk", "loss", "under", "ucc"]
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(words), encoding="utf-8")
    return BertTokenizerFast(vocab_file=str(vocab), do_lower_case=True)


def _tiny_bert_cfg():
    from transformers import BertConfig

    return BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=48, type_vocab_size=2)


@pytest.fixture(scope="module")
def bert_ckpt(tmp_path_factory):
    """Tiny random-init HF BertModel saved to safetensors + tokenizer."""
    tmp = tmp_path_factory.mktemp("bert_ckpt")
    from transformers import BertModel

    torch.manual_seed(0)
    model = BertModel(_tiny_bert_cfg()).eval()
    model.save_pretrained(tmp)                 # model.safetensors (f32)
    _tiny_vocab_tokenizer(tmp).save_pretrained(tmp)
    return tmp, model


TEXTS = ["what is risk of loss under the ucc",
         "the seller shall tender delivery of goods",
         "payment of a contract"]


def test_biencoder_parity_cls_l2_instruction(bert_ckpt):
    """encode_queries (instruction-prefixed) and encode_passages must match
    torch CLS-pool + L2-norm to 1e-4."""
    tmp, model = bert_ckpt
    from legalrag_tpu.models.bert import FlaxBertEncoder

    instr = "为这个法律问题生成表示："
    enc = FlaxBertEncoder.from_pretrained(str(tmp), instruction=instr,
                                          max_length=32)

    def torch_encode(texts):
        batch = enc.tokenizer(texts, padding="max_length", truncation=True,
                              max_length=32, return_tensors="pt")
        with torch.no_grad():
            h = model(input_ids=batch["input_ids"],
                      attention_mask=batch["attention_mask"],
                      token_type_ids=batch.get("token_type_ids"),
                      ).last_hidden_state[:, 0]
        h = torch.nn.functional.normalize(h, dim=-1)
        return h.numpy()

    got_p = enc.encode_passages(TEXTS)
    np.testing.assert_allclose(got_p, torch_encode(TEXTS), atol=ATOL)

    got_q = enc.encode_queries(TEXTS)
    np.testing.assert_allclose(got_q, torch_encode([instr + t for t in TEXTS]),
                               atol=ATOL)
    # instruction must actually change the embedding (queries != passages)
    assert not np.allclose(got_q, got_p, atol=1e-3)


def test_token_encoder_parity(bert_ckpt):
    """encode_tokens = per-token final hidden states (sliced to token_dim),
    L2-normalized — matches torch last_hidden_state."""
    tmp, model = bert_ckpt
    from legalrag_tpu.models.bert import FlaxBertEncoder

    enc = FlaxBertEncoder.from_pretrained(str(tmp), max_length=32,
                                          token_dim=16)
    got, mask = enc.encode_tokens(TEXTS, maxlen=16)
    batch = enc.tokenizer(TEXTS, padding="max_length", truncation=True,
                          max_length=16, return_tensors="pt")
    with torch.no_grad():
        h = model(input_ids=batch["input_ids"],
                  attention_mask=batch["attention_mask"]).last_hidden_state
    h = h[..., :16]
    h = torch.nn.functional.normalize(h, dim=-1).numpy()
    np.testing.assert_allclose(got, h, atol=ATOL)
    assert mask.shape == got.shape[:2] and mask.dtype == bool


def test_cross_encoder_parity(tmp_path):
    """FlaxBertCrossEncoder.score_pairs must match torch
    BertForSequenceClassification logits (num_labels=1, CLS head)."""
    from transformers import BertForSequenceClassification

    cfg = _tiny_bert_cfg()
    cfg.num_labels = 1
    torch.manual_seed(1)
    model = BertForSequenceClassification(cfg).eval()
    model.save_pretrained(tmp_path)
    _tiny_vocab_tokenizer(tmp_path).save_pretrained(tmp_path)

    from legalrag_tpu.models.bert import FlaxBertCrossEncoder

    ce = FlaxBertCrossEncoder.from_pretrained(str(tmp_path))
    pairs = [(TEXTS[0], TEXTS[1]), (TEXTS[0], TEXTS[2])]
    got = np.asarray(ce.score_pairs(pairs, max_length=32))

    batch = ce.tokenizer([a for a, _ in pairs], [b for _, b in pairs],
                         padding="max_length", truncation=True,
                         max_length=32, return_tensors="pt")
    with torch.no_grad():
        want = model(**batch).logits.squeeze(-1).numpy()
    # bert.pooler sits between CLS and classifier in HF's SequenceClassifier
    # head is exactly what FlaxBertCrossEncoder must replicate.
    np.testing.assert_allclose(got, want, atol=ATOL)


# ---------------------------------------------------------------------------
# decoder (Qwen2 family)

def _tiny_qwen2_cfg(**over):
    from transformers import Qwen2Config

    kw = dict(vocab_size=96, hidden_size=32, num_hidden_layers=2,
              num_attention_heads=4, num_key_value_heads=2,
              intermediate_size=64, max_position_embeddings=64,
              rope_theta=10000.0, tie_word_embeddings=False,
              attention_dropout=0.0)
    kw.update(over)
    return Qwen2Config(**kw)


@pytest.fixture(scope="module")
def qwen_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("qwen_ckpt")
    from transformers import Qwen2ForCausalLM

    torch.manual_seed(2)
    model = Qwen2ForCausalLM(_tiny_qwen2_cfg()).eval()
    model.save_pretrained(tmp)
    return tmp, model


def test_decoder_forward_parity_vs_torch(qwen_ckpt):
    """Full-sequence logits from our functional forward must match HF
    Qwen2ForCausalLM on the same random-init checkpoint (GQA 4/2, RoPE,
    SwiGLU, untied head)."""
    tmp, model = qwen_ckpt
    import jax.numpy as jnp

    from legalrag_tpu.models.decoder import decoder_forward, load_hf_decoder_params

    params, cfg = load_hf_decoder_params(tmp)
    assert cfg.head_dim == 8

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 96, size=(2, 12))
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.float().numpy()

    positions = jnp.broadcast_to(jnp.arange(12)[None, :], (2, 12))
    got, _ = decoder_forward(params, cfg, jnp.asarray(ids, jnp.int32),
                             positions)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def test_decoder_tied_embeddings(tmp_path):
    from transformers import Qwen2ForCausalLM

    torch.manual_seed(3)
    model = Qwen2ForCausalLM(_tiny_qwen2_cfg(tie_word_embeddings=True)).eval()
    model.save_pretrained(tmp_path)

    import jax.numpy as jnp

    from legalrag_tpu.models.decoder import decoder_forward, load_hf_decoder_params

    params, cfg = load_hf_decoder_params(tmp_path)
    ids = np.arange(6)[None, :] % 96
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.float().numpy()
    got, _ = decoder_forward(params, cfg, jnp.asarray(ids, jnp.int32),
                             jnp.arange(6)[None, :])
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def test_bf16_checkpoint_loads_and_generates(tmp_path):
    """ADVICE r1 (high): released Qwen2/Llama checkpoints are bf16; the KV
    cache must adopt the checkpoint dtype so decode steps don't TypeError."""
    from transformers import Qwen2ForCausalLM

    torch.manual_seed(4)
    model = Qwen2ForCausalLM(_tiny_qwen2_cfg()).to(torch.bfloat16)
    model.save_pretrained(tmp_path)

    import jax.numpy as jnp

    from legalrag_tpu.models.decoder import JaxDecoderLM, load_hf_decoder_params

    params, cfg = load_hf_decoder_params(tmp_path)
    assert params["embed"].dtype == jnp.bfloat16
    lm = JaxDecoderLM(params, cfg, max_len=32)
    toks = list(lm.generate_stream([1, 2, 3, 4], max_new_tokens=8))
    assert len(toks) == 8 and all(0 <= t < 96 for t in toks)


def test_generation_stops_at_cache_capacity(qwen_ckpt):
    """ADVICE r1 (medium): prompt_len + generated must never exceed max_len —
    the cache is absolute-position, not a ring."""
    tmp, _ = qwen_ckpt
    from legalrag_tpu.models.decoder import JaxDecoderLM, load_hf_decoder_params

    params, cfg = load_hf_decoder_params(tmp)
    lm = JaxDecoderLM(params, cfg, max_len=16)
    toks = list(lm.generate_stream(list(range(1, 13)), max_new_tokens=100))
    assert len(toks) == 4  # 16 - 12

    with pytest.raises(ValueError):
        list(lm.generate_stream(list(range(1, 20)), max_new_tokens=4))


def test_explicit_head_dim_honored(tmp_path):
    """ADVICE r1 (low): configs carrying head_dim != hidden/heads must load
    with the explicit value and pass the shape assertion."""
    from legalrag_tpu.models.decoder import DecoderConfig

    cfg = DecoderConfig(hidden_size=32, num_attention_heads=4, head_dim=16)
    assert cfg.head_dim == 16
    cfg2 = DecoderConfig(hidden_size=32, num_attention_heads=4)
    assert cfg2.head_dim == 8

    # and a checkpoint whose weights contradict the config must refuse
    from transformers import Qwen2ForCausalLM

    torch.manual_seed(5)
    model = Qwen2ForCausalLM(_tiny_qwen2_cfg())
    model.save_pretrained(tmp_path)
    raw = json.loads((tmp_path / "config.json").read_text())
    raw["head_dim"] = 16  # lie: weights were built with head_dim 8
    (tmp_path / "config.json").write_text(json.dumps(raw))

    from legalrag_tpu.models.decoder import load_hf_decoder_params

    with pytest.raises(ValueError, match="head_dim"):
        load_hf_decoder_params(tmp_path)


def test_chunked_decode_matches_per_token(qwen_ckpt):
    """decode_chunk>1 runs a lax.scan of sample+decode steps per device
    execution (one round trip per chunk instead of per token); the emitted
    token sequence must be identical to the per-token loop for greedy AND
    sampled decoding (same key-split sequence)."""
    tmp, _ = qwen_ckpt
    from legalrag_tpu.models.decoder import JaxDecoderLM, load_hf_decoder_params

    params, cfg = load_hf_decoder_params(tmp)
    prompt = [1, 5, 9, 2]
    per_tok = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=1)
    chunked = JaxDecoderLM(params, cfg, max_len=64, decode_chunk=8)
    # 19 = 2 full chunks + a 3-token per-token tail
    for kw in (dict(temperature=0.0),
               dict(temperature=0.8, top_p=0.9, seed=7)):
        a = list(per_tok.generate_stream(prompt, max_new_tokens=19, **kw))
        b = list(chunked.generate_stream(prompt, max_new_tokens=19, **kw))
        assert a == b and len(a) == 19


# --------------------------------------------------------------- XLM-Roberta
# The reference's production cross-encoder (BAAI/bge-reranker-v2-m3,
# reference rerankers.py:100-116) and bge-m3 are XLMRoberta models: roberta.
# weight prefix, offset position ids starting at pad_token_id+1, size-1
# segment table. Parity against torch at the ids level (no sentencepiece
# tokenizer needed for the math).

def test_xlmroberta_encoder_parity(tmp_path_factory):
    from transformers import XLMRobertaConfig, XLMRobertaModel

    tmp = tmp_path_factory.mktemp("xlmr_ckpt")
    cfg = XLMRobertaConfig(vocab_size=64, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64, max_position_embeddings=50,
                           pad_token_id=1)
    torch.manual_seed(1)
    model = XLMRobertaModel(cfg).eval()
    model.save_pretrained(tmp)

    import jax.numpy as jnp

    from legalrag_tpu.models.bert import bert_forward, load_hf_bert_params

    params, jcfg = load_hf_bert_params(tmp)
    assert jcfg.roberta_positions and jcfg.pad_token_id == 1
    assert jcfg.usable_positions == 50 - 2  # pos ids run pad+1..pad+L

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 64, (3, 16))
    ids[0, 10:] = 1                     # padded row exercises offset ids
    mask = (ids != 1).astype(np.int64)
    got = np.asarray(bert_forward(params, jcfg,
                                  jnp.asarray(ids, jnp.int32),
                                  jnp.asarray(mask, jnp.float32)))
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)
                     ).last_hidden_state.numpy()
    np.testing.assert_allclose(got, want, atol=5e-4)  # f32 accum noise


def test_xlmroberta_cross_encoder_parity(tmp_path):
    """FlaxBertCrossEncoder on an XLMRoberta classification checkpoint
    (the bge-reranker-v2-m3 architecture) must match torch logits."""
    from transformers import (XLMRobertaConfig,
                              XLMRobertaForSequenceClassification)

    cfg = XLMRobertaConfig(vocab_size=64, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64, max_position_embeddings=50,
                           pad_token_id=1, num_labels=1,
                           type_vocab_size=1)  # real XLM-R has no segments
    torch.manual_seed(2)
    model = XLMRobertaForSequenceClassification(cfg).eval()
    model.save_pretrained(tmp_path)
    # any tokenizer works for the parity check — both sides consume the
    # same ids; a wordpiece tokenizer avoids needing a sentencepiece model
    _tiny_vocab_tokenizer(tmp_path).save_pretrained(tmp_path)

    from legalrag_tpu.models.bert import FlaxBertCrossEncoder

    ce = FlaxBertCrossEncoder.from_pretrained(str(tmp_path))
    pairs = [("what is risk of loss", "the seller shall tender delivery"),
             ("payment of a contract", "goods under the law")]
    got = ce.score_pairs(pairs, max_length=32)

    batch = ce.tokenizer([a for a, _ in pairs], [b for _, b in pairs],
                         padding="max_length", truncation=True,
                         max_length=32, return_tensors="pt")
    with torch.no_grad():
        want = model(input_ids=batch["input_ids"],
                     attention_mask=batch["attention_mask"]
                     ).logits.squeeze(-1).numpy()
    np.testing.assert_allclose(got, want, atol=5e-4)  # f32 accum noise


def test_qwen3_qk_norm_decoder_parity(tmp_path):
    """Qwen3-class checkpoints carry per-head q/k RMS norms (applied before
    RoPE) and an explicit head_dim; the loader used to refuse them — now
    logits must match HF Qwen3ForCausalLM."""
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg_t = Qwen3Config(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        head_dim=16, intermediate_size=64,
                        max_position_embeddings=64, rope_theta=10000.0,
                        tie_word_embeddings=False, attention_dropout=0.0)
    torch.manual_seed(7)
    model = Qwen3ForCausalLM(cfg_t).eval()
    model.save_pretrained(tmp_path)

    import jax.numpy as jnp

    from legalrag_tpu.models.decoder import (decoder_forward,
                                             load_hf_decoder_params)

    params, cfg = load_hf_decoder_params(tmp_path)
    assert cfg.head_dim == 16
    assert "q_norm" in params["layers"][0]

    rng = np.random.default_rng(3)
    ids = rng.integers(0, 96, size=(2, 12))
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.float().numpy()
    positions = jnp.broadcast_to(jnp.arange(12)[None, :], (2, 12))
    got, _ = decoder_forward(params, cfg, jnp.asarray(ids, jnp.int32),
                             positions)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def test_llama3_rope_scaling_parity(tmp_path):
    """Llama-3.1+ checkpoints carry rope_scaling (frequency-banded llama3
    rule) — previously ignored, silently corrupting positions. Logits must
    match HF LlamaForCausalLM with scaling active, at positions where the
    scaled and unscaled frequencies genuinely differ."""
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg_t = LlamaConfig(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=64, max_position_embeddings=128,
                        rope_theta=10000.0, tie_word_embeddings=False,
                        attention_dropout=0.0,
                        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                                      "low_freq_factor": 1.0,
                                      "high_freq_factor": 4.0,
                                      "original_max_position_embeddings": 16})
    torch.manual_seed(11)
    model = LlamaForCausalLM(cfg_t).eval()
    model.save_pretrained(tmp_path)

    import jax.numpy as jnp

    from legalrag_tpu.models.decoder import (decoder_forward,
                                             load_hf_decoder_params,
                                             rope_inv_freq)

    params, cfg = load_hf_decoder_params(tmp_path)
    assert cfg.rope_scaling and cfg.rope_scaling["rope_type"] == "llama3"
    # scaling must actually change the frequencies
    from legalrag_tpu.models.decoder import DecoderConfig

    plain = DecoderConfig(rope_theta=cfg.rope_theta,
                          hidden_size=cfg.hidden_size,
                          num_attention_heads=cfg.num_attention_heads)
    assert not np.allclose(np.asarray(rope_inv_freq(cfg, cfg.head_dim)[0]),
                           np.asarray(rope_inv_freq(plain, cfg.head_dim)[0]))

    rng = np.random.default_rng(5)
    ids = rng.integers(0, 96, size=(2, 48))   # past original_max=16
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.float().numpy()
    positions = jnp.broadcast_to(jnp.arange(48)[None, :], (2, 48))
    got, _ = decoder_forward(params, cfg, jnp.asarray(ids, jnp.int32),
                             positions)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def test_unknown_rope_scaling_refused():
    from legalrag_tpu.models.decoder import DecoderConfig

    with pytest.raises(ValueError, match="rope_scaling"):
        DecoderConfig(rope_scaling={"rope_type": "longrope", "factor": 4.0})
    with pytest.raises(ValueError, match="rope_scaling"):
        DecoderConfig(rope_scaling={"rope_type": "dynamic", "factor": 4.0})


def test_qwen3_yarn_rope_parity(tmp_path):
    """Qwen3 long-context checkpoints ship YaRN rope_scaling (NTK-by-parts
    frequencies + attention factor on cos/sin) — previously refused at
    load; logits must match HF with scaling active past the original
    context window."""
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg_t = Qwen3Config(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        head_dim=16, intermediate_size=64,
                        max_position_embeddings=256, rope_theta=10000.0,
                        tie_word_embeddings=False, attention_dropout=0.0,
                        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                                      "original_max_position_embeddings": 32})
    torch.manual_seed(19)
    model = Qwen3ForCausalLM(cfg_t).eval()
    model.save_pretrained(tmp_path)

    import jax.numpy as jnp

    from legalrag_tpu.models.decoder import (DecoderConfig, decoder_forward,
                                             load_hf_decoder_params,
                                             rope_inv_freq)

    params, cfg = load_hf_decoder_params(tmp_path)
    inv, scale = rope_inv_freq(cfg, cfg.head_dim)
    plain = DecoderConfig(rope_theta=cfg.rope_theta,
                          hidden_size=cfg.hidden_size,
                          num_attention_heads=cfg.num_attention_heads,
                          head_dim=cfg.head_dim)
    inv0, scale0 = rope_inv_freq(plain, cfg.head_dim)
    assert scale > 1.0 and scale0 == 1.0        # yarn attention factor
    assert not np.allclose(np.asarray(inv), np.asarray(inv0))

    rng = np.random.default_rng(23)
    ids = rng.integers(0, 96, size=(2, 64))      # past original_max=32
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.float().numpy()
    positions = jnp.broadcast_to(jnp.arange(64)[None, :], (2, 64))
    got, _ = decoder_forward(params, cfg, jnp.asarray(ids, jnp.int32),
                             positions)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def test_gemma3_decoder_parity(tmp_path):
    """Gemma-3 architecture: gemma2's sandwich norms/GeGLU/scaled
    embeddings PLUS (1+w) q/k head norms and a per-layer RoPE split —
    sliding layers rotate at the unscaled local base, full layers at the
    scaled global base. Logits must match HF Gemma3ForCausalLM with the
    window and both rope bases genuinely active."""
    from transformers import Gemma3TextConfig
    from transformers import Gemma3ForCausalLM

    cfg_t = Gemma3TextConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, max_position_embeddings=128,
        rope_theta=1000000.0, rope_local_base_freq=10000.0,
        query_pre_attn_scalar=16, sliding_window=5,
        sliding_window_pattern=2,   # layers 0,2 sliding / 1,3 full
        rope_scaling={"rope_type": "linear", "factor": 8.0},
        attention_dropout=0.0, tie_word_embeddings=False)
    torch.manual_seed(29)
    model = Gemma3ForCausalLM(cfg_t).eval()
    model.save_pretrained(tmp_path)

    import jax.numpy as jnp

    from legalrag_tpu.models.decoder import (decoder_forward,
                                             load_hf_decoder_params)

    params, cfg = load_hf_decoder_params(tmp_path)
    assert cfg.gemma3 and "q_norm" in params["layers"][0]
    assert cfg.layer_types[:4] == ["sliding_attention", "full_attention",
                                   "sliding_attention", "full_attention"]

    rng = np.random.default_rng(31)
    ids = rng.integers(0, 96, size=(2, 16))      # seq 16 > window 5
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.float().numpy()
    positions = jnp.broadcast_to(jnp.arange(16)[None, :], (2, 16))
    got, _ = decoder_forward(params, cfg, jnp.asarray(ids, jnp.int32),
                             positions)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=2e-3)


def test_mistral_decoder_parity(tmp_path):
    """Mistral: Llama-style weights with EVERY layer attending in the
    sliding band (v0.1-class configs). Logits must match HF with the
    window genuinely active (seq > window)."""
    from transformers import MistralConfig, MistralForCausalLM

    cfg_t = MistralConfig(vocab_size=96, hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=2, head_dim=8,
                          intermediate_size=64, max_position_embeddings=64,
                          rope_theta=10000.0, sliding_window=5,
                          attention_dropout=0.0, tie_word_embeddings=False)
    torch.manual_seed(35)
    model = MistralForCausalLM(cfg_t).eval()
    model.save_pretrained(tmp_path)

    import jax.numpy as jnp

    from legalrag_tpu.models.decoder import (decoder_forward,
                                             load_hf_decoder_params)

    params, cfg = load_hf_decoder_params(tmp_path)
    assert cfg.layer_types == ["sliding_attention"] * 2

    rng = np.random.default_rng(37)
    ids = rng.integers(0, 96, size=(2, 16))      # seq 16 > window 5
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.float().numpy()
    positions = jnp.broadcast_to(jnp.arange(16)[None, :], (2, 16))
    got, _ = decoder_forward(params, cfg, jnp.asarray(ids, jnp.int32),
                             positions)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def test_gemma2_decoder_parity(tmp_path):
    """Gemma-2 architecture: (1+w) RMSNorm, sqrt(H)-scaled embeddings,
    GeGLU, sandwich norms, attn/final logit softcaps, query_pre_attn_scalar
    scale, alternating sliding-window layers (window < seq here so the
    banding genuinely bites)."""
    from transformers import Gemma2Config, Gemma2ForCausalLM

    cfg_t = Gemma2Config(vocab_size=96, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=8, intermediate_size=64,
                         max_position_embeddings=64, rope_theta=10000.0,
                         query_pre_attn_scalar=16, sliding_window=5,
                         attn_logit_softcapping=50.0,
                         final_logit_softcapping=30.0,
                         attention_dropout=0.0)
    torch.manual_seed(13)
    model = Gemma2ForCausalLM(cfg_t).eval()
    model.save_pretrained(tmp_path)

    import jax.numpy as jnp

    from legalrag_tpu.models.decoder import (decoder_forward,
                                             load_hf_decoder_params)

    params, cfg = load_hf_decoder_params(tmp_path)
    assert cfg.gemma and cfg.layer_types[0] == "sliding_attention"
    assert "pre_ff_norm" in params["layers"][0]

    rng = np.random.default_rng(9)
    ids = rng.integers(0, 96, size=(2, 16))   # seq 16 > window 5
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.float().numpy()
    positions = jnp.broadcast_to(jnp.arange(16)[None, :], (2, 16))
    got, _ = decoder_forward(params, cfg, jnp.asarray(ids, jnp.int32),
                             positions)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=2e-3)


def test_mixtral_moe_decoder_parity(tmp_path):
    """Mixtral-style mixture-of-experts: per-layer top-2 routing over 4
    experts (softmax over ALL logits, top-k, renormalize), SwiGLU experts.
    Our dense-expert einsum formulation must match HF's gather/scatter
    dispatch bit-for-bit up to float tolerance."""
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg_t = MixtralConfig(vocab_size=96, hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          num_key_value_heads=2, intermediate_size=48,
                          max_position_embeddings=64, rope_theta=10000.0,
                          num_local_experts=4, num_experts_per_tok=2,
                          sliding_window=None, attention_dropout=0.0,
                          router_jitter_noise=0.0, tie_word_embeddings=False)
    torch.manual_seed(41)
    model = MixtralForCausalLM(cfg_t).eval()
    model.save_pretrained(tmp_path)

    import jax.numpy as jnp

    from legalrag_tpu.models.decoder import (decoder_forward,
                                             load_hf_decoder_params)

    params, cfg = load_hf_decoder_params(tmp_path)
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    assert cfg.norm_topk_prob  # Mixtral always renormalizes
    assert params["layers"][0]["moe"]["gate"].shape == (4, 32, 48)

    rng = np.random.default_rng(43)
    ids = rng.integers(0, 96, size=(2, 12))
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.float().numpy()
    positions = jnp.broadcast_to(jnp.arange(12)[None, :], (2, 12))
    got, _ = decoder_forward(params, cfg, jnp.asarray(ids, jnp.int32),
                             positions)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def test_qwen2_moe_decoder_parity(tmp_path):
    """Qwen2-MoE: routed experts WITHOUT top-k renormalization
    (norm_topk_prob=False), plus a sigmoid-gated shared expert on every
    sparse layer, with `decoder_sparse_step`/`mlp_only_layers` leaving
    some layers dense — the mixed dense/sparse loader path."""
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    cfg_t = Qwen2MoeConfig(vocab_size=96, hidden_size=32,
                           num_hidden_layers=3, num_attention_heads=4,
                           num_key_value_heads=2, intermediate_size=64,
                           moe_intermediate_size=24,
                           shared_expert_intermediate_size=40,
                           max_position_embeddings=64, rope_theta=10000.0,
                           num_experts=4, num_experts_per_tok=2,
                           norm_topk_prob=False, decoder_sparse_step=1,
                           mlp_only_layers=[1], attention_dropout=0.0,
                           tie_word_embeddings=False)
    torch.manual_seed(47)
    model = Qwen2MoeForCausalLM(cfg_t).eval()
    model.save_pretrained(tmp_path)

    import jax.numpy as jnp

    from legalrag_tpu.models.decoder import (decoder_forward,
                                             load_hf_decoder_params)

    params, cfg = load_hf_decoder_params(tmp_path)
    assert not cfg.norm_topk_prob
    assert "moe" in params["layers"][0] and "moe" not in params["layers"][1]
    assert "shared_gate" in params["layers"][0]["moe"]
    assert params["layers"][0]["moe"]["down"].shape == (4, 24, 32)

    rng = np.random.default_rng(53)
    ids = rng.integers(0, 96, size=(2, 12))
    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.float().numpy()
    positions = jnp.broadcast_to(jnp.arange(12)[None, :], (2, 12))
    got, _ = decoder_forward(params, cfg, jnp.asarray(ids, jnp.int32),
                             positions)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def test_gemma_layer_types_fallbacks():
    """Real gemma hub configs may predate the layer_types key — gemma2's
    alternating and gemma3's every-Nth-full patterns must be
    reconstructed (HF does the same in the config __init__s)."""
    from legalrag_tpu.models.decoder import DecoderConfig

    cfg = DecoderConfig(model_type="gemma2", num_hidden_layers=4,
                        sliding_window=4096, query_pre_attn_scalar=256)
    assert cfg.layer_types == ["sliding_attention", "full_attention",
                               "sliding_attention", "full_attention"]

    cfg3 = DecoderConfig(model_type="gemma3_text", num_hidden_layers=6,
                         sliding_window=512, sliding_window_pattern=3)
    assert cfg3.layer_types == ["sliding_attention", "sliding_attention",
                                "full_attention"] * 2
    assert cfg3.gemma3 and cfg3.rope_local_base_freq == 10000.0


@pytest.mark.parametrize("family", ["qwen3", "gemma2", "gemma3",
                                    "qwen3-yarn", "mistral", "mixtral"])
def test_new_family_kv_cache_matches_full(tmp_path, family):
    """The KV-cache decode path must reproduce the full-sequence forward
    for the round-2 families — Qwen3 (q/k-norm applied inside the cached
    step) and Gemma-2 (sliding-window banding built from absolute cache
    positions)."""
    import jax.numpy as jnp

    if family == "qwen3":
        from transformers import Qwen3Config, Qwen3ForCausalLM

        cfg_t = Qwen3Config(vocab_size=96, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=4,
                            num_key_value_heads=2, head_dim=16,
                            intermediate_size=64,
                            max_position_embeddings=64,
                            rope_theta=10000.0, attention_dropout=0.0)
        torch.manual_seed(21)
        Qwen3ForCausalLM(cfg_t).save_pretrained(tmp_path)
    elif family == "qwen3-yarn":
        from transformers import Qwen3Config, Qwen3ForCausalLM

        cfg_t = Qwen3Config(vocab_size=96, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=4,
                            num_key_value_heads=2, head_dim=16,
                            intermediate_size=64,
                            max_position_embeddings=256,
                            rope_theta=10000.0, attention_dropout=0.0,
                            rope_scaling={"rope_type": "yarn",
                                          "factor": 4.0,
                                          "original_max_position_embeddings":
                                              8})
        torch.manual_seed(27)
        Qwen3ForCausalLM(cfg_t).save_pretrained(tmp_path)
    elif family == "gemma3":
        from transformers import Gemma3ForCausalLM, Gemma3TextConfig

        cfg_t = Gemma3TextConfig(
            vocab_size=96, hidden_size=32, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
            intermediate_size=64, max_position_embeddings=128,
            rope_theta=1000000.0, rope_local_base_freq=10000.0,
            query_pre_attn_scalar=16, sliding_window=5,
            sliding_window_pattern=2,
            rope_scaling={"rope_type": "linear", "factor": 8.0},
            attention_dropout=0.0, tie_word_embeddings=False)
        torch.manual_seed(28)
        Gemma3ForCausalLM(cfg_t).save_pretrained(tmp_path)
    elif family == "mistral":
        from transformers import MistralConfig, MistralForCausalLM

        cfg_t = MistralConfig(vocab_size=96, hidden_size=32,
                              num_hidden_layers=2, num_attention_heads=4,
                              num_key_value_heads=2, head_dim=8,
                              intermediate_size=64,
                              max_position_embeddings=64,
                              rope_theta=10000.0, sliding_window=5,
                              attention_dropout=0.0,
                              tie_word_embeddings=False)
        torch.manual_seed(33)
        MistralForCausalLM(cfg_t).save_pretrained(tmp_path)
    elif family == "mixtral":
        from transformers import MixtralConfig, MixtralForCausalLM

        cfg_t = MixtralConfig(vocab_size=96, hidden_size=32,
                              num_hidden_layers=2, num_attention_heads=4,
                              num_key_value_heads=2, intermediate_size=48,
                              max_position_embeddings=64,
                              rope_theta=10000.0, num_local_experts=4,
                              num_experts_per_tok=2, sliding_window=None,
                              router_jitter_noise=0.0,
                              attention_dropout=0.0,
                              tie_word_embeddings=False)
        torch.manual_seed(39)
        MixtralForCausalLM(cfg_t).save_pretrained(tmp_path)
    else:
        from transformers import Gemma2Config, Gemma2ForCausalLM

        cfg_t = Gemma2Config(vocab_size=96, hidden_size=32,
                             num_hidden_layers=2, num_attention_heads=4,
                             num_key_value_heads=2, head_dim=8,
                             intermediate_size=64,
                             max_position_embeddings=64,
                             rope_theta=10000.0, query_pre_attn_scalar=16,
                             sliding_window=5, attn_logit_softcapping=50.0,
                             final_logit_softcapping=30.0,
                             attention_dropout=0.0)
        torch.manual_seed(22)
        Gemma2ForCausalLM(cfg_t).save_pretrained(tmp_path)

    from legalrag_tpu.models.decoder import (JaxDecoderLM, decoder_forward,
                                             load_hf_decoder_params)

    params, cfg = load_hf_decoder_params(tmp_path)
    rng = np.random.default_rng(17)
    ids = rng.integers(0, 96, 12).tolist()   # seq 12 > gemma window 5
    positions = jnp.arange(12, dtype=jnp.int32)[None, :]
    full, _ = decoder_forward(params, cfg,
                              jnp.asarray([ids], jnp.int32), positions)
    full = np.asarray(full)

    lm = JaxDecoderLM(params, cfg, max_len=16)
    cache = lm._empty_cache(1)
    pre = jnp.asarray([ids[:8]], jnp.int32)
    logits_pre, cache = decoder_forward(
        params, cfg, pre, jnp.arange(8, dtype=jnp.int32)[None, :],
        kv_cache=cache, cache_len=jnp.int32(0))
    np.testing.assert_allclose(np.asarray(logits_pre), full[:, :8],
                               atol=1e-4)
    for t in range(8, 12):
        step, cache = lm._decode_step(params,
                                      jnp.asarray([[ids[t]]], jnp.int32),
                                      jnp.int32(t), cache)
        np.testing.assert_allclose(np.asarray(step), full[:, t], atol=1e-4,
                                   err_msg=f"{family} step {t}")

    # and the chunked-scan generation path must emit the same tokens as
    # the per-token loop (exercises softcaps/sliding/q-k-norm inside scan)
    per_tok = list(JaxDecoderLM(params, cfg, max_len=32, decode_chunk=1)
                   .generate_stream(ids[:6], max_new_tokens=8))
    chunked = list(JaxDecoderLM(params, cfg, max_len=32, decode_chunk=4)
                   .generate_stream(ids[:6], max_new_tokens=8))
    assert per_tok == chunked
