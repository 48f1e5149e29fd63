"""BERT-family encoder in JAX/Flax.

The ``bert`` embedding backend: loads HF-format BERT checkpoints
(config.json + model.safetensors + tokenizer) for BGE-style bi-encoders,
bge-reranker-style cross-encoders, and ColBERT-style token encoders, and
runs them as jitted JAX programs on the TPU.

Semantics parity with the reference's FlagEmbedding usage
(``vector_store.py:131-155``): queries get the instruction prefix, passages
encode bare, CLS pooling, L2-normalized float32 outputs, max_length 512.

Weights must be present locally (zero-egress images skip this backend; the
``hash`` encoder serves instead). Correctness of the module itself is tested
with small randomly-initialized configs against shape/determinism/masking
invariants; numerical parity against reference embeddings is validated
wherever real checkpoints exist (cosine > 0.999 gate, SURVEY.md §7.2.3).
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from legalrag_tpu.utils import get_logger
from legalrag_tpu.utils.device import on_device

log = get_logger("models.bert")


class BertConfig:
    def __init__(self, vocab_size=30522, hidden_size=768,
                 num_hidden_layers=12, num_attention_heads=12,
                 intermediate_size=3072, max_position_embeddings=512,
                 type_vocab_size=2, layer_norm_eps=1e-12,
                 model_type="bert", pad_token_id=0, **_ignored):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.layer_norm_eps = layer_norm_eps
        self.model_type = model_type or "bert"
        self.pad_token_id = 0 if pad_token_id is None else int(pad_token_id)

    @property
    def roberta_positions(self) -> bool:
        """Roberta-family (incl. XLMRoberta — bge-reranker-v2-m3, bge-m3)
        position ids start at pad_token_id+1 and skip padded slots
        (HF ``create_position_ids_from_input_ids``)."""
        return self.model_type in ("roberta", "xlm-roberta", "camembert")

    @property
    def usable_positions(self) -> int:
        """Longest sequence the position table supports. Roberta position
        ids run pad+1 … pad+L, so L_max = max_pos − pad − 1 (= 512 for
        bge-m3 / bge-reranker-v2-m3's 514-row table, matching HF's
        model_max_length)."""
        off = self.pad_token_id + 1 if self.roberta_positions else 0
        return self.max_position_embeddings - off

    @classmethod
    def from_json(cls, path: Path) -> "BertConfig":
        return cls(**json.loads(path.read_text(encoding="utf-8")))


# ---------------------------------------------------------------------------
# functional forward (params = nested dict of jnp arrays, HF naming)

def _layer_norm(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _linear(x, p):
    return jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32) + p["bias"]


def bert_forward(params: Dict, cfg: BertConfig, input_ids: jax.Array,
                 attention_mask: jax.Array,
                 token_type_ids: Optional[jax.Array] = None) -> jax.Array:
    """[B, L] ids → [B, L, H] final hidden states (f32)."""
    b, l = input_ids.shape
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    emb = params["embeddings"]
    if cfg.roberta_positions:
        # bit-exact HF create_position_ids_from_input_ids: count from
        # pad_token_id+1, padded slots index the pad row
        m = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        pos_ids = jnp.cumsum(m, axis=1) * m + cfg.pad_token_id
        pos = jnp.take(emb["position_embeddings"], pos_ids, axis=0)
    else:
        pos = emb["position_embeddings"][None, :l]
    x = (jnp.take(emb["word_embeddings"], input_ids, axis=0) + pos
         + jnp.take(emb["token_type_embeddings"], token_type_ids, axis=0))
    x = _layer_norm(x, emb["LayerNorm"]["weight"], emb["LayerNorm"]["bias"],
                    cfg.layer_norm_eps)

    heads = cfg.num_attention_heads
    head_dim = cfg.hidden_size // heads
    neg = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e30)

    for layer in params["layers"]:
        att = layer["attention"]
        q = _linear(x, att["query"]).reshape(b, l, heads, head_dim)
        k = _linear(x, att["key"]).reshape(b, l, heads, head_dim)
        v = _linear(x, att["value"]).reshape(b, l, heads, head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(head_dim) + neg
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.reshape(b, l, cfg.hidden_size)
        x = _layer_norm(x + _linear(ctx, att["output"]),
                        att["output_LayerNorm"]["weight"],
                        att["output_LayerNorm"]["bias"], cfg.layer_norm_eps)
        h = jax.nn.gelu(_linear(x, layer["intermediate"]), approximate=False)
        x = _layer_norm(x + _linear(h, layer["output"]),
                        layer["output_LayerNorm"]["weight"],
                        layer["output_LayerNorm"]["bias"], cfg.layer_norm_eps)
    return x


# ---------------------------------------------------------------------------
# HF weight loading

def load_hf_bert_params(model_dir: Path) -> Tuple[Dict, BertConfig]:
    cfg = BertConfig.from_json(model_dir / "config.json")
    tensors = _load_safetensors(model_dir)

    def get(name):
        for prefix in ("", "bert.", "roberta.", "model."):
            key = prefix + name
            if key in tensors:
                return jnp.asarray(tensors[key])
        raise KeyError(name)

    def lin(name):
        return {"kernel": get(f"{name}.weight").T, "bias": get(f"{name}.bias")}

    def ln(name):
        return {"weight": get(f"{name}.weight"), "bias": get(f"{name}.bias")}

    try:
        # roberta-family checkpoints may omit the (size-1) token-type table
        token_type = get("embeddings.token_type_embeddings.weight")
    except KeyError:
        token_type = jnp.zeros((1, cfg.hidden_size), jnp.float32)
    params: Dict = {
        "embeddings": {
            "word_embeddings": get("embeddings.word_embeddings.weight"),
            "position_embeddings": get("embeddings.position_embeddings.weight"),
            "token_type_embeddings": token_type,
            "LayerNorm": ln("embeddings.LayerNorm"),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}"
        params["layers"].append({
            "attention": {
                "query": lin(f"{p}.attention.self.query"),
                "key": lin(f"{p}.attention.self.key"),
                "value": lin(f"{p}.attention.self.value"),
                "output": lin(f"{p}.attention.output.dense"),
                "output_LayerNorm": ln(f"{p}.attention.output.LayerNorm"),
            },
            "intermediate": lin(f"{p}.intermediate.dense"),
            "output": lin(f"{p}.output.dense"),
            "output_LayerNorm": ln(f"{p}.output.LayerNorm"),
        })
    return params, cfg


def _load_safetensors(model_dir: Path) -> Dict[str, np.ndarray]:
    st_files = sorted(model_dir.glob("*.safetensors"))
    if st_files:
        from safetensors.numpy import load_file

        out: Dict[str, np.ndarray] = {}
        for f in st_files:
            out.update(load_file(str(f)))
        return out
    bin_path = model_dir / "pytorch_model.bin"
    if bin_path.exists():
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        # numpy has no bfloat16; go through float32 for bf16 .bin weights
        # (safetensors checkpoints keep bf16 via ml_dtypes).
        return {k: (v.float() if v.dtype == torch.bfloat16 else v).numpy()
                for k, v in sd.items()}
    raise FileNotFoundError(f"no model weights under {model_dir}")


def random_init_bert_params(cfg: BertConfig, seed: int = 0) -> Dict:
    """Torch-free random-init params matching ``bert_forward``'s tree —
    for benchmarks/dryruns in checkpoint-less environments (throughput and
    compile behavior are weight-independent). Layout mirrors
    ``load_hf_bert_params``."""
    rng = np.random.default_rng(seed)
    h, i = cfg.hidden_size, cfg.intermediate_size
    s = 0.02

    def lin(d_in, d_out):
        return {"kernel": jnp.asarray(
            rng.standard_normal((d_in, d_out)).astype(np.float32) * s),
            "bias": jnp.zeros((d_out,), jnp.float32)}

    def ln():
        return {"weight": jnp.ones((h,), jnp.float32),
                "bias": jnp.zeros((h,), jnp.float32)}

    def table(rows):
        return jnp.asarray(
            rng.standard_normal((rows, h)).astype(np.float32) * s)

    params: Dict = {
        "embeddings": {
            "word_embeddings": table(cfg.vocab_size),
            "position_embeddings": table(cfg.max_position_embeddings),
            "token_type_embeddings": table(cfg.type_vocab_size),
            "LayerNorm": ln(),
        },
        "layers": [{
            "attention": {
                "query": lin(h, h), "key": lin(h, h), "value": lin(h, h),
                "output": lin(h, h), "output_LayerNorm": ln(),
            },
            "intermediate": lin(h, i),
            "output": lin(i, h),
            "output_LayerNorm": ln(),
        } for _ in range(cfg.num_hidden_layers)],
    }
    return params


def resolve_model_dir(name_or_path: str) -> Path:
    p = Path(name_or_path)
    if p.exists():
        return p
    # HF cache layout (offline): ~/.cache/huggingface/hub/models--org--name
    hub = Path.home() / ".cache" / "huggingface" / "hub"
    cand = hub / ("models--" + name_or_path.replace("/", "--"))
    snaps = sorted((cand / "snapshots").glob("*")) if cand.exists() else []
    if snaps:
        return snaps[-1]
    raise FileNotFoundError(
        f"model '{name_or_path}' not found locally (zero-egress image?)")


def bert_query_views(params, cfg: BertConfig, proj, token_dim: int,
                     ids_q, mask_q, ids_t=None, mask_t=None):
    """Traceable: both query views from the same weights — CLS query
    embedding (instructed input) and, when ``ids_t`` is given, per-token
    late-interaction embeddings (bare input), both L2-normalized. Used by
    the one-execution serving programs (encoder fused INTO the search
    program) and by ``FlaxBertEncoder._bundle_fwd``; identical math to the
    separate ``encode_queries``/``encode_tokens`` calls (tested)."""
    cls = bert_forward(params, cfg, ids_q, mask_q)[:, 0]
    cls = cls / jnp.maximum(jnp.linalg.norm(cls, axis=-1, keepdims=True),
                            1e-9)
    if ids_t is None:
        return cls, None
    h = bert_forward(params, cfg, ids_t, mask_t)
    h = _linear(h, proj) if proj is not None else h[..., :token_dim]
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-9)
    return cls, h


# ---------------------------------------------------------------------------
# public encoders

class FlaxBertEncoder:
    """BGE-style bi-encoder: CLS pooling + L2 norm; query instruction."""

    def __init__(self, params: Dict, cfg: BertConfig, tokenizer,
                 instruction: str = "", device=None, max_length: int = 512,
                 token_dim: int = 128, token_proj: Optional[Dict] = None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.instruction = instruction
        self.device = device
        # a max_length past the checkpoint's usable position table would
        # index nonexistent position embeddings (roberta tables carry
        # pad+2 unused leading rows)
        self.max_length = min(max_length, cfg.usable_positions)
        self.dim = cfg.hidden_size
        self.token_dim = token_dim
        self.token_proj = token_proj  # optional ColBERT linear head
        self._fwd = jax.jit(lambda p, ids, mask: bert_forward(p, cfg, ids, mask))

        self._bundle_fwd = jax.jit(
            lambda p, proj, ids_q, mask_q, ids_t, mask_t: bert_query_views(
                p, cfg, proj, self.token_dim, ids_q, mask_q, ids_t, mask_t))

    @classmethod
    def from_pretrained(cls, name_or_path: str, instruction: str = "",
                        device=None, **kw) -> "FlaxBertEncoder":
        model_dir = resolve_model_dir(name_or_path)
        params, cfg = load_hf_bert_params(model_dir)
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(str(model_dir))
        if device is not None:
            params = jax.device_put(params, device)
        log.info("loaded %s (%d layers, H=%d)", name_or_path,
                 cfg.num_hidden_layers, cfg.hidden_size)
        return cls(params, cfg, tokenizer, instruction=instruction,
                   device=device, **kw)

    # -------------------------------------------------------------- encode
    def _tokenize(self, texts: List[str], maxlen: int):
        out = self.tokenizer(texts, padding="max_length", truncation=True,
                             max_length=maxlen, return_tensors="np")
        return (jnp.asarray(out["input_ids"], jnp.int32),
                jnp.asarray(out["attention_mask"], jnp.int32))

    def _encode(self, texts: List[str]) -> np.ndarray:
        ids, mask = self._tokenize(texts, self.max_length)
        with on_device(self.device):
            h = self._fwd(self.params, ids, mask)
            cls = h[:, 0]
            cls = cls / jnp.maximum(jnp.linalg.norm(cls, axis=-1,
                                                    keepdims=True), 1e-9)
        return np.asarray(cls, np.float32)

    def encode_passages(self, texts: List[str]) -> np.ndarray:
        return self._encode(texts)

    def encode_queries(self, texts: List[str]) -> np.ndarray:
        if self.instruction:
            texts = [self.instruction + t for t in texts]
        return self._encode(texts)

    def encode_query_bundle(self, texts: List[str], token_maxlen: int
                            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(query embeddings, query token embeddings, token mask) from ONE
        device execution — the serving fast path's encoder call."""
        q_texts = ([self.instruction + t for t in texts]
                   if self.instruction else texts)
        ids_q, mask_q = self._tokenize(q_texts, self.max_length)
        ids_t, mask_t = self._tokenize(texts, token_maxlen)
        with on_device(self.device):
            cls, tok = self._bundle_fwd(self.params, self.token_proj,
                                        ids_q, mask_q, ids_t, mask_t)
        return (np.asarray(cls, np.float32), np.asarray(tok, np.float32),
                np.asarray(mask_t).astype(bool))

    def encode_tokens(self, texts: List[str], maxlen: int,
                      query: bool = False
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-token embeddings for late interaction: final hidden states,
        optionally projected by a ColBERT linear head, L2-normalized.
        ``query`` is part of the EncoderBackend contract; subword
        tokenization does not branch on it."""
        ids, mask = self._tokenize(texts, maxlen)
        with on_device(self.device):
            h = bert_forward(self.params, self.cfg, ids, mask)
            if self.token_proj is not None:
                h = _linear(h, self.token_proj)
            else:
                h = h[..., : self.token_dim]
            h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True),
                                1e-9)
        return np.asarray(h, np.float32), np.asarray(mask).astype(bool)


class FlaxBertCrossEncoder:
    """bge-reranker-style pair classifier: (q, d) → relevance logit.

    The classification head mirrors whatever the checkpoint carries
    (validated against torch in ``tests/test_checkpoint_parity.py``):

    - Roberta-style (bge-reranker-v2-m3 is XLMRoberta): CLS → dense →
      tanh → out_proj (``classifier.dense`` + ``classifier.out_proj``);
    - Bert-style: CLS → pooler dense → tanh → classifier;
    - bare: CLS → classifier.
    """

    def __init__(self, params: Dict, cfg: BertConfig, head: Dict,
                 tokenizer, device=None):
        self.params = params
        self.cfg = cfg
        self.head = head
        self.tokenizer = tokenizer
        self.device = device

        def fwd(p, head, ids, mask, types):
            h = bert_forward(p, cfg, ids, mask, types)[:, 0]
            if head.get("dense") is not None:
                h = jnp.tanh(_linear(h, head["dense"]))
            return _linear(h, head["out"]).squeeze(-1)

        self._fwd = jax.jit(fwd)

    @classmethod
    def from_pretrained(cls, name_or_path: str, device=None
                        ) -> "FlaxBertCrossEncoder":
        model_dir = resolve_model_dir(name_or_path)
        params, cfg = load_hf_bert_params(model_dir)
        tensors = _load_safetensors(model_dir)

        def find(suffix):
            key = next((k for k in tensors if k.endswith(suffix)), None)
            if key is None:
                return None
            return {"kernel": jnp.asarray(tensors[key]).T,
                    "bias": jnp.asarray(
                        tensors[key[: -len("weight")] + "bias"])}

        out = find("classifier.out_proj.weight")
        if out is not None:                       # Roberta-style head
            head = {"dense": find("classifier.dense.weight"), "out": out}
        else:
            out = find("classifier.weight")
            if out is None:
                raise FileNotFoundError("no classifier head in checkpoint")
            head = {"dense": find("pooler.dense.weight"), "out": out}
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(str(model_dir))
        if device is not None:
            params = jax.device_put(params, device)
            head = jax.device_put(head, device)
        return cls(params, cfg, head, tokenizer, device)

    def score_pairs(self, pairs: List[Tuple[str, str]],
                    max_length: int = 512) -> List[float]:
        max_length = min(max_length, self.cfg.usable_positions)
        out = self.tokenizer([a for a, _ in pairs], [b for _, b in pairs],
                             padding="max_length", truncation=True,
                             max_length=max_length, return_tensors="np")
        types = out.get("token_type_ids")
        if types is None or self.cfg.type_vocab_size < 2:
            # roberta-family models have no segment embeddings (table size
            # 1) — segment ids from a pair-encoding tokenizer must not
            # index past it
            types = np.zeros_like(out["input_ids"])
        with on_device(self.device):
            logits = self._fwd(
                self.params, self.head,
                jnp.asarray(out["input_ids"], jnp.int32),
                jnp.asarray(out["attention_mask"], jnp.int32),
                jnp.asarray(types, jnp.int32))
        return np.asarray(logits, np.float32).tolist()
