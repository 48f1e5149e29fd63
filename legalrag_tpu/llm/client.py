"""Provider-agnostic LLM client.

Capability parity with the reference ``LLMClient`` (``llm/client.py``):

- providers: ``openai`` (chat-completions; no SDK — stdlib HTTP, because the
  client must not drag heavyweight deps into the serving image), ``local``
  (HF transformers causal LM on CPU/GPU, chat-template rendering), and
  ``disabled`` (expects a per-request user key; degrades otherwise).
- reasoning-model quirk preserved: temperature/top_p are omitted for
  gpt-5/o1/o3/"thinking" model families (reference ``client.py:28-41``).
- two attempts then *degraded mode*: a fixed "model unavailable, showing
  retrieval only" answer instead of an exception (``client.py:541-551``) —
  retrieval results must always reach the user.
- streaming: ``chat_stream`` yields text chunks; OpenAI SSE frames are
  parsed incrementally; the local model streams via an iterator thread.
- singleton ``from_config`` + per-user-key cache ``from_config_with_key``
  (a user key forces the openai provider, ``client.py:63-123``).
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request
from typing import Dict, Generator, List, Optional

from legalrag_tpu.config import AppConfig, LLMConfig
from legalrag_tpu.llm.context import get_request_id
from legalrag_tpu.utils import get_logger

log = get_logger("llm.client")

Message = Dict[str, str]

DEGRADED_ANSWER = {
    "zh": "（当前未配置生成模型或模型暂不可用，以下仅展示检索到的相关条文，请结合原文自行判断。）",
    "en": "(No generation model is configured or the model is temporarily "
          "unavailable; showing retrieved provisions only.)",
}


def _is_reasoning_model(model: str) -> bool:
    """gpt-5/o1/o3/"thinking" families reject sampling params (reference
    client.py:28-41). o1/o3 match as whole name segments — a bare
    substring test would misclassify names that merely contain the
    letters (e.g. "turbo1" served via an OpenAI-compatible base_url)."""
    import re as _re

    m = (model or "").lower()
    if "gpt-5" in m or "thinking" in m:
        return True
    return any(seg in ("o1", "o3") for seg in _re.split(r"[^a-z0-9]+", m))


class LLMUnavailable(RuntimeError):
    pass


class LLMClient:
    _singleton: Optional["LLMClient"] = None
    _keyed_cache: Dict[str, "LLMClient"] = {}
    _cache_lock = threading.Lock()

    def __init__(self, cfg: LLMConfig, api_key: Optional[str] = None):
        self.cfg = cfg
        self.api_key = api_key or cfg.api_key
        self.provider = cfg.provider
        if self.provider == "openai" and not self.api_key:
            self.provider = "disabled"
        self._local = None  # lazy local engine (torch or JAX)
        # serving threads share this client; without the lock two first
        # requests would each load the model (minutes + GBs on device)
        self._load_lock = threading.Lock()

    # ------------------------------------------------------------ factories
    @classmethod
    def from_config(cls, cfg: AppConfig) -> "LLMClient":
        with cls._cache_lock:
            if cls._singleton is None or cls._singleton.cfg is not cfg.llm:
                cls._singleton = cls(cfg.llm)
            return cls._singleton

    @classmethod
    def from_config_with_key(cls, cfg: AppConfig, user_key: str) -> "LLMClient":
        with cls._cache_lock:
            client = cls._keyed_cache.get(user_key)
            if client is None:
                llm_cfg = cfg.llm.model_copy()
                llm_cfg.provider = "openai"
                client = cls(llm_cfg, api_key=user_key)
                if len(cls._keyed_cache) < 256:
                    cls._keyed_cache[user_key] = client
        return client

    # ----------------------------------------------------------------- chat
    def chat(self, messages: List[Message], tag: str = "chat",
             max_new_tokens: Optional[int] = None) -> str:
        rid = get_request_id()
        last_err: Optional[Exception] = None
        for attempt in range(2):
            try:
                if self.provider == "openai":
                    return self._chat_openai(messages, max_new_tokens)
                if self.provider == "local":
                    return self._chat_local(messages, max_new_tokens)
                if self.provider == "local-jax":
                    return "".join(self._stream_jax(messages, max_new_tokens))
                raise LLMUnavailable("provider disabled")
            except LLMUnavailable as e:
                last_err = e
                break
            except Exception as e:
                last_err = e
                log.warning("[%s] llm %s attempt %d failed: %s",
                            rid, tag, attempt + 1, e)
        log.info("[%s] llm %s degraded (%s)", rid, tag, last_err)
        return self.degraded_answer(messages)

    def chat_stream(self, messages: List[Message], tag: str = "chat",
                    max_new_tokens: Optional[int] = None
                    ) -> Generator[str, None, None]:
        yielded = False
        try:
            streams = {"openai": self._stream_openai,
                       "local": self._stream_local,
                       "local-jax": self._stream_jax}
            fn = streams.get(self.provider)
            if fn is not None:
                for chunk in fn(messages, max_new_tokens):
                    yielded = True
                    yield chunk
                return
        except Exception as e:
            log.warning("[%s] llm stream %s failed: %s", get_request_id(), tag, e)
        if yielded:
            # a provider died mid-answer: appending the full "no model is
            # configured" boilerplate after half an answer reads as
            # contradictory — mark the truncation instead
            from legalrag_tpu.utils import has_chinese

            text = " ".join(m.get("content", "") for m in messages)
            yield ("……（生成中断）" if has_chinese(text)
                   else " … (generation interrupted)")
        else:
            yield self.degraded_answer(messages)

    def degraded_answer(self, messages: List[Message]) -> str:
        text = " ".join(m.get("content", "") for m in messages)
        from legalrag_tpu.utils import has_chinese

        return DEGRADED_ANSWER["zh" if has_chinese(text) else "en"]

    @property
    def is_degraded(self) -> bool:
        return self.provider == "disabled"

    def close(self) -> None:
        """Release the local engine (stops the batched decode worker
        thread and fails open streams cleanly). Idempotent."""
        local, self._local = self._local, None
        if local is not None and hasattr(local, "close"):
            try:
                local.close()
            except Exception:
                log.warning("local engine close failed", exc_info=True)

    # --------------------------------------------------------------- openai
    def _openai_payload(self, messages: List[Message],
                        max_new_tokens: Optional[int], stream: bool) -> dict:
        payload: dict = {
            "model": self.cfg.model,
            "messages": messages,
            "stream": stream,
        }
        budget = max_new_tokens or self.cfg.max_new_tokens
        if _is_reasoning_model(self.cfg.model):
            # reasoning families reject sampling params and the legacy
            # max_tokens name (reference client.py:28-41)
            payload["max_completion_tokens"] = budget
        else:
            # max_tokens keeps OpenAI-compatible local servers (vLLM etc.)
            # working; OpenAI still accepts it for non-reasoning models
            payload["max_tokens"] = budget
            payload["temperature"] = self.cfg.temperature
            payload["top_p"] = self.cfg.top_p
        return payload

    def _openai_request(self, payload: dict) -> urllib.request.Request:
        base = (self.cfg.base_url or "https://api.openai.com/v1").rstrip("/")
        return urllib.request.Request(
            f"{base}/chat/completions",
            data=json.dumps(payload).encode("utf-8"),
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {self.api_key}"},
            method="POST")

    def _chat_openai(self, messages: List[Message],
                     max_new_tokens: Optional[int]) -> str:
        req = self._openai_request(self._openai_payload(messages,
                                                        max_new_tokens, False))
        with urllib.request.urlopen(req, timeout=self.cfg.request_timeout) as r:
            obj = json.loads(r.read().decode("utf-8"))
        return obj["choices"][0]["message"]["content"] or ""

    def _stream_openai(self, messages: List[Message],
                       max_new_tokens: Optional[int]
                       ) -> Generator[str, None, None]:
        req = self._openai_request(self._openai_payload(messages,
                                                        max_new_tokens, True))
        with urllib.request.urlopen(req, timeout=self.cfg.request_timeout) as r:
            for raw in r:
                line = raw.decode("utf-8").strip()
                if not line.startswith("data:"):
                    continue
                data = line[5:].strip()
                if data == "[DONE]":
                    break
                try:
                    delta = json.loads(data)["choices"][0]["delta"]
                except (json.JSONDecodeError, KeyError, IndexError):
                    continue
                piece = delta.get("content")
                if piece:
                    yield piece

    # ---------------------------------------------------------------- local
    def _load_local(self):
        with self._load_lock:
            return self._load_local_locked()

    def _load_local_locked(self):
        if self._local is None:
            try:
                import torch
                from transformers import AutoModelForCausalLM, AutoTokenizer
            except ImportError as e:
                raise LLMUnavailable(f"transformers unavailable: {e}") from e
            try:
                tok = AutoTokenizer.from_pretrained(self.cfg.model)
                dtype = (torch.float16 if torch.cuda.is_available()
                         else torch.float32)
                model = AutoModelForCausalLM.from_pretrained(
                    self.cfg.model, torch_dtype=dtype, device_map="auto")
            except Exception as e:
                raise LLMUnavailable(f"local model load failed: {e}") from e
            self._local = (tok, model)
        return self._local

    def _local_inputs(self, tok, messages: List[Message]):
        prompt = tok.apply_chat_template(messages, tokenize=False,
                                         add_generation_prompt=True)
        return tok(prompt, return_tensors="pt",
                   truncation=True, max_length=self.cfg.max_context_tokens)

    def _chat_local(self, messages: List[Message],
                    max_new_tokens: Optional[int]) -> str:
        tok, model = self._load_local()
        inputs = self._local_inputs(tok, messages).to(model.device)
        out = model.generate(
            **inputs, max_new_tokens=max_new_tokens or self.cfg.max_new_tokens,
            do_sample=self.cfg.temperature > 0,
            temperature=max(self.cfg.temperature, 1e-5),
            top_p=self.cfg.top_p, repetition_penalty=1.05)
        gen = out[0][inputs["input_ids"].shape[1]:]
        return tok.decode(gen, skip_special_tokens=True)

    # ------------------------------------------------------------- local-jax
    def _load_jax_lm(self):
        """TPU-native decoder (models/decoder.py): generation on the same
        chip as retrieval — no torch in the serving path."""
        with self._load_lock:
            return self._load_jax_lm_locked()

    def _load_jax_lm_locked(self):
        if self._local is None:
            try:
                # cache sized so a full-context prompt can still generate
                # max_new_tokens (generation clamps at capacity otherwise)
                kw = dict(
                    max_len=self.cfg.max_context_tokens
                    + self.cfg.max_new_tokens,
                    decode_chunk=getattr(self.cfg, "decode_chunk", 8),
                    kv_quant=getattr(self.cfg, "kv_quant", False),
                    weight_quant=getattr(self.cfg, "weight_quant", False),
                    weight_bits=getattr(self.cfg, "weight_bits", 8),
                    constrain_json=getattr(self.cfg, "constrain_json",
                                           False))
                pc = getattr(self.cfg, "prefill_chunk", 0)
                slots = getattr(self.cfg, "batch_slots", 0)
                spec_k = getattr(self.cfg, "spec_k", 0)
                if spec_k and getattr(self.cfg, "ngram_draft_path", ""):
                    # corpus n-gram drafts for the speculative engines
                    kw["ngram_draft"] = self.cfg.ngram_draft_path
                kw["prefix_cache"] = getattr(self.cfg, "prefix_cache", 0)
                if pc:
                    kw["prefill_chunk"] = pc
                paged = getattr(self.cfg, "paged_kv", False)
                if slots and slots > 1 and paged:
                    # paged KV pool + radix prefix reuse
                    # (models/paged_decoder.py): cross-request prefix KV
                    # shared by REFERENCE, HBM bounded by the pool. The
                    # radix tree subsumes prefix_cache/shared_prefix, so
                    # those knobs are dropped here rather than forwarded;
                    # constrain_json is supported (same schema-DFA mask
                    # as the contiguous engines), and spec_k > 0 runs the
                    # batched speculation rounds over block tables
                    # (lookup + n-gram table + optional draft model).
                    from legalrag_tpu.models.paged_decoder import \
                        PagedDecoderLM

                    engine_cls = PagedDecoderLM
                    kw.pop("prefix_cache", None)
                    bs_blk = getattr(self.cfg, "kv_block_size", 64)
                    kw["max_len"] = -(-kw["max_len"] // bs_blk) * bs_blk
                    kw.update(n_slots=slots, spec_k=max(spec_k, 0),
                              block_size=bs_blk,
                              pool_blocks=getattr(self.cfg,
                                                  "kv_pool_blocks", 0))
                    dm = getattr(self.cfg, "draft_model", "")
                    if dm and spec_k:
                        kw["draft_model"] = dm
                elif slots and slots > 1:
                    # continuous batching: concurrent answer streams share
                    # one batched decode loop (models/batched_decoder.py);
                    # spec_k > 0 adds per-slot prompt-lookup speculation
                    from legalrag_tpu.models.batched_decoder import \
                        BatchedDecoderLM

                    engine_cls = BatchedDecoderLM
                    kw.update(n_slots=slots, spec_k=max(spec_k, 0),
                              shared_prefix_text=getattr(
                                  self.cfg, "shared_prefix_text", ""))
                    dm = getattr(self.cfg, "draft_model", "")
                    if dm and spec_k:
                        kw["draft_model"] = dm
                elif spec_k and spec_k > 0:
                    # speculative decoding: draft from the prompt's own
                    # n-grams (default) or a small draft MODEL
                    # (llm.draft_model), verify k tokens per forward
                    from legalrag_tpu.models.spec_decode import \
                        SpecLookupDecoderLM

                    engine_cls = SpecLookupDecoderLM
                    kw["spec_k"] = spec_k
                    kw["spec_adaptive"] = getattr(
                        self.cfg, "spec_adaptive", 2.0)
                    dm = getattr(self.cfg, "draft_model", "")
                    if dm:
                        kw["draft_model"] = dm
                else:
                    from legalrag_tpu.models.decoder import JaxDecoderLM

                    engine_cls = JaxDecoderLM
                tp = getattr(self.cfg, "tp_shards", 0)
                dp = getattr(self.cfg, "dp_replicas", 0)
                if dp and dp > 1:
                    # data-parallel serving: dp engine replicas (each on
                    # its own device, or its own tp-wide submesh) behind
                    # one least-busy admission front
                    from legalrag_tpu.parallel.decoder_dp import \
                        DPDecoderRouter

                    self._local = DPDecoderRouter.from_pretrained(
                        engine_cls, self.cfg.model, replicas=dp,
                        tp_shards=tp, **kw)
                else:
                    self._local = engine_cls.from_pretrained(
                        self.cfg.model, **kw)
                    if tp and tp > 1:
                        # re-place the loaded params tensor-parallel (and
                        # the batched engine's persistent slot cache
                        # kv-head-parallel); the engines are
                        # sharding-agnostic (GSPMD inserts the collectives
                        # at trace time)
                        from legalrag_tpu.parallel.decoder_tp import \
                            apply_tp_to_engine
                        from legalrag_tpu.parallel.mesh import (
                            local_devices, make_mesh)

                        mesh = make_mesh(local_devices()[:tp], data=1,
                                         model=tp)
                        apply_tp_to_engine(self._local, mesh)
            except Exception as e:
                raise LLMUnavailable(f"jax decoder load failed: {e}") from e
        return self._local

    def _stream_jax(self, messages: List[Message],
                    max_new_tokens: Optional[int]
                    ) -> Generator[str, None, None]:
        lm = self._load_jax_lm()
        tok = lm.tokenizer
        prompt = tok.apply_chat_template(messages, tokenize=False,
                                         add_generation_prompt=True)
        ids = tok(prompt, truncation=True,
                  max_length=self.cfg.max_context_tokens)["input_ids"]
        out_ids: List[int] = []
        emitted = ""
        try:
            for t in lm.generate_stream(
                    ids,
                    max_new_tokens=max_new_tokens or self.cfg.max_new_tokens,
                    temperature=self.cfg.temperature, top_p=self.cfg.top_p,
                    top_k=getattr(self.cfg, "top_k", 0),
                    min_p=getattr(self.cfg, "min_p", 0.0),
                    eos_id=tok.eos_token_id,
                    constrain=getattr(self.cfg, "constrain_json", False),
                    repetition_penalty=getattr(self.cfg,
                                               "repetition_penalty", 1.0)):
                out_ids.append(t)
                text = tok.decode(out_ids, skip_special_tokens=True)
                if len(text) > len(emitted) and not text.endswith("�"):
                    yield text[len(emitted):]
                    emitted = text
            # flush the withheld tail: the incremental loop holds chunks
            # back while the byte stream ends in a partial UTF-8 char, and
            # the stream can END there (eos/budget right after the first
            # half of a multi-token character — common for zh under BPE)
            final = tok.decode(out_ids, skip_special_tokens=True)
            if len(final) > len(emitted):
                yield final[len(emitted):]
                emitted = final
        finally:
            from legalrag_tpu.utils.metrics import METRICS

            METRICS.inc("legalrag_llm_tokens", len(out_ids),
                        provider="local-jax")
            METRICS.inc("legalrag_llm_streams", provider="local-jax")

    def _stream_local(self, messages: List[Message],
                      max_new_tokens: Optional[int]
                      ) -> Generator[str, None, None]:
        from transformers import TextIteratorStreamer

        tok, model = self._load_local()
        inputs = self._local_inputs(tok, messages).to(model.device)
        # timeout: a generate() exception otherwise dies silently in the
        # daemon thread and the consumer blocks forever
        streamer = TextIteratorStreamer(tok, skip_prompt=True,
                                        skip_special_tokens=True,
                                        timeout=300.0)
        kwargs = dict(**inputs, streamer=streamer,
                      max_new_tokens=max_new_tokens or self.cfg.max_new_tokens,
                      do_sample=self.cfg.temperature > 0,
                      temperature=max(self.cfg.temperature, 1e-5),
                      top_p=self.cfg.top_p)
        thread = threading.Thread(target=model.generate, kwargs=kwargs,
                                  daemon=True)
        thread.start()
        yield from streamer
