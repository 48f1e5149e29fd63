"""Configuration tree.

Capability parity with the reference's ``legalrag/config.py`` (AppConfig with
Paths/LLM/Retrieval/PDF/Server/Routing sub-configs, ``load()`` with optional
YAML/JSON file, per-language path + model swapping via ``with_lang()``,
index-version resolution through the registry — reference
``config.py:158-274``), extended with an ``EngineConfig`` describing the
TPU-resident query engine (dtypes, capacities, kernel and mesh choices) that
replaces the reference's FAISS/ColBERT knobs.

Deliberate divergences from the reference (documented per SURVEY.md §2.13):
- one fusion blend knob ``rrf_alpha`` (default 0.5). The reference declares
  ``rrf_blend_alpha=0.6`` but actually reads ``rrf_alpha=0.5``
  (``hybrid_retriever.py:400``); we keep the *effective* behavior.
- ``oversample_factor`` is honored (the reference intended ``top_k*8`` but
  effectively oversampled to ``top_k`` only, ``hybrid_retriever.py:289``).
- no HNSW parameters: dense search is exact on device, which strictly
  dominates HNSW recall at equal semantics (SURVEY.md §2.9).
"""

from __future__ import annotations

import copy
import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

from pydantic import BaseModel, Field

DEFAULT_ROOT = Path(os.environ.get("LEGALRAG_ROOT", Path(__file__).resolve().parent.parent))


class PathsConfig(BaseModel):
    root: Path = DEFAULT_ROOT
    data_dir: Path = DEFAULT_ROOT / "data"
    raw_dir: Path = DEFAULT_ROOT / "data" / "raw"
    processed_dir: Path = DEFAULT_ROOT / "data" / "processed"
    index_dir: Path = DEFAULT_ROOT / "data" / "index"
    graph_dir: Path = DEFAULT_ROOT / "data" / "graph"
    eval_dir: Path = DEFAULT_ROOT / "data" / "eval"
    upload_dir: Path = DEFAULT_ROOT / "data" / "uploads"
    # per-language (resolved by AppConfig.with_lang / _apply_lang_paths)
    corpus_file: Path = DEFAULT_ROOT / "data" / "processed" / "law_zh.jsonl"
    lang_index_dir: Path = DEFAULT_ROOT / "data" / "index" / "zh"
    graph_file: Path = DEFAULT_ROOT / "data" / "graph" / "law_graph_zh.jsonl"

    def ensure_tree(self) -> None:
        for p in (self.data_dir, self.raw_dir, self.processed_dir, self.index_dir,
                  self.graph_dir, self.eval_dir, self.upload_dir):
            Path(p).mkdir(parents=True, exist_ok=True)


class EngineConfig(BaseModel):
    """TPU query-engine knobs (no reference analogue; replaces FAISS/PLAID)."""

    # storage dtype of the dense / token embedding matrices in HBM.
    # "int8" stores the dense matrix in unit-int8 form (rows are
    # L2-normalized, so round(127·e) with implicit scale 1/127 is
    # near-lossless — score error ≲2e-3): HALF the dominant HBM stream
    # at large N, s8×s8→s32 scoring on the MXU (ops.topk.dense_scores).
    dtype: str = "bfloat16"
    # index capacity is rounded up to a multiple of this (static shapes under jit;
    # incremental adds fill pre-allocated rows — SURVEY.md §7.2 step 4)
    capacity_round: int = 1024
    # growth factor when an incremental add exceeds capacity (recompile event)
    capacity_growth: float = 1.5
    # kernel backend: "pallas" | "xla" | "auto" (pallas on TPU, xla elsewhere)
    kernel_backend: str = "auto"
    # dense score+topk kernel tile over corpus rows
    dense_tile_n: int = 512
    # BM25 device scoring: max padded postings gathered per query
    bm25_max_query_postings: int = 16384
    # late interaction
    late_doc_maxlen: int = 220  # token budget per doc (reference config.py:108)
    late_dim: int = 128
    # token-store storage: "" = engine dtype; "int8" halves HBM; "nbit4" is
    # the PLAID-class residual compression (~4x vs bf16, reference
    # colbert_builder.py:119-134 nbits=4)
    token_dtype: str = ""
    late_candidates: int = 128  # dense-prefiltered candidate count for MaxSim
    # large-corpus mode only: write the [B, N] dense score map in bf16 —
    # half the program's dominant HBM stream; winners are rescored
    # exactly in f32 (ops/fused_query.py). "float32" keeps the exact
    # selection contract (parity gate); "bfloat16" is the perf knob.
    dense_map_dtype: str = "float32"
    # query batching for the serving engine
    max_query_batch: int = 64
    max_query_tokens: int = 64
    # serving micro-batch: concurrent request threads' channel executions
    # are coalesced into ONE device program (retrieval/batcher.py). The
    # window is how long a leader waits for followers before launching;
    # 0 keeps latency untouched and still coalesces requests that arrive
    # while an execution is in flight.
    microbatch_window_ms: float = 2.0
    microbatch_max: int = 32
    # device mesh: axis names are fixed; shape chosen at engine init
    mesh_data_axis: str = "data"
    mesh_model_axis: str = "model"
    # multi-chip serving: shard every index's doc axis over this many
    # devices (model axis); 1 = single-device; -1 = every visible device
    # (with JAX_COORDINATOR_ADDRESS set, jax.distributed makes that a
    # whole pod slice — slice-major layout via parallel.mesh). Replaces
    # the reference's docker-compose HTTP fan-out
    # (docker-compose.yml:1-23) with ICI all_gather candidate merges.
    n_index_shards: int = 1


class RetrievalConfig(BaseModel):
    # embedding backends: "hash" (self-contained, deterministic) or an HF
    # model name resolvable to local safetensors (BGE semantics: query
    # instruction for queries only, L2-normalized — reference vector_store.py:131-155)
    embedding_backend: str = "hash"
    embedding_model_zh: str = "BAAI/bge-base-zh-v1.5"
    embedding_model_en: str = "BAAI/bge-base-en-v1.5"
    embedding_dim: int = 768
    query_instruction_zh: str = "为这个法律问题生成表示以用于检索相关条文："
    query_instruction_en: str = "Represent this legal question for retrieving relevant provisions: "

    top_k: int = 10
    oversample_factor: int = 4  # per-channel candidate depth = top_k * factor
    dense_weight: float = 0.6
    bm25_weight: float = 0.4
    colbert_weight: float = 0.35
    min_final_score: float = 0.2

    # fusion (reference hybrid_retriever.py:389-551)
    fusion_method: str = "rrf_norm_blend"  # rrf | wrrf | weighted_sum | rrf_norm_blend
    rrf_k: int = 60
    rrf_alpha: float = 0.5

    # BM25 (must match rank_bm25.BM25Okapi math — SURVEY.md §2.9)
    bm25_k1: float = 1.5
    bm25_b: float = 0.75
    bm25_epsilon: float = 0.25

    # graph channel (reference config.py:75-88)
    enable_graph: bool = True
    graph_seed_k: int = 30
    graph_limit: int = 800
    graph_weight: float = 0.2
    graph_min_conf: float = 0.5
    graph_relation_max_depth: Dict[str, int] = Field(default_factory=lambda: {
        "defined_by": 4, "defines_term": 3, "cite": 1, "cited_by": 1,
        "prev": 2, "next": 2, "default": 2,
    })
    graph_depth_decay: float = 0.7
    graph_relation_weights: Dict[str, float] = Field(default_factory=lambda: {
        "defined_by": 1.20, "cite": 1.15, "defines_term": 1.10,
        "prev": 0.95, "next": 0.95, "default": 1.0,
    })

    # late interaction channel (replaces ColBERT/PLAID)
    enable_colbert: bool = True
    colbert_model: str = "jinaai/jina-colbert-v2"

    # HyDE: expand the dense query with an LLM-written hypothetical answer
    # (functional here; the reference declares the flag but never reads it —
    # SURVEY.md §2.13.6)
    enable_hyde: bool = False

    # rerank (reference config.py:119-124)
    enable_rerank: bool = True
    rerank_top_n: int = 30
    rerank_beta: float = 0.35
    reranker_model: str = "BAAI/bge-reranker-v2-m3"
    rerank_use_llm: bool = False
    rerank_llm_top_k_threshold: int = 30
    rerank_norm: str = "minmax"  # minmax | sigmoid | none


class LLMConfig(BaseModel):
    provider: str = "disabled"  # openai | local | local-jax | disabled
    model: str = "gpt-4o-mini"
    api_key: Optional[str] = Field(default_factory=lambda: os.environ.get("OPENAI_API_KEY"))
    base_url: Optional[str] = Field(default_factory=lambda: os.environ.get("OPENAI_BASE_URL"))
    temperature: float = 0.3
    top_p: float = 0.9
    # HF TopKLogitsWarper semantics, applied before top_p (HF's warper
    # order, which the reference inherits silently through
    # model.generate's generation_config defaults); 0 = off. top_k=1
    # reproduces greedy at any temperature. local-jax engines only.
    top_k: int = 0
    # HF MinPLogitsWarper semantics, applied after top_p (HF's order):
    # keep tokens with prob >= min_p * max-prob. 0 = off. local-jax only.
    min_p: float = 0.0
    # local-jax: schema-constrained JSON decoding (models/constrain.py) —
    # a token-level DFA mask guarantees the answer parses as the
    # sections schema the SSE scanner expects; EOS unlocks only when the
    # document is complete. Exact in EVERY engine, incl. the speculative
    # ones (a per-position DFA fold over the drafts inside the verify).
    # Budget-forced completion: near max_new_tokens the mask restricts
    # to transitions that can still finish, so streams whose budget
    # covers the schema's shortest document END COMPLETE, never as a
    # truncated prefix (constrain.py budget_force).
    constrain_json: bool = False
    # HF RepetitionPenaltyLogitsProcessor semantics (the reference's
    # qwen-local passes 1.05); 1.0 = off. Exact in EVERY engine, incl.
    # the speculative ones (verify position i's seen-set is the emitted
    # set plus that round's drafts before i — see spec_decode.py).
    repetition_penalty: float = 1.0
    max_new_tokens: int = 1024
    max_context_tokens: int = 4096
    request_timeout: float = 30.0
    max_retries: int = 2
    retry_backoff: float = 0.6
    # local-jax: tokens decoded per device execution (lax.scan chunk) —
    # each execution costs a host round trip on remote backends
    decode_chunk: int = 8
    # local-jax: prompts longer than this prefill in sequential chunks at
    # cache offsets (exact), capping prefill attention-score memory
    prefill_chunk: int = 1024
    # local-jax: >1 enables continuous batching (models/batched_decoder.py)
    # — that many concurrent answer streams share one batched decode loop;
    # 0/1 keeps the single-stream engine
    batch_slots: int = 0
    # local-jax: >0 enables prompt-lookup speculative decoding with this
    # draft length — RAG answers quote retrieved provisions, so prompt
    # n-gram drafts hit often; greedy output is token-identical to plain
    # decoding. Single-stream (models/spec_decode.py), batched
    # (batch_slots > 1), and paged (paged_kv) engines all support it.
    spec_k: int = 0
    # local-jax, single-stream speculative engine: adaptive speculation —
    # the engine measures its own acceptance over the first probe launch
    # (spec_steps rounds) and, when emitted tokens/round drops below this,
    # stops speculating and finishes the stream with the plain chunked
    # decode program (same output, worst case ≈ plain decode minus one
    # probe). Speculation pays only when generation quotes draftable
    # text — a model/workload property best measured live (round-5
    # on-chip: acceptance 1.01/round on non-quoting output = 0.14×
    # plain; the oracle ceiling 8.47/round = 1.05×). 0 disables.
    spec_adaptive: float = 2.0
    # local-jax: int8 weight quantization of the decoder projections +
    # LM head (models/decoder.py quantize_weights_int8, W8A8) — decode
    # is weights-bandwidth-bound, so int8 weights halve the dominant HBM
    # stream and run s8×s8→s32 on the MXU. Off by default: HF
    # token-parity no longer holds under quantization (the engines stay
    # token-identical to each other); per-element weight error ≤
    # channel-amax/254. Applies to every local-jax engine.
    weight_quant: bool = False
    # bits for weight_quant: 8 (per-channel, W8A8 integer matmuls) or 4
    # (grouped XLA-native int4 — the weight stream drops to a QUARTER of
    # bf16; error ≤ group-amax/14; incl. MoE expert stacks + shared
    # expert, per-(expert, group, channel) scales)
    weight_bits: int = 8
    # local-jax, speculative engines (spec_k > 0): path to a corpus
    # n-gram draft table (.npz from scripts/build_draft_table.py). When a
    # slot's in-sequence prompt lookup misses, the verify program probes
    # this table for the corpus-frequent continuation of the current
    # bigram — first quotes of statute text NOT in the prompt still
    # draft-accelerate. Draft quality only affects speed, never output.
    ngram_draft_path: str = ""
    # local-jax, speculative engines (spec_k > 0, single-stream AND
    # batched): HF name or path of a SMALL decoder to generate drafts —
    # k greedy draft-model steps run INSIDE the verify program
    # (lax.scan, zero extra host dispatches), replacing the
    # prompt-lookup table. Works when answers do not quote the prompt.
    # Draft quality only affects acceptance, never output; vocab must
    # match the target's.
    draft_model: str = ""
    # local-jax: >1 shards the decoder tensor-parallel over that many
    # local devices (parallel/decoder_tp.py) — Megatron-style column/row
    # parallel projections via GSPMD, composing with any decode engine
    tp_shards: int = 0
    # local-jax: >1 serves that many independent engine REPLICAS, one per
    # device (or per tp_shards-wide submesh — DP×TP), behind one
    # least-busy admission front (parallel/decoder_dp.py). No
    # cross-replica communication; aggregate tokens/s scales with
    # replicas. The TPU-native replacement for the reference's
    # docker-compose HTTP replica scale-out.
    dp_replicas: int = 0
    # local-jax: int8 KV cache (models/decoder.py quantize_kv) — nearly
    # halves the decode-time cache HBM read and footprint (≈2× context or
    # batch slots in the same budget) for a ≤1/254-of-row-amax per-element
    # error; applies to every engine. Off by default: exact greedy
    # token-parity with HF is part of the local-jax contract.
    kv_quant: bool = False
    # local-jax, batched engine: pin ONE physically shared copy of this
    # rendered system prelude's KV rows; every request whose token ids
    # start with it attends the pinned segment instead of installing its
    # own copy (S x less prefix HBM). Tokenization-boundary mismatches
    # degrade gracefully to the unshared path. Composes with
    # prefix_cache: matching prompts use a suffix-keyed LRU whose
    # entries never duplicate the pinned segment.
    shared_prefix_text: str = ""
    # local-jax, batched serving: serve the continuous batch from ONE
    # paged KV block pool with radix-tree prefix reuse
    # (models/paged_decoder.py) instead of per-slot contiguous stripes —
    # prompts sharing a token prefix (system template, few-shot block,
    # repeated candidates) attach the same physical KV blocks by
    # reference, finished prompts stay cached until evicted, and HBM is
    # bounded by the pool, not slots × max_len. Subsumes
    # shared_prefix_text and prefix_cache (ignore those when set);
    # constrain_json is supported, and spec_k > 0 runs the batched
    # speculation rounds (lookup + ngram_draft_path + draft_model) over
    # block tables.
    paged_kv: bool = False
    # paged_kv: tokens per KV block (sharing granularity; max_len must
    # be a multiple) and total pool blocks (0 = (slots+1) * max_len/BS)
    kv_block_size: int = 64
    kv_pool_blocks: int = 0
    # local-jax: >0 keeps the KV rows of that many recent prompts and
    # prefills only the suffix on an exact shared token prefix — RAG
    # prompts share the system template + few-shot example, so
    # time-to-first-token scales with the per-request candidates only.
    # Applies to every engine (incl. batched admission).
    prefix_cache: int = 0


class RoutingConfig(BaseModel):
    llm_based: bool = False
    issue_llm_refine: bool = False


class PDFConfig(BaseModel):
    enable_docling: bool = False
    enable_ocr: bool = False
    chunk_chars: int = 650
    chunk_overlap: int = 90
    min_statute_records: int = 20
    statute_coverage_min: float = 0.3
    statute_gap_ratio_max: float = 0.5
    statute_avg_len_ratio_max: float = 0.12
    ingest_rebuild_colbert: bool = True
    ingest_rebuild_graph: bool = True


class ServerConfig(BaseModel):
    host: str = "0.0.0.0"
    port: int = int(os.environ.get("PORT", "8000"))
    retrieve_cache_ttl: float = 900.0  # 15 min (reference server.py:270-281)
    cors_allow_all: bool = True
    # Pre-compile micro-batch bucket programs up to this batch size during
    # startup warmup (powers of two). A cold bucket's first concurrent
    # burst otherwise pays the whole compile in-request — the dominant p95
    # spike on remote-compile backends. 0 disables.
    prewarm_buckets: int = 16
    # graceful SIGTERM drain: /ready flips to 503 immediately (load
    # balancers stop routing), in-flight requests get this many seconds,
    # then the listener stops and the generation engine closes.
    drain_grace_s: float = 5.0


class AppConfig(BaseModel):
    lang: str = "zh"
    paths: PathsConfig = Field(default_factory=PathsConfig)
    engine: EngineConfig = Field(default_factory=EngineConfig)
    retrieval: RetrievalConfig = Field(default_factory=RetrievalConfig)
    llm: LLMConfig = Field(default_factory=LLMConfig)
    routing: RoutingConfig = Field(default_factory=RoutingConfig)
    pdf: PDFConfig = Field(default_factory=PDFConfig)
    server: ServerConfig = Field(default_factory=ServerConfig)
    index_version: Optional[str] = None

    # ------------------------------------------------------------------
    @classmethod
    def load(cls, path: Optional[str | Path] = None, *, mkdirs: bool = True) -> "AppConfig":
        """Build config from defaults, optionally overlaid with a JSON/YAML file.

        Mirrors reference ``AppConfig.load`` (``config.py:217-225``): file values
        override defaults field-wise; the data tree is created on load; the
        active index version comes from ``LEGALRAG_INDEX_VERSION`` or the
        registry ACTIVE file (``config.py:168-177,231``).
        """
        data: Dict[str, Any] = {}
        if path is not None:
            text = Path(path).read_text(encoding="utf-8")
            if str(path).endswith((".yaml", ".yml")):
                try:
                    import yaml  # type: ignore

                    data = yaml.safe_load(text) or {}
                except ImportError as e:
                    raise RuntimeError("YAML config requires pyyaml; use JSON instead") from e
            else:
                data = json.loads(text)
        cfg = cls.model_validate(data)
        cfg.index_version = os.environ.get("LEGALRAG_INDEX_VERSION", cfg.index_version)
        cfg._apply_lang_paths(cfg.lang)
        if mkdirs:
            cfg.paths.ensure_tree()
        return cfg

    def with_lang(self, lang: str) -> "AppConfig":
        """Deep-copy with corpus/index/graph paths + models swapped per language.

        Mirrors reference ``AppConfig.with_lang`` (``config.py:248-274``).
        """
        cfg = copy.deepcopy(self)
        cfg.lang = lang
        cfg._apply_lang_paths(lang)
        return cfg

    def _apply_lang_paths(self, lang: str) -> None:
        p = self.paths
        p.corpus_file = Path(p.processed_dir) / f"law_{lang}.jsonl"
        base = Path(p.index_dir) / lang
        if self.index_version:
            base = base / "versions" / self.index_version
        else:
            # honor the registry ACTIVE file if present
            from legalrag_tpu.index.registry import IndexRegistry

            base = IndexRegistry(Path(p.index_dir) / lang).active_index_dir()
        p.lang_index_dir = base
        p.graph_file = Path(p.graph_dir) / f"law_graph_{lang}.jsonl"

    # convenience accessors -------------------------------------------------
    @property
    def embedding_model(self) -> str:
        r = self.retrieval
        return r.embedding_model_zh if self.lang == "zh" else r.embedding_model_en

    @property
    def query_instruction(self) -> str:
        r = self.retrieval
        return r.query_instruction_zh if self.lang == "zh" else r.query_instruction_en
