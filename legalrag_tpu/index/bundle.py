"""IndexBundle: the per-language index artifact set.

Replaces the reference's artifact trio — ``faiss.index`` + ``faiss_meta.jsonl``,
``bm25.pkl``, ``colbert/`` (SURVEY.md §1 L3) — with one directory holding:

- ``manifest.json`` — schema version, counts, dims, generation counter
- ``chunks.jsonl``  — row-ordered LawChunk records (row id = line number,
  shared by every channel; same convention as faiss_meta.jsonl)
- ``dense.npz`` / ``bm25.npz`` / ``tokens.npz`` — channel payloads
- ``encoder.npz``  — encoder state (hash sketch df table) so queries embed
  identically at serve time

The generation counter replaces the reference's file-mtime hot-reload
(``vector_store.py:95-129``): a serving engine reloads when the manifest
generation advances.

Incremental semantics mirror the reference (SURVEY.md §2.3): dense/token
channels append in place (meta written before activation); BM25 rebuilds its
global statistics.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from legalrag_tpu.config import AppConfig
from legalrag_tpu.corpus.loader import iter_chunks_from_file, write_chunks_jsonl
from legalrag_tpu.index.bm25_index import BM25Index
from legalrag_tpu.index.dense_index import DenseIndex
from legalrag_tpu.index.token_index import TokenIndex
from legalrag_tpu.models.hash_encoder import HashEncoder
from legalrag_tpu.schemas import LawChunk
from legalrag_tpu.utils import get_logger

log = get_logger("index.bundle")

SCHEMA_VERSION = 1


class StaleIndexError(RuntimeError):
    """The stored index was built with a different host featurization
    (tokenize.TOKENIZE_FINGERPRINT) than this code emits at query time.
    Serving it would silently skew every channel — query BM25 terms
    missing from the stored vocab, hash-encoder query vectors diverging
    from the stored doc vectors (ADVICE r4). Rebuild with
    ``python -m scripts.build_index``."""


def _make_token_index(token_dim: int, e, device):
    """Token store per ``engine.token_dtype``: bf16/int8 TokenIndex or the
    PLAID-class nbit4 residual store."""
    td = e.token_dtype or e.dtype
    if td == "nbit4":
        from legalrag_tpu.index.token_index import Residual4TokenIndex

        return Residual4TokenIndex(token_dim, e.late_doc_maxlen,
                                   capacity_round=e.capacity_round,
                                   device=device)
    return TokenIndex(token_dim, e.late_doc_maxlen, td, e.capacity_round,
                      device)


class IndexBundle:
    def __init__(self, lang: str, cfg: AppConfig, device=None):
        self.lang = lang
        self.cfg = cfg
        self.device = device
        self.chunks: List[LawChunk] = []
        self.id2row: Dict[str, int] = {}
        r, e = cfg.retrieval, cfg.engine
        self.encoder: HashEncoder | object = None  # set in build/load
        self.dense = DenseIndex(r.embedding_dim, e.dtype, e.capacity_round, device)
        self.bm25 = BM25Index(lang, r.bm25_k1, r.bm25_b, r.bm25_epsilon, device)
        self.tokens = _make_token_index(e.late_dim, e, device)
        self.generation = 0
        # multi-chip serving: set via enable_sharding(); shard_views() then
        # serves doc-axis-sharded copies of the index arrays
        self.mesh = None
        self._shard_views = None

    # ----------------------------------------------------------------- build
    @classmethod
    def build_from_chunks(cls, chunks: Sequence[LawChunk], cfg: AppConfig,
                          lang: str, device=None,
                          encoder: Optional[object] = None) -> "IndexBundle":
        from legalrag_tpu.models.encoder import get_encoder

        b = cls(lang, cfg, device)
        b.encoder = encoder or get_encoder(cfg, lang, device)
        # the encoder's actual dims win over config defaults (a bert model's
        # hidden size need not match retrieval.embedding_dim)
        e = cfg.engine
        if getattr(b.encoder, "dim", b.dense.dim) != b.dense.dim:
            b.dense = DenseIndex(b.encoder.dim, e.dtype, e.capacity_round,
                                 device)
        if getattr(b.encoder, "token_dim", b.tokens.token_dim) != b.tokens.token_dim:
            b.tokens = _make_token_index(b.encoder.token_dim, e, device)
        texts = [c.text for c in chunks]
        if hasattr(b.encoder, "fit_idf"):
            b.encoder.fit_idf(texts)
        b._append(list(chunks))
        return b

    def _append(self, chunks: List[LawChunk]) -> int:
        """Append chunks new to this bundle; returns number added."""
        fresh = [c for c in chunks if c.id not in self.id2row]
        if not fresh:
            return 0
        texts = [c.text for c in fresh]
        t0 = time.time()
        vecs = self.encoder.encode_passages(texts)
        if self.cfg.retrieval.enable_colbert:
            tok, mask = self.encoder.encode_tokens(texts, self.tokens.doc_maxlen)
        t_enc = time.time() - t0
        for c in fresh:
            self.id2row[c.id] = len(self.chunks)
            self.chunks.append(c)
        self.dense.add(np.asarray(vecs))
        if self.cfg.retrieval.enable_colbert:
            self.tokens.add(tok, mask)
        t0 = time.time()
        self.bm25.add_texts(texts) if self.bm25.n else self.bm25.build_from_texts(
            [c.text for c in self.chunks])
        log.info("[%s] appended %d chunks (encode %.2fs, bm25 %.2fs) -> n=%d",
                 self.lang, len(fresh), t_enc, time.time() - t0, len(self.chunks))
        self.generation += 1
        return len(fresh)

    def add_chunks(self, chunks: Sequence[LawChunk]) -> int:
        """Incremental add (online ingest path). Dedup by chunk id, mirroring
        ``IncrementalDenseBuilder.add_jsonl`` (reference
        ``incremental_dense_builder.py:45-76``)."""
        if hasattr(self.encoder, "fit_idf"):
            fresh = [c for c in chunks if c.id not in self.id2row]
            self.encoder.fit_idf([c.text for c in fresh])
        return self._append(list(chunks))

    # ----------------------------------------------------------------- query
    def row_chunks(self, rows: Sequence[int]) -> List[LawChunk]:
        return [self.chunks[r] for r in rows]

    @property
    def n_docs(self) -> int:
        return len(self.chunks)

    # --------------------------------------------------------------- sharding
    def enable_sharding(self, mesh) -> None:
        """Serve this bundle's indexes sharded over ``mesh``'s model axis
        (``engine.n_index_shards``). The originals stay untouched so
        incremental adds keep working; ``shard_views()`` refreshes the
        sharded copies whenever the generation advances."""
        self.mesh = mesh
        self._shard_views = None

    def shard_views(self) -> Optional[Dict]:
        """Doc-axis-sharded (padded) copies of emb/impact/tokens for
        ``parallel.sharded_search.sharded_channels_topk``. Returns None when
        sharding is off or the bundle is empty."""
        if self.mesh is None or self.dense.n == 0:
            return None
        key = (self.generation, self.dense.n)
        if self._shard_views is not None and self._shard_views[0] == key:
            return self._shard_views[1]
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from legalrag_tpu.parallel.mesh import MODEL_AXIS

        s = self.mesh.shape[MODEL_AXIS]
        # the shared doc-axis capacity must cover BOTH the dense capacity
        # and the impact matrix's own 128-rounded doc axis (they round
        # independently; with small capacity_round the impact axis is the
        # larger one) — and divide evenly across the shards
        n_impact = self.bm25.impact.shape[1]
        cap = -(-max(self.dense.capacity, n_impact, 1) // s) * s

        def pad_rows(arr, target, fill=0):
            if arr.shape[0] == target:
                return arr
            widths = [(0, target - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
            return jnp.pad(arr, widths, constant_values=fill)

        views = {
            "emb": jax.device_put(pad_rows(self.dense.emb, cap),
                                  NamedSharding(self.mesh, P(MODEL_AXIS, None))),
            # impact is [V_pad, N_pad] with N_pad ≤ cap (128-rounding vs the
            # dense capacity rounding) — pad columns to cap and column-shard
            "impact": jax.device_put(
                jnp.pad(self.bm25.impact,
                        [(0, 0), (0, cap - self.bm25.impact.shape[1])]),
                NamedSharding(self.mesh, P(None, MODEL_AXIS))),
        }
        if (self.cfg.retrieval.enable_colbert and self.tokens.n
                and self.tokens.n == self.dense.n):
            if isinstance(self.tokens.tok, tuple):
                # compressed (nbit4) store: reconstruct PER SHARD on the
                # host via make_array_from_callback — each shard
                # dequantizes only its own row slice, so the full-size f32
                # tensor (~100x the packed store at corpus scale) never
                # materializes on any one device or in one host buffer
                L, dt = self.tokens.doc_maxlen, self.tokens.token_dim
                dtype = jnp.dtype(self.cfg.engine.dtype)

                def _slice(index, which):
                    rows = index[0]
                    start = rows.start or 0
                    stop = rows.stop if rows.stop is not None else cap
                    if which == "mask":
                        # mask shards never need token reconstruction —
                        # dequantized_rows would rebuild the full f32
                        # slice (centroid gather + nibble unpack) only to
                        # discard it (ADVICE r2)
                        out = np.asarray(self.tokens.mask[start:stop])
                    else:
                        out, _ = self.tokens.dequantized_rows(start, stop)
                    if out.shape[0] < stop - start:  # beyond store capacity
                        pad = [(0, stop - start - out.shape[0])] \
                            + [(0, 0)] * (out.ndim - 1)
                        out = np.pad(out, pad)
                    return out.astype(dtype) if which == "tok" else out

                views["tok"] = jax.make_array_from_callback(
                    (cap, L, dt),
                    NamedSharding(self.mesh, P(MODEL_AXIS, None, None)),
                    lambda idx: _slice(idx, "tok"))
                views["mask"] = jax.make_array_from_callback(
                    (cap, L),
                    NamedSharding(self.mesh, P(MODEL_AXIS, None)),
                    lambda idx: _slice(idx, "mask"))
            else:
                views["tok"] = jax.device_put(
                    pad_rows(self.tokens.tok, cap),
                    NamedSharding(self.mesh, P(MODEL_AXIS, None, None)))
                views["mask"] = jax.device_put(
                    pad_rows(self.tokens.mask, cap),
                    NamedSharding(self.mesh, P(MODEL_AXIS, None)))
        self._shard_views = (key, views)
        log.info("[%s] sharded index views over %d devices (cap=%d)",
                 self.lang, s, cap)
        return views

    # --------------------------------------------------------------- persist
    def save(self, index_dir: str | Path) -> None:
        from legalrag_tpu.utils.filelock import file_lock

        d = Path(index_dir)
        d.mkdir(parents=True, exist_ok=True)
        with file_lock(d / ".lock"):
            self._save_locked(d)

    def _save_locked(self, d: Path) -> None:
        # meta before payloads: a crash can leave extra meta but never a
        # payload row without meta (ordering per incremental_dense_builder.py:64)
        write_chunks_jsonl(self.chunks, d / "chunks.jsonl")
        self.dense.save(d / "dense.npz")
        self.bm25.save(d / "bm25.npz")
        if self.cfg.retrieval.enable_colbert:
            self.tokens.save(d / "tokens.npz")
        if hasattr(self.encoder, "state"):
            np.savez_compressed(d / "encoder.npz", **self.encoder.state())
        from legalrag_tpu.tokenize.tokenizers import TOKENIZE_FINGERPRINT

        manifest = {
            "schema_version": SCHEMA_VERSION,
            "tokenize_fingerprint": TOKENIZE_FINGERPRINT,
            "lang": self.lang,
            "n_docs": self.n_docs,
            "dim": self.dense.dim,
            "token_dim": self.tokens.token_dim,
            "doc_maxlen": self.tokens.doc_maxlen,
            "generation": self.generation,
            "embedding_backend": self.cfg.retrieval.embedding_backend,
            "created_unix": time.time(),
        }
        tmp = d / "manifest.json.tmp"
        tmp.write_text(json.dumps(manifest, indent=2), encoding="utf-8")
        os.replace(tmp, d / "manifest.json")
        log.info("[%s] saved index (n=%d) -> %s", self.lang, self.n_docs, d)

    @classmethod
    def load(cls, index_dir: str | Path, cfg: AppConfig, lang: str,
             device=None) -> "IndexBundle":
        from legalrag_tpu.tokenize.tokenizers import TOKENIZE_FINGERPRINT

        d = Path(index_dir)
        manifest = json.loads((d / "manifest.json").read_text(encoding="utf-8"))
        stored = manifest.get("tokenize_fingerprint", "v1")
        if stored != TOKENIZE_FINGERPRINT:
            raise StaleIndexError(
                f"index {d} was built with tokenize fingerprint "
                f"'{stored}' but this code emits '{TOKENIZE_FINGERPRINT}'"
                " — query featurization would diverge from the stored "
                "doc vectors; rebuild with scripts/build_index")
        b = cls(lang, cfg, device)
        b.generation = int(manifest.get("generation", 0))
        b.chunks = list(iter_chunks_from_file(d / "chunks.jsonl"))
        b.id2row = {c.id: i for i, c in enumerate(b.chunks)}
        enc_path = d / "encoder.npz"
        if manifest.get("embedding_backend", "hash") == "hash" and enc_path.exists():
            z = np.load(enc_path, allow_pickle=False)
            b.encoder = HashEncoder.from_state({k: z[k] for k in z.files},
                                               device=device)
        else:
            from legalrag_tpu.models.encoder import get_encoder

            b.encoder = get_encoder(cfg, lang, device)
        e = cfg.engine
        b.dense = DenseIndex.load(d / "dense.npz", e.dtype, e.capacity_round, device)
        b.bm25 = BM25Index.load(d / "bm25.npz", device)
        tok_path = d / "tokens.npz"
        if cfg.retrieval.enable_colbert and tok_path.exists():
            b.tokens = TokenIndex.load(tok_path, e.dtype, e.capacity_round, device)
        # chunks.jsonl may lead payload rows after a crash (meta-first write
        # ordering); trim the view to the payload row count
        n = min(b.n_docs, b.dense.n)
        if n < b.n_docs:
            log.warning("[%s] trimming %d meta rows without payload",
                        lang, b.n_docs - n)
            b.chunks = b.chunks[:n]
            b.id2row = {c.id: i for i, c in enumerate(b.chunks)}
        return b

    @staticmethod
    def exists(index_dir: str | Path) -> bool:
        return (Path(index_dir) / "manifest.json").exists()
