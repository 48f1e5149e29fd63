"""Deterministic hashed-feature encoder.

A weight-free embedding model: texts are hashed into a signed feature sketch
on the host (words + char n-grams, tf-log + idf weighting), then projected to
the embedding dimension by a fixed PRNG Gaussian matrix **on device** (one
MXU matmul) and L2-normalized. Johnson–Lindenstrauss: cosine similarity of
the projections approximates cosine of the (idf-weighted) lexical sketches,
so this behaves as a fuzzy lexical retriever — robust to morphology via char
n-grams, bilingual, and fully reproducible from (seed, sketch_dim, dim, df).

It fills the role BGE fills in the reference (``vector_store.py:131-155``)
when no pretrained weights are present; the ``bert`` backend supersedes it
where BGE safetensors are available. The query-instruction semantics of BGE
are a no-op here (an instruction prefix would only pollute the sketch).

Token-level vectors for the late-interaction channel hash each token (plus
its char n-grams) directly into ``token_dim`` signed dimensions — MaxSim over
these is fuzzy token-level matching, the ColBERT analogue.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from legalrag_tpu.tokenize import char_ngrams, fnv1a, hash_features, tokenize
from legalrag_tpu.tokenize.tokenizers import fnv1a_batch
from legalrag_tpu.utils.device import on_device


class HashEncoder:
    def __init__(self, lang: str, dim: int = 768, sketch_dim: int = 16384,
                 token_dim: int = 128, seed: int = 7, device=None,
                 df: Optional[np.ndarray] = None, n_docs: int = 0,
                 proj: Optional[np.ndarray] = None):
        self.lang = lang
        self.dim = dim
        self.sketch_dim = sketch_dim
        self.token_dim = token_dim
        self.seed = seed
        self.device = device
        self.df = (np.zeros(sketch_dim, np.int64) if df is None
                   else np.asarray(df, np.int64))
        self.n_docs = int(n_docs)
        # trained projection (contrastive adaptation, scripts.train_encoder)
        # overrides the default PRNG Gaussian when present
        self.trained_proj = None if proj is None else np.asarray(proj, np.float32)
        self._proj = None  # device [sketch_dim, dim]
        self._tok_cache: Dict[str, np.ndarray] = {}

    def set_projection(self, proj: np.ndarray) -> None:
        assert proj.shape == (self.sketch_dim, self.dim)
        self.trained_proj = np.asarray(proj, np.float32)
        self._proj = None  # re-materialize on next use

    # ------------------------------------------------------------------ idf
    def _buckets_signs(self, text: str):
        feats = hash_features(text, self.lang)
        h = fnv1a_batch(feats, self.seed)
        buckets = (h % np.uint64(self.sketch_dim)).astype(np.int64)
        signs = np.where((h >> np.uint64(62)) & np.uint64(1), 1.0, -1.0
                         ).astype(np.float32)
        return buckets, signs

    def fit_idf(self, texts: List[str]) -> None:
        """Accumulate document frequencies per sketch bucket (build time)."""
        for t in texts:
            b, _ = self._buckets_signs(t)
            self.df[np.unique(b)] += 1
        self.n_docs += len(texts)

    def _idf(self) -> np.ndarray:
        n = max(self.n_docs, 1)
        return np.log1p((n - self.df + 0.5) / (self.df + 0.5)).astype(np.float32)

    # ---------------------------------------------------------------- sketch
    def _sketch(self, texts: List[str], query: bool = False) -> np.ndarray:
        """Signed-count sketch with sublinear tf and bucket idf:
        ``s[b] = Σ_occurrences sign(feature)`` then
        ``out[b] = sign(s) · (1 + ln|s|) · idf[b]``.

        All texts' features hash in ONE vectorized pass (serving-latency
        hot path: per-text hashing cost ~2.3 ms/query before batching)."""
        from legalrag_tpu.native import fnv1a64_batch, sketch_accumulate

        idf = self._idf() if self.n_docs else None
        n = len(texts)
        feats: List[str] = []
        rows: List[int] = []
        for i, text in enumerate(texts):
            fs = hash_features(text, self.lang, query=query)
            feats.extend(fs)
            rows.extend([i] * len(fs))
        h = fnv1a64_batch(feats, self.seed)
        out = sketch_accumulate(h, np.asarray(rows, np.int32), n,
                                self.sketch_dim)
        nz = out != 0
        out[nz] = np.sign(out[nz]) * (1.0 + np.log(np.abs(out[nz])))
        if idf is not None:
            out *= idf[None, :]
        return out

    # ------------------------------------------------------------ projection
    def _projection(self) -> jax.Array:
        if self._proj is None:
            with on_device(self.device):
                if self.trained_proj is not None:
                    proj = jnp.asarray(self.trained_proj)
                else:
                    key = jax.random.PRNGKey(self.seed)
                    proj = jax.random.normal(key, (self.sketch_dim, self.dim),
                                             dtype=jnp.float32) / np.sqrt(self.dim)
                if self.device is not None:
                    proj = jax.device_put(proj, self.device)
                self._proj = proj
        return self._proj

    def _project(self, sketch: np.ndarray) -> np.ndarray:
        proj = self._projection()
        with on_device(self.device):
            x = jnp.asarray(sketch)
            if self.device is not None:
                x = jax.device_put(x, self.device)
            y = _project_norm(x, proj)
        return np.asarray(y)

    # ---------------------------------------------------------------- public
    def encode_passages(self, texts: List[str]) -> np.ndarray:
        return self._project(self._sketch(texts))

    def encode_queries(self, texts: List[str]) -> np.ndarray:
        # query=True: liberal section-ref emission (tokenizers.py) — a
        # bare citation query must reach the cue-gated doc-side term
        return self._project(self._sketch(texts, query=True))

    def encode_queries_device(self, texts: List[str]) -> jax.Array:
        """Device-resident query embeddings — no host round trip (serving
        path: the result feeds the fused program directly)."""
        proj = self._projection()
        with on_device(self.device):
            x = jnp.asarray(self._sketch(texts, query=True))
            if self.device is not None:
                x = jax.device_put(x, self.device)
            return _project_norm(x, proj)

    def encode_tokens(self, texts: List[str], maxlen: int,
                      query: bool = False
                      ) -> Tuple[np.ndarray, np.ndarray]:
        emb = np.zeros((len(texts), maxlen, self.token_dim), np.float32)
        mask = np.zeros((len(texts), maxlen), bool)
        for i, text in enumerate(texts):
            toks = tokenize(text, self.lang, query)[:maxlen]
            for j, tok in enumerate(toks):
                emb[i, j] = self._token_vec(tok)
                mask[i, j] = True
        return emb, mask

    def _token_vec(self, token: str) -> np.ndarray:
        v = self._tok_cache.get(token)
        if v is not None:
            return v
        feats = [token]
        if self.lang != "zh" and len(token) > 3:
            feats.extend(char_ngrams(token))
        elif self.lang == "zh" and len(token) > 1:
            feats.extend(token)  # component chars
        v = np.zeros(self.token_dim, np.float32)
        h = fnv1a_batch(feats, self.seed + 1)
        np.add.at(v, (h % np.uint64(self.token_dim)).astype(np.int64),
                  np.where((h >> np.uint64(62)) & np.uint64(1), 1.0, -1.0))
        norm = np.linalg.norm(v)
        v = (v / norm if norm > 0 else v).astype(np.float32)
        if len(self._tok_cache) < 1_000_000:
            self._tok_cache[token] = v
        return v

    # -------------------------------------------------------------- persist
    def state(self) -> Dict:
        out = {"lang": self.lang, "dim": self.dim,
               "sketch_dim": self.sketch_dim, "token_dim": self.token_dim,
               "seed": self.seed, "df": self.df, "n_docs": self.n_docs}
        if self.trained_proj is not None:
            out["proj"] = self.trained_proj.astype(np.float16)
        return out

    @classmethod
    def from_state(cls, state: Dict, device=None) -> "HashEncoder":
        proj = state["proj"] if "proj" in getattr(state, "files", state) else None
        return cls(lang=str(state["lang"]), dim=int(state["dim"]),
                   sketch_dim=int(state["sketch_dim"]),
                   token_dim=int(state["token_dim"]), seed=int(state["seed"]),
                   device=device, df=state["df"], n_docs=int(state["n_docs"]),
                   proj=None if proj is None else np.asarray(proj, np.float32))


@jax.jit
def _project_norm(x: jax.Array, proj: jax.Array) -> jax.Array:
    y = jnp.dot(x, proj, preferred_element_type=jnp.float32)
    return y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-9)
