"""Word-embedding extraction from pretrained transformers (TextSGC_Bio L9).

Re-implements the reference's BioBERT embedding extractor
(``downstream/TextSGC_Bio/run_embedding.py:101-222`` — the ``Embedder``
class, pooling modes at ``:190-212``, h5 store at ``:214-219``; tokenizer
and dataset plumbing in ``utils_embedding.py:27-106,113-149``) as a
TPU-first pipeline:

* the transformer forward runs through **Flax/JAX** (`FlaxAutoModel`) when
  the flax weights are available, so extraction is jitted and batched onto
  the TPU MXU; the torch (CPU) model is the fallback, and a deterministic
  hash-random embedder backs both off so the downstream graph pipeline is
  testable hermetically with no model downloads.
* vocabulary words are tokenized, bucketed by padded length and batched to
  **static shapes** so XLA compiles one program per bucket instead of one
  per sentence (the reference feeds one word per step through a
  DataLoader, ``run_embedding.py:157-189``).
* subword pooling modes ``none | first | mean | sum`` match
  ``run_embedding.py:190-212``.
* the store is a plain ``.npz`` (keys = words) instead of h5py groups —
  ``load_embedding_map`` returns the ``dict[str, np.ndarray]`` consumed by
  :class:`sgc_tpu.textgraph.graph.TextGraphBuilder` (``embeddings=`` →
  cosine+PMI word-word weights, reference ``build_graph_v2.py:216-242``).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np

POOLING_MODES = ("none", "first", "mean", "sum")


# ---------------------------------------------------------------------------
# Store: word -> vector, persisted as one npz
# ---------------------------------------------------------------------------


def save_embedding_map(path: str | Path, table: dict[str, np.ndarray]) -> None:
    """Persist a word->vector map (npz; the reference used h5py groups)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **{w: np.asarray(v) for w, v in table.items()})


def load_embedding_map(path: str | Path) -> dict[str, np.ndarray]:
    """Load a word->vector map saved by :func:`save_embedding_map`."""
    with np.load(Path(path), allow_pickle=False) as z:
        return {w: z[w] for w in z.files}


# ---------------------------------------------------------------------------
# Deterministic fallback embedder (hermetic tests, no downloads)
# ---------------------------------------------------------------------------


def hash_embedding(word: str, dim: int = 64) -> np.ndarray:
    """Deterministic pseudo-embedding from a hash of the word.

    Unit-norm so cosine similarities are well-defined; used when no
    pretrained model is available (zero-egress environments) and in tests.
    """
    seed = int.from_bytes(hashlib.sha256(word.encode()).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / (np.linalg.norm(v) + 1e-12)


# ---------------------------------------------------------------------------
# Transformer embedder
# ---------------------------------------------------------------------------


@dataclass
class EmbedderConfig:
    model_name: str = "bert-base-uncased"
    pooling: str = "mean"          # none | first | mean | sum
    layer: int = -1                # hidden-states layer to read (-1 = last)
    batch_size: int = 64
    max_length: int = 16           # subword budget per vocab word
    backend: str = "auto"          # auto | flax | torch | hash
    hash_dim: int = 64             # fallback dimensionality


@dataclass
class WordEmbedder:
    """Extract one vector per vocabulary word from a pretrained encoder.

    Mirrors ``run_embedding.py``'s Embedder: tokenize each word, run the
    encoder, pool the subword token embeddings. TPU-native: the flax
    backend jits a fixed-shape forward per (batch, length) bucket.
    """

    config: EmbedderConfig = field(default_factory=EmbedderConfig)

    def __post_init__(self):
        self._backend = None
        self._model = None
        self._tokenizer = None

    # -- backend resolution -------------------------------------------------

    def _resolve_backend(self) -> str:
        if self._backend is not None:
            return self._backend
        want = self.config.backend
        if want == "hash":
            self._backend = "hash"
            return self._backend
        errors: list[str] = []
        try:
            from transformers import AutoTokenizer  # noqa: F401
        except Exception as e:
            errors.append(f"transformers unavailable: {e}")
        else:
            order = {
                "auto": ("flax", "torch"),
                "flax": ("flax",),
                "torch": ("torch",),
            }[want]
            for cand in order:
                try:
                    self._load_model(cand)
                    self._backend = cand
                    return self._backend
                except Exception as e:
                    errors.append(f"{cand}: {type(e).__name__}: {e}")
        if want != "auto":
            # an explicitly requested backend must not silently degrade
            # into hash pseudo-embeddings — downstream cosine edge weights
            # would be garbage with no error
            raise RuntimeError(
                f"embedding backend {want!r} for model "
                f"{self.config.model_name!r} failed to load: "
                + "; ".join(errors)
            )
        import warnings

        warnings.warn(
            "no pretrained embedding backend available "
            f"({'; '.join(errors)}); falling back to deterministic hash "
            "pseudo-embeddings",
            stacklevel=3,
        )
        self._backend = "hash"
        return self._backend

    def _load_model(self, backend: str) -> None:
        from transformers import AutoTokenizer

        self._tokenizer = AutoTokenizer.from_pretrained(self.config.model_name)
        if backend == "flax":
            from transformers import FlaxAutoModel

            self._model = FlaxAutoModel.from_pretrained(self.config.model_name)
        else:
            import torch
            from transformers import AutoModel

            self._model = AutoModel.from_pretrained(
                self.config.model_name, output_hidden_states=True
            )
            self._model.eval()
            torch.set_grad_enabled(False)

    # -- pooling (reference run_embedding.py:190-212) -----------------------

    def _pool(self, token_vecs: np.ndarray) -> np.ndarray:
        mode = self.config.pooling
        if mode not in POOLING_MODES:
            raise ValueError(f"unknown pooling {mode!r}; one of {POOLING_MODES}")
        if mode == "none":
            return token_vecs
        if mode == "first":
            return token_vecs[0]
        if mode == "sum":
            return token_vecs.sum(axis=0)
        return token_vecs.mean(axis=0)

    # -- batched forward ----------------------------------------------------

    def _encode_batch_flax(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        import jax

        if not hasattr(self, "_jitted"):
            model = self._model

            def fwd(input_ids, attention_mask):
                out = model(
                    input_ids=input_ids,
                    attention_mask=attention_mask,
                    output_hidden_states=True,
                )
                return out.hidden_states[self.config.layer]

            self._jitted = jax.jit(fwd)
        return np.asarray(self._jitted(ids, mask))

    def _encode_batch_torch(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        import torch

        out = self._model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        )
        return out.hidden_states[self.config.layer].numpy()

    # -- public API ---------------------------------------------------------

    def embed_words(self, words: Sequence[str]) -> dict[str, np.ndarray]:
        """Return word -> pooled vector for every word in ``words``."""
        backend = self._resolve_backend()
        if backend == "hash":
            return {w: hash_embedding(w, self.config.hash_dim) for w in words}

        cfg = self.config
        table: dict[str, np.ndarray] = {}
        # Bucket words into fixed-shape batches (static shapes for XLA).
        for start in range(0, len(words), cfg.batch_size):
            chunk = list(words[start : start + cfg.batch_size])
            enc = self._tokenizer(
                chunk,
                padding="max_length",
                truncation=True,
                max_length=cfg.max_length,
                return_tensors="np",
            )
            ids = enc["input_ids"].astype(np.int32)
            mask = enc["attention_mask"].astype(np.int32)
            if ids.shape[0] < cfg.batch_size:  # pad batch to static size
                pad = cfg.batch_size - ids.shape[0]
                ids = np.pad(ids, ((0, pad), (0, 0)))
                mask = np.pad(mask, ((0, pad), (0, 0)))
            if backend == "flax":
                hidden = self._encode_batch_flax(ids, mask)
            else:
                hidden = self._encode_batch_torch(ids, mask)
            for i, w in enumerate(chunk):
                n_tok = int(mask[i].sum())
                # strip [CLS]/[SEP]-style specials when present (>=3 tokens)
                lo, hi = (1, n_tok - 1) if n_tok >= 3 else (0, n_tok)
                table[w] = self._pool(hidden[i, lo:hi].astype(np.float32))
        return table

    def embed_vocab_to_file(
        self, words: Iterable[str], path: str | Path
    ) -> dict[str, np.ndarray]:
        table = self.embed_words(list(words))
        save_embedding_map(path, table)
        return table
