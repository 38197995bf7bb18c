"""Skip-gram word2vec trained with JAX — TPU-native replacement for gensim.

The reference trains/fine-tunes gensim Word2Vec over the cleaned corpus and
exports nearest-neighbor lists (``downstream/TextSGC_indexing/word2vec.py:16-76``
training, ``:128-150`` nearest-neighbor export). gensim is a CPU C-loop
library; here the whole trainer is a jitted JAX program:

* skip-gram pairs are generated **vectorized** from the integer-encoded
  token streams (no Python window loops),
* training is mini-batched skip-gram with negative sampling (SGNS):
  each step is one fused XLA program — embedding gathers, logits via
  elementwise dot (VPU), sigmoid losses, scatter-add gradient updates,
* negatives are drawn from the unigram^0.75 table on device with
  ``jax.random``, a new fold of the key per step (stateless, reproducible),
* `most_similar` does one (V, D) x (D,) matmul on the MXU.

API mirrors what the downstream graph code needs: trained vectors come
back as ``dict[word, np.ndarray]`` — directly usable as the
``embeddings=`` input of :class:`sgc_tpu.textgraph.graph.TextGraphBuilder`
(cosine+PMI edge weighting) or for the w2v tsv export.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class Word2VecConfig:
    dim: int = 100                # gensim default size=100
    window: int = 5               # symmetric context window
    negatives: int = 5            # negative samples per positive pair
    lr: float = 0.025             # gensim default alpha
    epochs: int = 5
    batch_size: int = 8192
    min_count: int = 1
    seed: int = 42


def build_vocab(
    docs: Sequence[Sequence[str]], min_count: int = 1
) -> tuple[list[str], dict[str, int], np.ndarray]:
    """Vocabulary + counts from tokenized docs (gensim build_vocab analog)."""
    from collections import Counter

    counts = Counter(w for d in docs for w in d)
    vocab = sorted(w for w, c in counts.items() if c >= min_count)
    word_id = {w: i for i, w in enumerate(vocab)}
    freq = np.array([counts[w] for w in vocab], dtype=np.float64)
    return vocab, word_id, freq


def skipgram_pairs(
    docs: Sequence[Sequence[str]], word_id: dict[str, int], window: int
) -> np.ndarray:
    """All (center, context) id pairs, vectorized per offset.

    For each offset d in 1..window, pair token[i] with token[i+d] (both
    directions), concatenated across docs — no Python position loops.
    """
    outs = []
    for doc in docs:
        ids = np.array([word_id[w] for w in doc if w in word_id], dtype=np.int32)
        n = len(ids)
        for d in range(1, window + 1):
            if n <= d:
                break
            a, b = ids[:-d], ids[d:]
            outs.append(np.stack([a, b], axis=1))
            outs.append(np.stack([b, a], axis=1))
    if not outs:
        return np.zeros((0, 2), dtype=np.int32)
    return np.concatenate(outs, axis=0)


@partial(jax.jit, static_argnames=("negatives", "lr"))
def _sgns_step(params, centers, contexts, key, noise_cdf, negatives: int, lr: float):
    """One SGNS minibatch step. Returns (params, loss).

    in_emb/out_emb updated with manual scatter-add SGD (the classic w2v
    update), fully inside one XLA program.
    """
    in_emb, out_emb = params
    b = centers.shape[0]

    # negatives ~ unigram^0.75 via inverse-CDF sampling on device
    u = jax.random.uniform(key, (b, negatives))
    # float32 cumsum can end slightly below 1.0; a draw above it would
    # index V (out of range) — clamp to the last word
    negs = jnp.minimum(
        jnp.searchsorted(noise_cdf, u), noise_cdf.shape[0] - 1
    )

    v_c = in_emb[centers]                       # (B, D)
    u_pos = out_emb[contexts]                   # (B, D)
    u_neg = out_emb[negs]                       # (B, K, D)

    pos_logit = jnp.sum(v_c * u_pos, axis=-1)                 # (B,)
    neg_logit = jnp.einsum("bd,bkd->bk", v_c, u_neg)           # (B, K)

    # grad of -log s(x) is -s(-x); of -log s(-x) is s(x)
    g_pos = -jax.nn.sigmoid(-pos_logit)                        # (B,)
    g_neg = jax.nn.sigmoid(neg_logit)                          # (B, K)

    grad_vc = g_pos[:, None] * u_pos + jnp.einsum("bk,bkd->bd", g_neg, u_neg)
    grad_upos = g_pos[:, None] * v_c                           # (B, D)
    grad_uneg = g_neg[..., None] * v_c[:, None, :]             # (B, K, D)

    in_emb = in_emb.at[centers].add(-lr * grad_vc)
    out_emb = out_emb.at[contexts].add(-lr * grad_upos)
    out_emb = out_emb.at[negs.reshape(-1)].add(
        -lr * grad_uneg.reshape(-1, grad_uneg.shape[-1])
    )

    loss = jnp.mean(
        jax.nn.softplus(-pos_logit) + jnp.sum(jax.nn.softplus(neg_logit), axis=-1)
    )
    return (in_emb, out_emb), loss


class Word2Vec:
    """SGNS word2vec with a jitted training step (gensim.Word2Vec analog)."""

    def __init__(self, config: Word2VecConfig | None = None):
        self.config = config or Word2VecConfig()
        self.vocab: list[str] = []
        self.word_id: dict[str, int] = {}
        self.vectors: np.ndarray | None = None

    def train(
        self,
        docs: Sequence[Sequence[str]],
        init_vectors: dict[str, np.ndarray] | None = None,
    ) -> "Word2Vec":
        """Fit on a corpus. ``init_vectors`` warm-starts words found in a
        pretrained map (the reference fine-tunes GoogleNews vectors,
        word2vec.py:16-76); out-of-map words get random init."""
        cfg = self.config
        self.vocab, self.word_id, freq = build_vocab(docs, cfg.min_count)
        v = len(self.vocab)
        if v == 0:
            self.vectors = np.zeros((0, cfg.dim), np.float32)
            return self

        pairs = skipgram_pairs(docs, self.word_id, cfg.window)
        if len(pairs) == 0:
            self.vectors = np.zeros((v, cfg.dim), np.float32)
            return self

        noise = freq**0.75
        noise_cdf = jnp.asarray(np.cumsum(noise / noise.sum()), jnp.float32)

        key = jax.random.PRNGKey(cfg.seed)
        k_init, key = jax.random.split(key)
        in_np = np.array(
            jax.random.uniform(k_init, (v, cfg.dim), jnp.float32, -0.5, 0.5)
            / cfg.dim
        )  # writable host copy (np.asarray of a jax array is read-only)
        if init_vectors:
            for i, w in enumerate(self.vocab):
                vec = init_vectors.get(w)
                if vec is not None and len(vec) == cfg.dim:
                    in_np[i] = np.asarray(vec, np.float32)
        in_emb = jnp.asarray(in_np)
        out_emb = jnp.zeros((v, cfg.dim), jnp.float32)
        params = (in_emb, out_emb)

        b = min(cfg.batch_size, len(pairs))
        rng = np.random.default_rng(cfg.seed)
        for _ in range(cfg.epochs):
            perm = rng.permutation(len(pairs))
            # fixed-size batches only (static shapes); remainder is dropped,
            # shuffling across epochs covers all pairs in expectation
            for s in range(0, len(pairs) - b + 1, b):
                idx = perm[s : s + b]
                key, k = jax.random.split(key)
                params, _ = _sgns_step(
                    params,
                    jnp.asarray(pairs[idx, 0]),
                    jnp.asarray(pairs[idx, 1]),
                    k,
                    noise_cdf,
                    cfg.negatives,
                    cfg.lr,
                )
        self.vectors = np.asarray(params[0])
        return self

    # -- queries ------------------------------------------------------------

    def __contains__(self, word: str) -> bool:
        return word in self.word_id

    def __getitem__(self, word: str) -> np.ndarray:
        return self.vectors[self.word_id[word]]

    def as_dict(self) -> dict[str, np.ndarray]:
        return {w: self.vectors[i] for i, w in enumerate(self.vocab)}

    def most_similar(self, word: str, topn: int = 10) -> list[tuple[str, float]]:
        """Cosine nearest neighbors (reference word2vec.py:128-150 export)."""
        if word not in self.word_id:
            return []
        vecs = self.vectors / (
            np.linalg.norm(self.vectors, axis=1, keepdims=True) + 1e-12
        )
        q = vecs[self.word_id[word]]
        sims = vecs @ q
        order = np.argsort(-sims)
        out = []
        for i in order:
            if i == self.word_id[word]:
                continue
            out.append((self.vocab[i], float(sims[i])))
            if len(out) >= topn:
                break
        return out

    def save_tsv(self, path) -> None:
        """word \\t v0 v1 ... export (reference biobert_get_tsv.py:5-25)."""
        from pathlib import Path

        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        with open(p, "w") as f:
            for i, w in enumerate(self.vocab):
                vec = " ".join(f"{x:.6f}" for x in self.vectors[i])
                f.write(f"{w}\t{vec}\n")
