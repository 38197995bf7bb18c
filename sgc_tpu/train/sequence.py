"""Sequence-classifier training loop — the XLNet fine-tune analog.

Reference: ``xlnet/xlnet.py`` — front-padded fixed-length encoding
(``:76-128``), Adam lr 3e-5 with grad-clip 1.0 (``:188,218``), full-vs-head
fine-tuning groups (``:172-188``), checkpoint save/load (``:228-248``),
sklearn classification report (``:301``).

TPU shape: one jitted train step (loss + grads + optax adam(+clip) update)
over static-shape (B, L) batches; the last partial batch is padded with a
sample-weight mask instead of being dropped or triggering a recompile.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax

from sgc_tpu.models.transformer import (
    TransformerConfig,
    TransformerParams,
    init_transformer,
    transformer_apply,
)


# ---------------------------------------------------------------------------
# Word-level encoding (front- or back-padded, xlnet.py:76-128)
# ---------------------------------------------------------------------------


def build_seq_vocab(
    docs: Sequence[Sequence[str]], max_vocab: int = 50_000
) -> dict[str, int]:
    """Frequency-ranked word vocab; 0 = PAD, 1 = UNK."""
    from collections import Counter

    counts = Counter(w for d in docs for w in d)
    vocab = {"<pad>": 0, "<unk>": 1}
    for w, _ in counts.most_common(max_vocab - 2):
        vocab[w] = len(vocab)
    return vocab


def encode_batch(
    docs: Sequence[Sequence[str]],
    vocab: dict[str, int],
    max_len: int,
    front_pad: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """(ids, mask) with XLNet-style front padding by default (xlnet.py:96)."""
    ids = np.zeros((len(docs), max_len), np.int32)
    mask = np.zeros((len(docs), max_len), np.float32)
    for i, doc in enumerate(docs):
        toks = [vocab.get(w, 1) for w in doc][:max_len]
        if front_pad:
            ids[i, max_len - len(toks):] = toks
            mask[i, max_len - len(toks):] = 1.0
        else:
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1.0
    return ids, mask


def pad_batch_indices(idx: np.ndarray, batch: int):
    """Static-shape batch padding: returns (full_idx, weights) where the
    trailing ``batch - len(idx)`` rows are index 0 with weight 0 (masked
    out of the loss). One definition shared by every batched loop."""
    w = np.ones(batch, np.float32)
    if len(idx) < batch:
        w[len(idx):] = 0.0
        idx = np.concatenate([idx, np.zeros(batch - len(idx), np.int64)])
    return idx, w


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SeqTrainConfig:
    lr: float = 3e-5               # xlnet.py:188
    grad_clip: float = 1.0         # xlnet.py:218
    epochs: int = 4
    batch_size: int = 32
    dropout: float = 0.1
    head_only: bool = False        # head-only fine-tuning group
    seed: int = 42


def train_sequence_classifier(
    docs: Sequence[Sequence[str]],
    labels: np.ndarray,
    model_cfg: TransformerConfig,
    cfg: SeqTrainConfig | None = None,
    *,
    params: TransformerParams | None = None,
    eval_fn: Callable[[TransformerParams], None] | None = None,
) -> tuple[TransformerParams, dict[str, int]]:
    """Fit the classifier; returns (params, vocab)."""
    cfg = cfg or SeqTrainConfig()
    vocab = build_seq_vocab(docs, model_cfg.vocab_size)
    ids, mask = encode_batch(docs, vocab, model_cfg.max_len)
    labels = np.asarray(labels, np.int32)

    key = jax.random.PRNGKey(cfg.seed)
    if params is None:
        key, init_key = jax.random.split(key)
        params = init_transformer(init_key, model_cfg)

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(cfg.lr),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, ids_b, mask_b, y_b, w_b, dkey):
        def loss_fn(p):
            logits = transformer_apply(
                p, ids_b, mask_b,
                dropout_rate=cfg.dropout, dropout_key=dkey,
                head_only=cfg.head_only,
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y_b)
            return jnp.sum(ce * w_b) / jnp.maximum(jnp.sum(w_b), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(docs)
    b = min(cfg.batch_size, n)
    rng = np.random.default_rng(cfg.seed)
    for _ in range(cfg.epochs):
        perm = rng.permutation(n)
        for s in range(0, n, b):
            idx, w = pad_batch_indices(perm[s : s + b], b)
            key, dkey = jax.random.split(key)
            params, opt_state, _ = step(
                params, opt_state,
                jnp.asarray(ids[idx]), jnp.asarray(mask[idx]),
                jnp.asarray(labels[idx]), jnp.asarray(w), dkey,
            )
        if eval_fn is not None:
            eval_fn(params)
    return params, vocab


@jax.jit
def _predict_fwd(params: TransformerParams, ids_b, mask_b):
    # module-level jit with params as an ARGUMENT: repeated
    # predict_sequence calls (per-epoch eval_fn hooks) reuse one compiled
    # program instead of recompiling a params-capturing closure each call
    return jnp.argmax(transformer_apply(params, ids_b, mask_b), axis=-1)


def predict_sequence(
    params: TransformerParams,
    docs: Sequence[Sequence[str]],
    vocab: dict[str, int],
    max_len: int,
    batch_size: int = 64,
) -> np.ndarray:
    """Argmax class predictions, batched with static shapes."""
    ids, mask = encode_batch(docs, vocab, max_len)

    n = len(docs)
    out = np.zeros(n, np.int32)
    b = min(batch_size, max(n, 1))
    for s in range(0, n, b):
        idx = np.arange(s, min(s + b, n))
        full, _ = pad_batch_indices(idx, b)
        pred = np.asarray(_predict_fwd(
            params, jnp.asarray(ids[full]), jnp.asarray(mask[full])
        ))
        out[idx] = pred[: len(idx)]
    return out
