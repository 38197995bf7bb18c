"""Pretrained-encoder fine-tuning (the true XLNet-baseline path).

``sgc_tpu.train.sequence`` trains the self-contained JAX encoder from
scratch (hermetic). When HuggingFace *flax* weights are available locally
this module fine-tunes a real pretrained encoder instead — the direct
analog of the reference's ``XLNetForSequenceClassification`` run
(``xlnet/xlnet.py:21-45`` model setup, ``:172-188`` full-vs-head param
groups, ``:188,218`` Adam 3e-5 + clip 1.0).

TPU-shaped: the HF flax module's apply is jitted once per (batch, length)
bucket; optimizer is optax adam + global-norm clip; head-only mode
zero-masks encoder gradients (same optimizer, one mask — no param-group
machinery needed in a functional optimizer).

Zero-egress environments can't download weights; ``from_config=True``
instantiates the architecture with random weights (used by the tests and
as a from-scratch fallback with a real tokenizer's vocab).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np


@dataclasses.dataclass
class FinetuneConfig:
    model_name: str = "bert-base-uncased"
    lr: float = 3e-5               # xlnet.py:188
    grad_clip: float = 1.0         # xlnet.py:218
    epochs: int = 3
    batch_size: int = 16
    max_length: int = 128
    head_only: bool = False
    seed: int = 42
    from_config: bool = False      # random init (offline) instead of weights


# flax module names that constitute the classification head across HF
# architectures: BERT family uses 'classifier', XLNet 'logits_proj' (+
# 'sequence_summary'), some models 'score'
_HEAD_KEYS = ("classifier", "logits_proj", "sequence_summary", "score")


def _head_mask(params) -> object:
    """Pytree of {0,1} multipliers: 1 for classifier-head leaves, 0 for
    encoder leaves — the head-only fine-tuning group. Raises if no head
    module is recognized (an all-zero mask would silently freeze the
    whole model and make fine-tuning a no-op)."""
    import jax

    found = {"head": False}

    def walk(tree, under_head):
        if isinstance(tree, dict):
            return {
                k: walk(
                    v,
                    under_head
                    or any(h in k.lower() for h in _HEAD_KEYS),
                )
                for k, v in tree.items()
            }
        if under_head:
            found["head"] = True
        return jax.tree_util.tree_map(
            lambda x: 1.0 if under_head else 0.0, tree
        )

    mask = walk(params, False)
    if not found["head"]:
        top = list(params) if isinstance(params, dict) else type(params)
        raise ValueError(
            "head_only=True but no classification-head module recognized "
            f"(looked for {_HEAD_KEYS} among param keys; top-level: {top}). "
            "Pass head_only=False or rename/extend _HEAD_KEYS."
        )
    return mask


def finetune_pretrained(
    texts: Sequence[str],
    labels: np.ndarray,
    n_classes: int,
    config: FinetuneConfig | None = None,
    tokenizer=None,
    model=None,
):
    """Fine-tune a flax sequence classifier; returns (predict_fn, state).

    ``predict_fn(texts) -> int predictions``. ``tokenizer``/``model`` may
    be passed directly (locally constructed HF flax objects — the path
    zero-egress environments and tests use); otherwise they resolve from
    ``config.model_name`` via the HF cache. Raises RuntimeError when
    pretrained weights can't be loaded and ``from_config`` is False.
    """
    import jax
    import jax.numpy as jnp
    import optax

    cfg = config or FinetuneConfig()
    if tokenizer is None:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(cfg.model_name)
    if model is None:
        from transformers import AutoConfig
        from transformers import (
            FlaxAutoModelForSequenceClassification as FlaxCls,
        )

        if cfg.from_config:
            mcfg = AutoConfig.from_pretrained(cfg.model_name)
            mcfg.num_labels = n_classes
            model = FlaxCls.from_config(mcfg)
        else:
            try:
                model = FlaxCls.from_pretrained(
                    cfg.model_name, num_labels=n_classes
                )
            except Exception as e:  # no weights in a zero-egress env
                raise RuntimeError(
                    f"pretrained weights for {cfg.model_name!r} unavailable "
                    f"({e}); pass from_config=True or inject model="
                ) from e

    params = model.params
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adam(cfg.lr),
    )
    opt_state = tx.init(params)
    mask = _head_mask(params) if cfg.head_only else None

    def encode(batch_texts):
        enc = tokenizer(
            list(batch_texts), padding="max_length", truncation=True,
            max_length=cfg.max_length, return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32), \
            enc["attention_mask"].astype(np.int32)

    @jax.jit
    def step(params, opt_state, ids, attn, y, w):
        def loss_fn(p):
            logits = model(
                input_ids=ids, attention_mask=attn, params=p, train=False
            ).logits
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: g * m, grads, mask
            )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    labels = np.asarray(labels, np.int32)
    n = len(texts)
    b = min(cfg.batch_size, max(n, 1))
    rng = np.random.default_rng(cfg.seed)
    for _ in range(cfg.epochs):
        perm = rng.permutation(n)
        for s in range(0, n, b):
            from sgc_tpu.train.sequence import pad_batch_indices

            idx, w = pad_batch_indices(perm[s : s + b], b)
            ids, attn = encode([texts[i] for i in idx])
            params, opt_state, _ = step(
                params, opt_state, jnp.asarray(ids), jnp.asarray(attn),
                jnp.asarray(labels[idx]), jnp.asarray(w),
            )

    @jax.jit
    def fwd(params, ids, attn):
        return jnp.argmax(
            model(input_ids=ids, attention_mask=attn, params=params,
                  train=False).logits,
            axis=-1,
        )

    def predict_fn(batch_texts):
        out = np.zeros(len(batch_texts), np.int32)
        for s in range(0, len(batch_texts), b):
            chunk = list(batch_texts[s : s + b])
            pad = b - len(chunk)
            ids, attn = encode(chunk + [""] * pad)
            pred = np.asarray(fwd(params, jnp.asarray(ids), jnp.asarray(attn)))
            out[s : s + len(chunk)] = pred[: len(chunk)]
        return out

    return predict_fn, (params, opt_state)
