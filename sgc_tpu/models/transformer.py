"""Transformer sequence classifier — the XLNet-baseline analog, TPU-native.

The reference benchmarks TextSGC against a fine-tuned
``XLNetForSequenceClassification`` (``xlnet/xlnet.py``: front-padded
encoding ``:76-128``, DataParallel ``:163-164``, full-vs-head fine-tune
param groups ``:172-188``, Adam 3e-5 + grad-clip 1.0 ``:188,218``,
checkpoint save/load ``:228-248``). Pretrained XLNet weights require a
network fetch, so this module provides the same *capability* as a
self-contained JAX encoder classifier:

* encoder-only transformer (pre-LN, GELU MLP, learned positions) whose
  matmuls run in **bfloat16 on the MXU with float32 accumulation**
  (``preferred_element_type``) — the TPU-native precision recipe,
* everything is a plain pytree of dataclasses (jit/grad/pjit-friendly),
  attention uses only fused XLA ops (no Python loops over positions),
* ``head_only`` freezes the encoder via ``lax.stop_gradient`` — the
  analog of the reference's two fine-tuning param groups,
* when HuggingFace *flax* pretrained weights are locally available,
  :func:`sgc_tpu.train.finetune.finetune_pretrained` upgrades this path
  to a true pretrained fine-tune; the from-scratch model is the hermetic
  default.

Data parallelism comes from sharding the batch axis over the mesh
(``sgc_tpu.parallel``) rather than ``torch.nn.DataParallel``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("wq", "wk", "wv", "wo", "w1", "b1", "w2", "b2",
                 "ln1_g", "ln1_b", "ln2_g", "ln2_b"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class EncoderLayerParams:
    wq: jnp.ndarray
    wk: jnp.ndarray
    wv: jnp.ndarray
    wo: jnp.ndarray
    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray
    ln1_g: jnp.ndarray
    ln1_b: jnp.ndarray
    ln2_g: jnp.ndarray
    ln2_b: jnp.ndarray


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("tok_emb", "pos_emb", "layers", "ln_f_g", "ln_f_b",
                 "cls_w", "cls_b"),
    meta_fields=("n_heads",),
)
@dataclasses.dataclass(frozen=True)
class TransformerParams:
    tok_emb: jnp.ndarray            # (V, D)
    pos_emb: jnp.ndarray            # (L, D)
    layers: tuple                   # tuple[EncoderLayerParams, ...]
    ln_f_g: jnp.ndarray
    ln_f_b: jnp.ndarray
    cls_w: jnp.ndarray              # (D, n_classes)
    cls_b: jnp.ndarray
    n_heads: int


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int
    n_classes: int
    max_len: int = 256
    dim: int = 256
    n_heads: int = 4
    n_layers: int = 4
    mlp_ratio: int = 4
    dropout: float = 0.1


def init_transformer(key: jax.Array, cfg: TransformerConfig) -> TransformerParams:
    d, h = cfg.dim, cfg.mlp_ratio * cfg.dim
    keys = jax.random.split(key, 3 + cfg.n_layers)

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                * jnp.sqrt(2.0 / fan_in).astype(jnp.float32))

    layers = []
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[3 + i], 6)
        layers.append(EncoderLayerParams(
            wq=dense(ks[0], d, (d, d)),
            wk=dense(ks[1], d, (d, d)),
            wv=dense(ks[2], d, (d, d)),
            wo=dense(ks[3], d, (d, d)),
            w1=dense(ks[4], d, (d, h)),
            b1=jnp.zeros((h,), jnp.float32),
            w2=dense(ks[5], h, (h, d)),
            b2=jnp.zeros((d,), jnp.float32),
            ln1_g=jnp.ones((d,), jnp.float32),
            ln1_b=jnp.zeros((d,), jnp.float32),
            ln2_g=jnp.ones((d,), jnp.float32),
            ln2_b=jnp.zeros((d,), jnp.float32),
        ))
    return TransformerParams(
        tok_emb=0.02 * jax.random.normal(
            keys[0], (cfg.vocab_size, d), jnp.float32),
        pos_emb=0.02 * jax.random.normal(keys[1], (cfg.max_len, d), jnp.float32),
        layers=tuple(layers),
        ln_f_g=jnp.ones((d,), jnp.float32),
        ln_f_b=jnp.zeros((d,), jnp.float32),
        cls_w=dense(keys[2], d, (d, cfg.n_classes)),
        cls_b=jnp.zeros((cfg.n_classes,), jnp.float32),
        n_heads=cfg.n_heads,
    )


def _layer_norm(x, g, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _mm(a, w):
    """bf16 matmul with f32 accumulation — the MXU precision recipe."""
    return jnp.dot(a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _attention(x, p: EncoderLayerParams, mask, n_heads: int):
    """Multi-head self-attention; mask is float (B, L) 1=real 0=pad."""
    b, l, d = x.shape
    hd = d // n_heads

    def split(t):  # (B, L, D) -> (B, H, L, hd)
        return t.reshape(b, l, n_heads, hd).transpose(0, 2, 1, 3)

    q = split(_mm(x, p.wq))
    k = split(_mm(x, p.wk))
    v = split(_mm(x, p.wv))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(hd)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask[:, None, None, :] > 0, scores, neg)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)
    return _mm(ctx, p.wo)


def _encoder_layer(x, p: EncoderLayerParams, mask, n_heads, dropout, key):
    h = _layer_norm(x, p.ln1_g, p.ln1_b)
    h = _attention(h, p, mask, n_heads)
    if dropout > 0.0 and key is not None:
        key, sub = jax.random.split(key)
        h = _dropout(h, dropout, sub)
    x = x + h
    h = _layer_norm(x, p.ln2_g, p.ln2_b)
    h = jax.nn.gelu(_mm(h, p.w1) + p.b1)
    h = _mm(h, p.w2) + p.b2
    if dropout > 0.0 and key is not None:
        key, sub = jax.random.split(key)
        h = _dropout(h, dropout, sub)
    return x + h, key


def _dropout(x, rate, key):
    keep = 1.0 - rate
    return jnp.where(jax.random.bernoulli(key, keep, x.shape), x / keep, 0.0)


def transformer_apply(
    params: TransformerParams,
    token_ids: jnp.ndarray,      # int32 (B, L)
    mask: jnp.ndarray,           # float32 (B, L), 1 = real token
    *,
    dropout_rate: float = 0.0,
    dropout_key: jax.Array | None = None,
    head_only: bool = False,
) -> jnp.ndarray:
    """Logits (B, n_classes). head_only freezes the encoder (stop_gradient),
    matching the reference's head-only fine-tuning group (xlnet.py:172-188).
    """
    l = token_ids.shape[1]
    x = params.tok_emb[token_ids] + params.pos_emb[:l][None]
    key = dropout_key
    for p in params.layers:
        x, key = _encoder_layer(
            x, p, mask, params.n_heads,
            dropout_rate if key is not None else 0.0, key)
    x = _layer_norm(x, params.ln_f_g, params.ln_f_b)
    # mean-pool over real tokens (XLNet pools the summary token; mean-pool
    # is the standard encoder equivalent)
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    pooled = jnp.sum(x * mask[..., None], axis=1) / denom
    if head_only:
        pooled = jax.lax.stop_gradient(pooled)
    return _mm(pooled, params.cls_w) + params.cls_b
