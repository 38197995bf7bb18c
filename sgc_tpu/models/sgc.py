"""SGC head: logistic regression on K-hop-propagated features.

Params are a plain pytree (functional style) so they flow through jit,
grad, shard_map and the flat-vector LBFGS without adapters.

Parity targets:
  * reference models.py:7-18       — nn.Linear(nfeat, nclass), bias=True,
    torch default (Kaiming-uniform -> U(-1/sqrt(in), 1/sqrt(in))) init.
  * downstream/TextSGC/models.py:6-15  — bias=False, xavier-normal init.
  * downstream/TextSGC_Bio/models.py:6-17 — + dropout on the output.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("w", "b"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class SGCParams:
    w: jnp.ndarray          # float32[nfeat, nclass]
    b: jnp.ndarray | None   # float32[nclass] or None


def init_sgc(
    key: jax.Array,
    nfeat: int,
    nclass: int,
    bias: bool = True,
    init: str = "torch",
) -> SGCParams:
    """Initialize the linear head.

    init='torch':  U(-1/sqrt(nfeat), 1/sqrt(nfeat)) for both w and b — the
                   distribution torch's default nn.Linear init produces.
    init='xavier_normal':  N(0, sqrt(2/(nfeat+nclass))) — TextSGC's choice.
    """
    wkey, bkey = jax.random.split(key)
    if init == "torch":
        bound = 1.0 / jnp.sqrt(nfeat)
        w = jax.random.uniform(
            wkey, (nfeat, nclass), minval=-bound, maxval=bound, dtype=jnp.float32
        )
    elif init == "xavier_normal":
        std = jnp.sqrt(2.0 / (nfeat + nclass))
        w = std * jax.random.normal(wkey, (nfeat, nclass), dtype=jnp.float32)
    else:
        raise ValueError(f"unknown init {init!r}")
    b = None
    if bias:
        bound = 1.0 / jnp.sqrt(nfeat)
        b = jax.random.uniform(
            bkey, (nclass,), minval=-bound, maxval=bound, dtype=jnp.float32
        )
    return SGCParams(w=w, b=b)


def sgc_apply(
    params: SGCParams,
    x: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    dropout_key: jax.Array | None = None,
) -> jnp.ndarray:
    """Forward: logits = x @ w (+ b), optional train-time output dropout."""
    out = jnp.dot(x, params.w, preferred_element_type=jnp.float32)
    if params.b is not None:
        out = out + params.b
    if dropout_rate > 0.0 and dropout_key is not None:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_key, keep, out.shape)
        out = jnp.where(mask, out / keep, 0.0)
    return out
