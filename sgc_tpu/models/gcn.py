"""Two-layer GCN baseline.

Parity: reference models.py:20-57 — GraphConvolution is Linear-then-spmm
with U(-1/sqrt(in), 1/sqrt(in)) weight init; GCN stacks two with ReLU and
dropout between. The reference's ``GraphConvolution.forward`` is missing its
return statement (models.py:36-38, a latent bug since GCN is never run);
fixed here.

TPU note: each layer is (dense GEMM on the MXU) -> (SpMM); under jit the two
fuse with the activation, and S stays resident in HBM as a SparseGraph.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.ops.spmm import spmm


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("w1", "b1", "w2", "b2"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class GCNParams:
    w1: jnp.ndarray
    b1: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray


def _layer_init(key, fan_in, fan_out):
    wkey, bkey = jax.random.split(key)
    stdv = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(
        wkey, (fan_in, fan_out), minval=-stdv, maxval=stdv, dtype=jnp.float32
    )
    b = jax.random.uniform(
        bkey, (fan_out,), minval=-stdv, maxval=stdv, dtype=jnp.float32
    )
    return w, b


def init_gcn(key: jax.Array, nfeat: int, nhid: int, nclass: int) -> GCNParams:
    k1, k2 = jax.random.split(key)
    w1, b1 = _layer_init(k1, nfeat, nhid)
    w2, b2 = _layer_init(k2, nhid, nclass)
    return GCNParams(w1=w1, b1=b1, w2=w2, b2=b2)


def gcn_apply(
    params: GCNParams,
    x: jnp.ndarray,
    graph: SparseGraph,
    *,
    use_relu: bool = True,
    dropout_rate: float = 0.0,
    dropout_key: jax.Array | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    x = spmm(graph, x @ params.w1 + params.b1, impl=impl)
    if use_relu:
        x = jax.nn.relu(x)
    if dropout_rate > 0.0 and dropout_key is not None:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(dropout_key, keep, x.shape)
        x = jnp.where(mask, x / keep, 0.0)
    return spmm(graph, x @ params.w2 + params.b2, impl=impl)
