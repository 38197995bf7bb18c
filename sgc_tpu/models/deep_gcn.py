"""Deep GCN stacks: scan-compiled layers, rematerialization, stage hooks.

The reference tops out at 2 GCN layers (reference models.py:41-57); SGC
itself is depth-free. For deep stacks the TPU concerns are different:

* **compile time** — N layers unrolled = N copies of the layer HLO; here
  homogeneous hidden layers run under ``lax.scan`` over stacked params,
  so the program size is O(1) in depth.
* **memory** — full-batch GNN activations are [N_nodes, H] per layer;
  ``jax.checkpoint`` (remat) around the scanned layer trades one extra
  forward for O(1) stored activations — the standard TPU recipe for
  depth (HBM is the bottleneck, MXU flops are cheap).
* **pipeline-parallel hook** — ``stage_layers`` groups the stacked layer
  params into S contiguous stages. On a mesh with a "stage" axis these
  groups are what a GPipe-style schedule would place per device; for the
  full-batch GNN regime the practical scaling axis is graph partitioning
  (SURVEY.md §2.5 marks PP "N/A for SGC; provide hook for deep stacks"),
  so this stays a layout hook rather than a schedule.
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
    data_fields=("w_in", "b_in", "w_hidden", "b_hidden", "w_out", "b_out"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class DeepGCNParams:
    w_in: jnp.ndarray        # (F, H)
    b_in: jnp.ndarray        # (H,)
    w_hidden: jnp.ndarray    # (L-2, H, H) stacked for lax.scan
    b_hidden: jnp.ndarray    # (L-2, H)
    w_out: jnp.ndarray       # (H, C)
    b_out: jnp.ndarray       # (C,)

    @property
    def n_layers(self) -> int:
        return 2 + self.w_hidden.shape[0]


def init_deep_gcn(
    key: jax.Array, nfeat: int, nhid: int, nclass: int, n_layers: int
) -> DeepGCNParams:
    if n_layers < 2:
        raise ValueError("deep GCN needs >= 2 layers")
    ks = jax.random.split(key, n_layers)

    def glorot(k, fan_in, fan_out):
        std = jnp.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(k, (fan_in, fan_out), jnp.float32)

    n_hidden = n_layers - 2
    w_h = jnp.stack(
        [glorot(ks[1 + i], nhid, nhid) for i in range(n_hidden)]
    ) if n_hidden else jnp.zeros((0, nhid, nhid), jnp.float32)
    return DeepGCNParams(
        w_in=glorot(ks[0], nfeat, nhid),
        b_in=jnp.zeros((nhid,), jnp.float32),
        w_hidden=w_h,
        b_hidden=jnp.zeros((n_hidden, nhid), jnp.float32),
        w_out=glorot(ks[-1], nhid, nclass),
        b_out=jnp.zeros((nclass,), jnp.float32),
    )


def deep_gcn_apply(
    params: DeepGCNParams,
    x: jnp.ndarray,
    graph: SparseGraph,
    *,
    residual: bool = True,
    remat: bool = True,
    impl: str = "auto",
) -> jnp.ndarray:
    """Forward through L layers: in-proj -> scanned hidden -> out-proj.

    Hidden layers: h <- relu(S @ (h W + b)) (+ residual). ``remat=True``
    wraps the scanned layer in jax.checkpoint so backward recomputes
    activations instead of storing L of them.
    """
    h = jax.nn.relu(spmm(graph, x @ params.w_in + params.b_in, impl=impl))

    def layer(h, wb):
        w, b = wb
        out = jax.nn.relu(spmm(graph, h @ w + b, impl=impl))
        if residual:
            out = out + h
        return out, None

    layer_fn = jax.checkpoint(layer) if remat else layer
    if params.w_hidden.shape[0]:
        h, _ = jax.lax.scan(layer_fn, h, (params.w_hidden, params.b_hidden))
    return spmm(graph, h @ params.w_out + params.b_out, impl=impl)


def stage_layers(params: DeepGCNParams, n_stages: int):
    """Group hidden layers into contiguous pipeline stages.

    Returns a list of (w_stack, b_stack) with ceil((L-2)/S) layers each —
    the per-device placement unit for a GPipe-style schedule over a
    "stage" mesh axis.
    """
    n_hidden = params.w_hidden.shape[0]
    if n_stages <= 0 or n_hidden == 0:
        return [(params.w_hidden, params.b_hidden)]
    per = -(-n_hidden // n_stages)
    return [
        (params.w_hidden[s : s + per], params.b_hidden[s : s + per])
        for s in range(0, n_hidden, per)
    ]
