"""Sharded 2-layer GCN training — the DataParallel replacement, done right.

The reference's ONLY multi-device construct is `torch.nn.DataParallel`
in the XLNet baseline (SURVEY §1); its GCN baseline is single-GPU. This
module trains the GCN family over the ("nodes", 1) mesh with the same
structure DataParallel implies — replicated weights, row-sharded
activations — but with the graph itself partitioned: each layer's SpMM
runs the halo-exchanged sharded kernel (parallel/spmm.py, including the
block-dense formulation), and XLA's SPMD partitioner derives the
gradient collectives from the sharded forward automatically
(shard_map's collectives are differentiable).

Unlike SGC, GCN's propagation is INSIDE the differentiated step every
epoch — this is the multi-chip story for the nonlinear model family
(reference models.py:20-57; forward-return bug fixed in models/gcn.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from sgc_tpu.models.gcn import GCNParams, init_gcn
from sgc_tpu.parallel.mesh import NODES_AXIS
from sgc_tpu.parallel.partition import PartitionedGraph
from sgc_tpu.parallel.spmm import spmm_sharded
from sgc_tpu.train.optim import torch_adam


class ShardedGCNState(NamedTuple):
    params: GCNParams       # replicated
    opt_state: tuple


def gcn_apply_sharded(
    mesh,
    pgraph: PartitionedGraph,
    params: GCNParams,
    x: jnp.ndarray,          # [N_pad, F] sharded P("nodes", None)
    halo=None,
    blockdense=None,
    use_relu: bool = True,
) -> jnp.ndarray:
    """Layer = dense GEMM (local rows) -> sharded SpMM (halo exchange).

    Semantics of models/gcn.py::gcn_apply over the mesh; requires a
    ("nodes", 1) mesh (hidden widths change per layer, so the feature
    axis stays unsharded — weights are replicated, the DataParallel
    layout).
    """
    from sgc_tpu.parallel.mesh import FEAT_AXIS

    if mesh.shape[FEAT_AXIS] != 1:
        raise ValueError(
            "gcn_apply_sharded needs a ('nodes', 1) mesh: hidden widths "
            "change per layer, so the feature axis must stay unsharded "
            f"(got feat axis size {mesh.shape[FEAT_AXIS]})")
    h = x @ params.w1 + params.b1
    h = spmm_sharded(mesh, pgraph, h, halo=halo, blockdense=blockdense)
    if use_relu:
        h = jax.nn.relu(h)
    h = h @ params.w2 + params.b2
    return spmm_sharded(mesh, pgraph, h, halo=halo, blockdense=blockdense)


def init_sharded_gcn(
    mesh, key, n_features: int, n_hidden: int, n_classes: int,
    lr: float = 0.01, weight_decay: float = 5e-4,
) -> ShardedGCNState:
    params = init_gcn(key, n_features, n_hidden, n_classes)
    params = jax.device_put(params, NamedSharding(mesh, P()))
    opt_state = torch_adam(lr, weight_decay).init(params)
    return ShardedGCNState(params=params, opt_state=opt_state)


def make_sharded_gcn_step(
    mesh,
    pgraph: PartitionedGraph,
    *,
    lr: float = 0.01,
    weight_decay: float = 5e-4,
    halo=None,
    blockdense=None,
):
    """Jitted full-batch GCN train step over the mesh.

    ``step(state, x, labels, mask) -> (state, loss)`` with x sharded
    P("nodes", None), labels/mask P("nodes"). The masked-mean
    cross-entropy and the parameter gradients reduce across the mesh via
    the partitioner (replicated params => all-reduced grads — the DP
    semantics, reference citation.py:41-58 loss/optimizer).
    """
    tx = torch_adam(lr, weight_decay)

    def loss_fn(params, x, labels, mask):
        logits = gcn_apply_sharded(
            mesh, pgraph, params, x, halo=halo, blockdense=blockdense)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels)
        return jnp.sum(losses * mask) / jnp.sum(mask)

    @jax.jit
    def step(state: ShardedGCNState, x, labels, mask):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, x, labels, mask)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return ShardedGCNState(params=params, opt_state=opt_state), loss

    return step


def fit_gcn_sharded(
    graph,
    features: np.ndarray,
    labels: np.ndarray,
    idx_train: np.ndarray,
    n_classes: int,
    *,
    mesh=None,
    n_hidden: int = 16,
    epochs: int = 100,
    lr: float = 0.01,
    weight_decay: float = 5e-4,
    seed: int = 42,
    use_halo: bool = True,
):
    """One-call distributed GCN fit (the fit_sharded analog for the
    nonlinear family). Returns (host GCNParams, loss_history)."""
    from sgc_tpu.parallel.distributed import fetch_global
    from sgc_tpu.parallel.halo import build_halo
    from sgc_tpu.parallel.mesh import FEAT_AXIS, make_mesh
    from sgc_tpu.parallel.partition import (
        pad_node_rows,
        partition_graph,
    )
    from sgc_tpu.parallel.spmm import shard_features
    from sgc_tpu.parallel.train import place_node_targets

    if mesh is None:
        mesh = make_mesh(len(jax.devices()), 1)
    if mesh.shape[FEAT_AXIS] != 1:
        raise ValueError("fit_gcn_sharded needs a ('nodes', 1) mesh")
    n_parts = mesh.shape[NODES_AXIS]
    pgraph = partition_graph(graph, n_parts)
    halo = build_halo(pgraph, overlap=True) if use_halo else None

    x = pad_node_rows(
        jnp.asarray(np.asarray(features, np.float32)),
        pgraph.n_rows_padded)
    x = shard_features(mesh, x)

    y, m = place_node_targets(mesh, pgraph.n_rows_padded, labels,
                              idx_train)

    state = init_sharded_gcn(
        mesh, jax.random.PRNGKey(seed), int(x.shape[1]), n_hidden,
        n_classes, lr=lr, weight_decay=weight_decay)
    step = make_sharded_gcn_step(
        mesh, pgraph, lr=lr, weight_decay=weight_decay, halo=halo)

    losses = []
    for i in range(epochs):
        state, loss = step(state, x, y, m)
        losses.append(loss)
        if (i + 1) % 16 == 0:
            float(fetch_global(loss))   # bound async queue depth (fit.py)
    losses = [float(fetch_global(l)) for l in losses]

    params = GCNParams(
        w1=jnp.asarray(fetch_global(state.params.w1)),
        b1=jnp.asarray(fetch_global(state.params.b1)),
        w2=jnp.asarray(fetch_global(state.params.w2)),
        b2=jnp.asarray(fetch_global(state.params.b2)),
    )
    return params, losses
