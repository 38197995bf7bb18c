"""Sharded full-batch training step: tp + graph-partitioned dp in one SPMD program.

Layout over the ("nodes", "feat") mesh:
  X      [N_pad, F]  P(nodes, feat)   — node rows block-partitioned (the
                                        graph analog of sequence/data
                                        parallelism), feature columns
                                        tensor-partitioned.
  S      row blocks  P(nodes)         — each chip owns the edges whose
                                        destination rows it owns.
  W      [F, C]      P(feat, None)    — tensor-parallel linear head; logits
                                        are assembled with a psum over
                                        "feat" (ICI all-reduce).
  b      [C]         replicated
  labels [N_pad]     P(nodes)
  mask   [N_pad]     P(nodes)         — 1.0 on train rows, 0 elsewhere
                                        (covers padding rows and the
                                        train/val/test split).

One step = (optional) K sharded SpMM hops -> TP matmul -> psum(feat) logits
-> masked softmax cross-entropy -> grads (dW psum over "nodes", the DP
all-reduce) -> torch-semantics Adam update, all inside a single shard_map
so XLA schedules the collectives against local compute.

The reference has no distributed path at all (SURVEY.md §2.5); its
optimizer semantics come from citation.py:41-42 (Adam + classic L2).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from sgc_tpu.models.sgc import SGCParams
from sgc_tpu.parallel.mesh import FEAT_AXIS, NODES_AXIS
from sgc_tpu.parallel.partition import PartitionedGraph
from sgc_tpu.parallel.spmm import _local_spmm
from sgc_tpu.train.optim import torch_adam


def place_node_targets(mesh, n_rows_padded: int, labels, idx_train):
    """(labels, mask) zero-padded to the partition row space and placed
    P("nodes") on the mesh — shared by fit_sharded and fit_gcn_sharded."""
    import numpy as np

    from sgc_tpu.parallel.distributed import put_global

    y = np.zeros(n_rows_padded, np.int32)
    y[: len(labels)] = np.asarray(labels, np.int32)
    m = np.zeros(n_rows_padded, np.float32)
    m[np.asarray(idx_train)] = 1.0
    return (put_global(mesh, P(NODES_AXIS), y),
            put_global(mesh, P(NODES_AXIS), m))


class ShardedTrainState(NamedTuple):
    params: SGCParams       # w: P(feat, None); b: replicated
    opt_state: tuple        # same shardings as params


def init_sharded_state(
    mesh, key, n_features: int, n_classes: int, lr: float, weight_decay: float
) -> ShardedTrainState:
    """Initialize TP-sharded linear-head params + Adam state on the mesh."""
    bound = 1.0 / jnp.sqrt(n_features)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(
        wkey, (n_features, n_classes), minval=-bound, maxval=bound,
        dtype=jnp.float32,
    )
    b = jax.random.uniform(
        bkey, (n_classes,), minval=-bound, maxval=bound, dtype=jnp.float32
    )
    w = jax.device_put(w, NamedSharding(mesh, P(FEAT_AXIS, None)))
    b = jax.device_put(b, NamedSharding(mesh, P(None)))
    params = SGCParams(w=w, b=b)
    opt_state = torch_adam(lr, weight_decay).init(params)
    return ShardedTrainState(params=params, opt_state=opt_state)


def make_sharded_train_step(
    mesh,
    pgraph: PartitionedGraph,
    *,
    degree: int = 0,
    lr: float = 0.2,
    weight_decay: float = 0.0,
    halo=None,
    blockdense=None,
    precision: str = "bf16",
):
    """Build a jitted SPMD train step closed over the partitioned graph.

    With ``degree > 0`` the K-hop propagation runs inside the step (the GCN
    regime / the driver's multi-chip dry run); with ``degree == 0`` the step
    consumes already-propagated features (the SGC precompute workflow).

    Propagation variants (degree > 0): ``blockdense`` (a ShardedBlockDense
    plan — the fast dense-cell formulation, interior overlapped with the
    halo all_to_all) supersedes ``halo``; an overlapped HaloDescriptor
    runs the interior/boundary-split segment kernel; a plain one runs the
    single-exchange kernel; neither falls back to all-gather.
    ``precision`` controls the blockdense matmul cast only.

    Returns ``step(state, x, labels, mask) -> (state, loss)``.
    """
    tx = torch_adam(lr, weight_decay)
    rows_per_part = pgraph.rows_per_part

    def _hop(graph_local, x):
        if blockdense is not None:
            from sgc_tpu.parallel.blockdense import (
                blockdense_exchange_and_spmm,
            )

            return blockdense_exchange_and_spmm(
                blockdense, graph_local, x, precision=precision)
        if halo is not None and halo.overlapped:
            from sgc_tpu.parallel.halo import exchange_and_spmm_overlapped

            ri, ci, vi, rb, cb, vb, si = graph_local
            return exchange_and_spmm_overlapped(
                (ri, ci, vi), (rb, cb, vb), si, x, rows_per_part)
        if halo is not None:
            from sgc_tpu.parallel.halo import exchange_and_spmm

            rows_l, cols, vals, si = graph_local
            return exchange_and_spmm(
                rows_l, cols, vals, si, x, rows_per_part)
        rows_l, cols, vals = graph_local
        x_full = jax.lax.all_gather(x, NODES_AXIS, axis=0, tiled=True)
        return _local_spmm(rows_l, cols, vals, x_full, rows_per_part)

    def body(w, b, mu, nu, count, graph_args, x, labels, mask):
        graph_local = tuple(a[0] for a in graph_args)
        for _ in range(degree):
            x = _hop(graph_local, x)

        denom = jax.lax.psum(jnp.sum(mask), NODES_AXIS)

        def loss_fn(p: SGCParams):
            logits_partial = jnp.dot(
                x, p.w, preferred_element_type=jnp.float32
            )
            logits = (
                jax.lax.psum(logits_partial, FEAT_AXIS) + p.b
            )
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            )
            local = jnp.sum(losses * mask)
            return jax.lax.psum(local, NODES_AXIS) / denom

        params = SGCParams(w=w, b=b)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        # dW/db each accumulated from local rows only -> DP all-reduce.
        grads = jax.tree.map(lambda g: jax.lax.psum(g, NODES_AXIS), grads)
        updates, opt_state = tx.update(
            grads, _restore_opt(tx, count, mu, nu, params), params
        )
        params = optax.apply_updates(params, updates)
        new_count, new_mu, new_nu = _flatten_opt(opt_state)
        return params.w, params.b, new_mu, new_nu, new_count, loss

    def _restore_opt(tx, count, mu, nu, params):
        # Rebuild the optax chain state from flat leaves (shard_map wants
        # explicit array args). torch_adam = [add_decayed_weights?]
        # scale_by_adam, scale — only scale_by_adam is stateful.
        state = tx.init(params)
        rebuilt = []
        for s in state:
            if isinstance(s, optax.ScaleByAdamState):
                rebuilt.append(
                    optax.ScaleByAdamState(count=count, mu=mu, nu=nu)
                )
            else:
                rebuilt.append(s)
        return tuple(rebuilt)

    def _flatten_opt(opt_state):
        for s in opt_state:
            if isinstance(s, optax.ScaleByAdamState):
                return s.count, s.mu, s.nu
        raise AssertionError("no adam state in chain")

    edge_spec = P(NODES_AXIS, None)
    w_spec = P(FEAT_AXIS, None)
    b_spec = P(None)
    send_spec = P(NODES_AXIS, None, None)
    if blockdense is not None:
        from sgc_tpu.parallel.blockdense import (
            blockdense_flat_args,
            blockdense_in_specs,
        )

        graph_args = blockdense_flat_args(blockdense)
        graph_specs = blockdense_in_specs(blockdense)
    elif halo is not None and halo.overlapped:
        graph_args = (*halo.edges_int, *halo.edges_bnd, halo.send_idx)
        graph_specs = (edge_spec,) * 6 + (send_spec,)
    elif halo is not None:
        graph_args = (pgraph.rows_local, halo.cols_halo, pgraph.vals,
                      halo.send_idx)
        graph_specs = (edge_spec,) * 3 + (send_spec,)
    else:
        graph_args = (pgraph.rows_local, pgraph.cols, pgraph.vals)
        graph_specs = (edge_spec,) * 3

    sharded_body = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            w_spec, b_spec,                                   # params
            SGCParams(w=w_spec, b=b_spec),                    # mu
            SGCParams(w=w_spec, b=b_spec),                    # nu
            P(),                                              # count
            graph_specs,                                      # graph
            P(NODES_AXIS, FEAT_AXIS),                         # x
            P(NODES_AXIS), P(NODES_AXIS),                     # labels, mask
        ),
        out_specs=(
            w_spec, b_spec,
            SGCParams(w=w_spec, b=b_spec),
            SGCParams(w=w_spec, b=b_spec),
            P(),
            P(),                                              # loss (replicated)
        ),
        check_vma=False,
    )

    @jax.jit
    def step(state: ShardedTrainState, x, labels, mask):
        count, mu, nu = _flatten_opt(state.opt_state)
        w, b, mu, nu, count, loss = sharded_body(
            state.params.w, state.params.b, mu, nu, count,
            graph_args, x, labels, mask,
        )
        opt_state = tuple(
            optax.ScaleByAdamState(count=count, mu=mu, nu=nu)
            if isinstance(s, optax.ScaleByAdamState) else s
            for s in state.opt_state
        )
        return ShardedTrainState(SGCParams(w=w, b=b), opt_state), loss

    return step
