"""Graph attention layer built on the framework's SDDMM/SpMM primitives.

The reference justifies SDDMM as the building block "for attention-style
edge reweighting" (SURVEY.md §2.4); this module is that extension made
concrete — a GAT-style layer (Velickovic et al. 2018 formulation) where
every irregular op is one of the framework's two sparse primitives:

  e_uv    = LeakyReLU(a_src · h_u + a_dst · h_v)   edge logits: SDDMM-form
  alpha   = segment_softmax(e, rows)                per-destination softmax
  h'_v    = sum_u alpha_uv (h_u W)                  aggregation: SpMM

Segment softmax reuses the sorted-edge layout: max/sum per row segment via
``jax.ops.segment_max/segment_sum`` with the same fixed reduction order as
the SpMM path, so attention stays deterministic.

Single-head by design (multi-head = vmap over head params; helper
provided). Works with every SpMM impl since the reweighted graph is just
a SparseGraph with new values.
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
    data_fields=("w", "a_src", "a_dst", "bias"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class GATLayerParams:
    w: jnp.ndarray        # (F_in, F_out)
    a_src: jnp.ndarray    # (F_out,)
    a_dst: jnp.ndarray    # (F_out,)
    bias: jnp.ndarray     # (F_out,)


def init_gat_layer(
    key: jax.Array, f_in: int, f_out: int
) -> GATLayerParams:
    kw, ks, kd = jax.random.split(key, 3)
    std = jnp.sqrt(2.0 / (f_in + f_out))
    return GATLayerParams(
        w=std * jax.random.normal(kw, (f_in, f_out), jnp.float32),
        a_src=0.1 * jax.random.normal(ks, (f_out,), jnp.float32),
        a_dst=0.1 * jax.random.normal(kd, (f_out,), jnp.float32),
        bias=jnp.zeros((f_out,), jnp.float32),
    )


def segment_softmax(
    logits: jnp.ndarray, rows: jnp.ndarray, n_rows: int, live: jnp.ndarray
) -> jnp.ndarray:
    """Softmax over edges grouped by destination row (sorted rows).

    ``live`` masks padding edges out of both the max and the sum.
    """
    neg = jnp.finfo(jnp.float32).min
    masked = jnp.where(live, logits, neg)
    seg_max = jax.ops.segment_max(
        masked, rows, num_segments=n_rows, indices_are_sorted=True
    )
    # rows with no live edges produce -inf max; neutralize
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    exp = jnp.where(live, jnp.exp(logits - seg_max[rows]), 0.0)
    denom = jax.ops.segment_sum(
        exp, rows, num_segments=n_rows, indices_are_sorted=True
    )
    return exp / jnp.maximum(denom[rows], 1e-30)


def gat_layer_apply(
    params: GATLayerParams,
    x: jnp.ndarray,
    graph: SparseGraph,
    *,
    negative_slope: float = 0.2,
    activation=jax.nn.elu,
    impl: str = "auto",
) -> jnp.ndarray:
    """One attention layer: returns float32[n_rows, F_out]."""
    h = jnp.dot(x, params.w, preferred_element_type=jnp.float32)

    # edge logits — SDDMM specialization: <a_src, h_u> + <a_dst, h_v>
    # computed as two node-level dots gathered per edge (rank-1 SDDMM)
    src_score = h @ params.a_src          # (n_cols,)
    dst_score = h @ params.a_dst          # (n_rows,)
    logits = jax.nn.leaky_relu(
        dst_score[graph.rows] + src_score[graph.cols], negative_slope
    )

    # padding is positional (slots >= nnz), matching ops/spmm.py:sddmm —
    # attention depends on connectivity, so a genuine edge whose current
    # weight happens to be 0 still participates in the softmax
    live = jnp.arange(graph.n_edges_padded) < graph.nnz
    alpha = segment_softmax(logits, graph.rows, graph.n_rows, live)

    att_graph = SparseGraph(
        rows=graph.rows,
        cols=graph.cols,
        vals=jnp.where(live, alpha, 0.0),
        row_ptr=graph.row_ptr,
        n_rows=graph.n_rows,
        n_cols=graph.n_cols,
        nnz=graph.nnz,
    )
    out = spmm(att_graph, h, impl=impl) + params.bias
    return activation(out) if activation is not None else out


def multi_head_gat(
    params_stack,            # GATLayerParams with leading head axis
    x: jnp.ndarray,
    graph: SparseGraph,
    *,
    concat: bool = True,
    **kw,
) -> jnp.ndarray:
    """Multi-head attention: vmap over stacked head params.

    concat=True concatenates head outputs (hidden layers); False averages
    (output layer) — the standard GAT conventions.
    """
    outs = jax.vmap(
        lambda p: gat_layer_apply(p, x, graph, **kw)
    )(params_stack)                       # (H, n_rows, F_out)
    if concat:
        return jnp.transpose(outs, (1, 0, 2)).reshape(outs.shape[1], -1)
    return jnp.mean(outs, axis=0)


def init_multi_head(
    key: jax.Array, n_heads: int, f_in: int, f_out: int
) -> GATLayerParams:
    """Stacked head params (leading axis = head) for multi_head_gat."""
    keys = jax.random.split(key, n_heads)
    ps = [init_gat_layer(k, f_in, f_out) for k in keys]
    return GATLayerParams(
        w=jnp.stack([p.w for p in ps]),
        a_src=jnp.stack([p.a_src for p in ps]),
        a_dst=jnp.stack([p.a_dst for p in ps]),
        bias=jnp.stack([p.bias for p in ps]),
    )
