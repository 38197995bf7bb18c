"""Neighborhood-sampled inductive inference (GraphSAGE-style, TPU-shaped).

The reference's inductive mode trains on a train-only sub-adjacency and
runs *full-graph* propagation for eval features (reference ``reddit.py:43-47``,
``utils.py:117``) — fine at 233K nodes, but full-graph SpMM per query is
the wrong primitive for serving single nodes. The BASELINE north star
explicitly asks for "neighborhood-sampled inductive inference for Reddit":
estimate S^K x for a *batch of target nodes* by sampling a fixed-fanout
k-hop neighborhood and propagating only through it.

TPU-first design decisions:
* **static shapes everywhere** — fanouts are fixed; nodes with fewer
  neighbors than the fanout are padded with self-edges whose weight mass
  is folded into the estimator, so one XLA program serves every batch;
* sampling uses the CSR ``row_ptr`` with ``jax.random.randint`` offsets —
  uniform-with-replacement over each node's neighbor list (the GraphSAGE
  estimator), entirely on device (no host round trip per query);
* the propagation is a dense (B, fanout) gather + weighted mean — a
  contiguous reduction the VPU vectorizes, not a scatter;
* the estimator is **unbiased for the row-normalized operator**: each hop
  approximates sum_j S[v, j] x[j] = deg_w(v) * E_{j~p_v}[x[j] * sign] with
  p_v uniform over neighbors and per-edge weight scaling, i.e.
  mean_k (S[v, j_k] * deg(v)) * x[j_k].

``sampled_sgc_infer`` composes K sampled hops with the SGC linear head for
end-to-end "serve a node batch" inference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sgc_tpu.graph.sparse import SparseGraph


def _neighbor_table(graph: SparseGraph) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-row neighbor start/degree plus padded col/val arrays.

    Returns (starts, degrees) int32[n_rows] views over the row-sorted edge
    arrays; rows with zero degree sample their own index (self-loop).
    """
    starts = graph.row_ptr[:-1]
    degrees = graph.row_ptr[1:] - graph.row_ptr[:-1]
    return starts, degrees


@partial(jax.jit, static_argnames=("fanout",))
def sample_neighbors(
    graph: SparseGraph,
    nodes: jnp.ndarray,          # int32[B]
    key: jax.Array,
    fanout: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform-with-replacement neighbor sample per node.

    Returns:
      nbr_idx: int32[B, fanout] — sampled neighbor node ids (self for
               isolated nodes).
      nbr_w:   float32[B, fanout] — S[v, j] * deg(v) importance weights
               (0 weight marks self-fallback of isolated nodes so the mean
               stays unbiased).
    """
    starts, degrees = _neighbor_table(graph)
    s = starts[nodes]                         # (B,)
    d = degrees[nodes]                        # (B,)
    b = nodes.shape[0]

    offs = jax.random.randint(key, (b, fanout), 0, jnp.maximum(d, 1)[:, None])
    edge_idx = s[:, None] + offs              # (B, fanout) indices into edges
    nbr = graph.cols[edge_idx]
    w = graph.vals[edge_idx] * d[:, None].astype(jnp.float32)

    isolated = (d == 0)[:, None]
    nbr = jnp.where(isolated, nodes[:, None], nbr)
    w = jnp.where(isolated, 0.0, w)
    return nbr, w


@partial(jax.jit, static_argnames=("fanouts",))
def sampled_propagate(
    graph: SparseGraph,
    features: jnp.ndarray,       # float32[N, F] raw node features
    nodes: jnp.ndarray,          # int32[B] target nodes
    key: jax.Array,
    fanouts: tuple[int, ...],    # per-hop fanout, len == K
) -> jnp.ndarray:
    """Monte-Carlo estimate of (S^K x)[nodes] via recursive sampling.

    Builds the sampled computation tree root-to-leaf with static shapes:
    frontier at depth t has B * prod(fanouts[:t]) nodes; features are
    gathered once at the leaves and averaged back up with the importance
    weights — K dense weighted means, no scatter.
    """
    frontiers = [nodes]          # depth 0 = targets
    weights = []
    for t, f in enumerate(fanouts):
        key, sub = jax.random.split(key)
        flat = frontiers[-1].reshape(-1)
        nbr, w = sample_neighbors(graph, flat, sub, f)
        frontiers.append(nbr.reshape(-1))
        weights.append(w.reshape(-1, f))

    # leaf gather, then collapse depth-by-depth: x_{t} = mean_f w * x_{t+1}
    x = features[frontiers[-1]]                       # (B*prod, F)
    for t in range(len(fanouts) - 1, -1, -1):
        f = fanouts[t]
        w = weights[t]                                # (B*prod[:t], f)
        x = x.reshape(-1, f, x.shape[-1])
        x = jnp.mean(w[..., None] * x, axis=1)
    return x


def sampled_sgc_infer(
    params,
    graph: SparseGraph,
    features: jnp.ndarray,
    nodes: jnp.ndarray,
    key: jax.Array,
    fanouts: tuple[int, ...] = (25, 10),
) -> jnp.ndarray:
    """Serve SGC logits for a node batch from sampled neighborhoods."""
    from sgc_tpu.models.sgc import sgc_apply

    feats = sampled_propagate(graph, features, jnp.asarray(nodes), key, fanouts)
    return sgc_apply(params, feats)


def sampled_propagate_host(
    graph_scipy, features: np.ndarray, nodes: np.ndarray,
    fanouts: tuple[int, ...], seed: int = 0,
) -> np.ndarray:
    """Numpy oracle of :func:`sampled_propagate` for tests (same estimator,
    independent implementation)."""
    rng = np.random.default_rng(seed)
    csr = graph_scipy.tocsr()

    def estimate(v: int, depth: int) -> np.ndarray:
        if depth == len(fanouts):
            return features[v]
        lo, hi = csr.indptr[v], csr.indptr[v + 1]
        deg = hi - lo
        if deg == 0:
            return np.zeros(features.shape[1], features.dtype)
        f = fanouts[depth]
        picks = rng.integers(lo, hi, f)
        acc = np.zeros(features.shape[1], np.float64)
        for e in picks:
            acc += csr.data[e] * deg * estimate(csr.indices[e], depth + 1)
        return (acc / f).astype(features.dtype)

    return np.stack([estimate(int(v), 0) for v in nodes])
