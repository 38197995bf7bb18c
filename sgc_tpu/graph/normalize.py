"""Adjacency / feature normalization transforms.

Two tiers, mirroring where the work actually runs:

* **Host tier** (numpy/scipy): one-shot preprocessing of graphs loaded from
  disk — symmetrization, A+I, D^-1/2 scaling. Parity targets:
  reference normalization.py:5-28 (``aug_normalized_adjacency``,
  ``row_normalize``) and downstream/TextSGC/utils.py:59-71
  (``normalize_adj`` / ``preprocess_adj``).

* **Device tier** (jnp over :class:`SparseGraph`): the same math as a pure,
  jittable transform on edge values — degrees via sorted segment-sum, then
  ``val' = d^-1/2[row] * val * d^-1/2[col]``. Used when graphs are built or
  re-weighted on device (e.g. per-partition renormalization), where a host
  round-trip would serialize the pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from sgc_tpu.graph.sparse import SparseGraph

# --------------------------------------------------------------------- host


def aug_normalized_adjacency(adj: sp.spmatrix) -> sp.coo_matrix:
    """S = (D+I)^-1/2 (A+I) (D+I)^-1/2 — "AugNormAdj".

    Parity: reference normalization.py:5-12.
    """
    adj = sp.coo_matrix(adj + sp.eye(adj.shape[0]))
    row_sum = np.asarray(adj.sum(1)).ravel()
    with np.errstate(divide="ignore"):
        d_inv_sqrt = np.power(row_sum, -0.5)
    d_inv_sqrt[np.isinf(d_inv_sqrt)] = 0.0
    d = sp.diags(d_inv_sqrt)
    return (d @ adj @ d).tocoo()


def sym_normalized_adjacency_selfloops(adj: sp.spmatrix) -> sp.coo_matrix:
    """D̃^-1/2 (A+I) D̃^-1/2 via the TextSGC formulation.

    Parity: downstream/TextSGC/utils.py:59-71 (``preprocess_adj`` =
    ``normalize_adj(adj + I)``). Mathematically identical to
    :func:`aug_normalized_adjacency` for symmetric inputs; kept as a separate
    registry entry so the TextSGC pipeline names its own transform.
    """
    return aug_normalized_adjacency(adj)


def no_norm(adj: sp.spmatrix) -> sp.coo_matrix:
    """Identity transform (A+I without scaling is NOT applied — raw A)."""
    return sp.coo_matrix(adj)


def rw_normalized_adjacency(adj: sp.spmatrix) -> sp.coo_matrix:
    """S = (D+I)^-1 (A+I) — the row-stochastic random-walk operator
    ("RWalk" in upstream Tiiiger/SGC; the fork registers only AugNormAdj
    but keeps the registry shape, normalization.py:14-19)."""
    adj = sp.coo_matrix(adj + sp.eye(adj.shape[0]))
    row_sum = np.asarray(adj.sum(1)).ravel()
    with np.errstate(divide="ignore"):
        d_inv = np.power(row_sum, -1.0)
    d_inv[np.isinf(d_inv)] = 0.0
    return (sp.diags(d_inv) @ adj).tocoo()


def sym_normalized_adjacency(adj: sp.spmatrix) -> sp.coo_matrix:
    """S = D^-1/2 A D^-1/2 without self-loops ("NormAdj" upstream)."""
    adj = sp.coo_matrix(adj)
    row_sum = np.asarray(adj.sum(1)).ravel()
    with np.errstate(divide="ignore"):
        d_inv_sqrt = np.power(row_sum, -0.5)
    d_inv_sqrt[np.isinf(d_inv_sqrt)] = 0.0
    d = sp.diags(d_inv_sqrt)
    return (d @ adj @ d).tocoo()


_NORMALIZATIONS = {
    "AugNormAdj": aug_normalized_adjacency,
    "TextAugNormAdj": sym_normalized_adjacency_selfloops,
    "RWalkAdj": rw_normalized_adjacency,
    "NormAdj": sym_normalized_adjacency,
    "NoNorm": no_norm,
}


def fetch_normalization(name: str):
    """Registry lookup. Parity: reference normalization.py:14-19."""
    try:
        return _NORMALIZATIONS[name]
    except KeyError:
        raise ValueError(
            f"Invalid normalization {name!r}; known: {sorted(_NORMALIZATIONS)}"
        ) from None


def register_normalization(name: str, fn) -> None:
    _NORMALIZATIONS[name] = fn


def row_normalize(mx):
    """Row-normalize a scipy sparse matrix or dense ndarray.

    Parity: reference normalization.py:21-28 (inf -> 0 on zero rows).
    """
    if sp.issparse(mx):
        rowsum = np.asarray(mx.sum(1)).ravel()
        with np.errstate(divide="ignore"):
            r_inv = np.power(rowsum, -1.0)
        r_inv[np.isinf(r_inv)] = 0.0
        return sp.diags(r_inv) @ mx
    mx = np.asarray(mx, dtype=np.float32)
    rowsum = mx.sum(1)
    with np.errstate(divide="ignore"):
        r_inv = np.power(rowsum, -1.0)
    r_inv[np.isinf(r_inv)] = 0.0
    return mx * r_inv[:, None]


def symmetrize_max(adj: sp.spmatrix) -> sp.coo_matrix:
    """Elementwise max(A, A^T) — the citation-graph symmetrization.

    Parity: reference utils.py:63
    (``adj + adj.T.multiply(adj.T > adj) - adj.multiply(adj.T > adj)``).
    """
    adj = adj.tocsr()
    t = adj.T.tocsr()
    return (adj + t.multiply(t > adj) - adj.multiply(t > adj)).tocoo()


# ------------------------------------------------------------------- device


def normalize_adjacency_device(
    graph: SparseGraph
) -> SparseGraph:
    """Jittable D^-1/2 A D^-1/2 re-weighting of an on-device SparseGraph.

    Self-loop edges must already be present in the pattern (pattern
    changes are host-side); their weights are counted by the degree
    segment-sum exactly once. Padding edges (val == 0) stay exactly 0.
    """
    deg = jax.ops.segment_sum(
        graph.vals, graph.rows, num_segments=graph.n_rows, indices_are_sorted=True
    )
    d_inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)
    new_vals = d_inv_sqrt[graph.rows] * graph.vals * d_inv_sqrt[graph.cols]
    return graph.with_vals(new_vals)


def standardize_features(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-mean / unit-std per feature column (Reddit-critical).

    Parity: reference utils.py:119 — torch ``std`` uses the unbiased (ddof=1)
    estimator, reproduced here.
    """
    mean = x.mean(axis=0, keepdims=True)
    std = x.std(axis=0, keepdims=True, ddof=1)
    return (x - mean) / std
