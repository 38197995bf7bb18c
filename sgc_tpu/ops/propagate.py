"""K-hop feature propagation — the SGC precompute engine.

``Y = S^K X`` is the entire graph-dependent computation in SGC; the
reference runs it as a Python loop of ``torch.spmm`` calls
(utils.py:92-97). Here the K hops are a single jitted XLA program (K is
static so the loop is unrolled and XLA pipelines the hops); the propagated
features then feed plain logistic-regression training that never touches
the graph again — the "precompute once, train many" factorization
(reference tuning.py:18-33) is exposed as a first-class workflow.

Also provides the TextSGC structural-feature precompute
(downstream/TextSGC/utils.py:131-152) WITHOUT the reference's N x N
densification of S (downstream/TextSGC/train.py:105, a 10+ GB bottleneck
per downstream/TextSGC/README.md:29-32): the S^2 column slices are computed
as two SpMM hops against a one-hot column selector.
"""

from __future__ import annotations

from functools import partial
from time import perf_counter

import jax
import jax.numpy as jnp
import numpy as np

from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.ops.spmm import spmm


@partial(jax.jit, static_argnames=("degree", "impl", "collect_hops"))
def propagate(
    x: jnp.ndarray,
    graph: SparseGraph,
    degree: int,
    impl: str = "auto",
    collect_hops: bool = False,
):
    """Apply ``degree`` SpMM hops: x <- S @ x, K times (pure, jittable).

    With ``collect_hops=True`` returns a list of the feature matrix after
    each hop (for per-hop parity testing against the reference pipeline).
    """
    hops = []
    for _ in range(degree):
        x = spmm(graph, x, impl=impl)
        if collect_hops:
            hops.append(x)
    if collect_hops:
        return x, hops
    return x


def sgc_precompute(
    features: jnp.ndarray,
    graph: SparseGraph,
    degree: int,
    impl: str = "auto",
):
    """Timed K-hop propagation. Parity: reference utils.py:92-97.

    Returns ``(propagated_features, precompute_seconds)``; the timer spans
    dispatch + device execution (post-compilation), matching the reference's
    ``perf_counter`` contract around the spmm loop.
    """
    # Warm the compilation cache outside the timed region: the reference
    # times cuSPARSE execution, not nvcc.
    propagate.lower(features, graph, degree, impl).compile()
    t = perf_counter()
    out = propagate(features, graph, degree, impl)
    out.block_until_ready()
    return out, perf_counter() - t


def onehot_selector(n_rows: int, indices: np.ndarray) -> jnp.ndarray:
    """Dense one-hot selector E with E[indices[j], j] = 1 (float32[n, m])."""
    indices = np.asarray(indices)
    sel = np.zeros((n_rows, indices.shape[0]), dtype=np.float32)
    sel[indices, np.arange(indices.shape[0])] = 1.0
    return jnp.asarray(sel)


@partial(jax.jit, static_argnames=("impl",))
def _skk_columns(graph: SparseGraph, selector: jnp.ndarray, impl: str = "auto"):
    # (S @ (S @ E))^T : rows are the selected nodes' S^2 rows (S symmetric).
    return spmm(graph, spmm(graph, selector, impl=impl), impl=impl).T


def text_structural_features(
    graph: SparseGraph,
    index_dict: dict[str, np.ndarray],
    impl: str = "auto",
):
    """TextSGC precompute: per-phase rows of S^2, min-max scaled on train.

    Mirrors downstream/TextSGC/utils.py:131-152 — features are S^2 column
    slices transposed (S symmetric), min-max statistics are fit on the train
    phase, zero-range dims dropped, and the same transform applied to
    val/test — but computed sparsely (no N x N dense S).

    Returns ``(feat_dict, precompute_seconds)``.
    """
    from sgc_tpu.ops.scaling import apply_minmax, fit_minmax

    t = perf_counter()
    per_phase = {
        phase: _skk_columns(graph, onehot_selector(graph.n_rows, idx), impl)
        for phase, idx in index_dict.items()
    }
    stats = fit_minmax(per_phase["train"])
    feat_dict = {p: apply_minmax(stats, f) for p, f in per_phase.items()}
    jax.block_until_ready(feat_dict)
    return feat_dict, perf_counter() - t
