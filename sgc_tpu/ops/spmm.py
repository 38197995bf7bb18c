"""SpMM — sparse (adjacency) x dense (features) — the framework's hot op.

Replaces the reference's single borrowed primitive ``torch.spmm``
(reference utils.py:95, downstream/TextSGC/utils.py:136) with TPU-native
implementations over the row-sorted COO :class:`SparseGraph`:

* ``segment``  — gather + sorted segment-sum. One fused XLA program; the
  (E, F) edge-feature intermediate lives in HBM, so it is only viable while
  ``E * F`` fits comfortably (citation graphs, TextSGC).
* ``chunked``  — ``lax.scan`` over fixed-size edge chunks. Each chunk
  gathers (C, F) feature rows, scales by edge weight, and accumulates into
  the output with a sorted scatter-add. Bounded memory at any graph size
  (Reddit: 11.6M edges never materializes edge-major features).
* ``pallas``   — hand-written TPU kernel (sgc_tpu/ops/spmm_pallas.py) that
  fuses gather, scale and row-segment reduction so edge-major data never
  round-trips HBM.

``spmm(graph, x)`` auto-dispatches on problem size. All implementations
accumulate in float32 and are deterministic run-to-run (fixed reduction
order). segment and chunked agree bitwise with each other; the pallas
kernel accumulates in a different (cell-major) order, so it agrees to f32
rounding at precision='f32' (its default) and to ~3 decimal digits at
precision='bf16'. The reference relies on fixed seeds for reproducibility
(utils.py:99-102); here determinism is a property of the op.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sgc_tpu.graph.sparse import SparseGraph

# Edge-feature intermediates above this many elements switch to the chunked
# implementation (elements, not bytes: 256M f32 elems = 1 GiB).
_SEGMENT_ELEM_BUDGET = 256 * 1024 * 1024

# Chunk size for the scanned implementation — multiple of the edge padding
# granularity so the last chunk needs no remainder handling.
_DEFAULT_CHUNK = 512 * 1024


def spmm_segment(graph: SparseGraph, x: jnp.ndarray) -> jnp.ndarray:
    """out[r] = sum_{e: rows[e]==r} vals[e] * x[cols[e]] in one XLA program."""
    gathered = jnp.take(x, graph.cols, axis=0)
    weighted = gathered * graph.vals[:, None]
    return jax.ops.segment_sum(
        weighted,
        graph.rows,
        num_segments=graph.n_rows,
        indices_are_sorted=True,
    )


def spmm_chunked(
    graph: SparseGraph, x: jnp.ndarray, chunk: int = _DEFAULT_CHUNK
) -> jnp.ndarray:
    """Memory-bounded SpMM: scan over edge chunks, scatter-add per chunk.

    The edge list is padded to a multiple of the chunk size with zero-weight
    edges, so every scan step has identical static shapes.
    """
    e_pad = graph.n_edges_padded
    chunk = min(chunk, e_pad)
    n_chunks = -(-e_pad // chunk)
    total = n_chunks * chunk

    def pad_edges(a, fill):
        if total == a.shape[0]:
            return a
        return jnp.concatenate(
            [a, jnp.full((total - a.shape[0],), fill, dtype=a.dtype)]
        )

    rows = pad_edges(graph.rows, graph.n_rows - 1).reshape(n_chunks, chunk)
    cols = pad_edges(graph.cols, 0).reshape(n_chunks, chunk)
    vals = pad_edges(graph.vals, 0.0).reshape(n_chunks, chunk)

    out0 = jnp.zeros((graph.n_rows, x.shape[1]), dtype=jnp.float32)

    def step(acc, edge_chunk):
        r, c, v = edge_chunk
        contrib = jnp.take(x, c, axis=0) * v[:, None]
        acc = acc.at[r].add(contrib, indices_are_sorted=True, mode="drop")
        return acc, None

    out, _ = jax.lax.scan(step, out0, (rows, cols, vals))
    return out


def spmm(
    graph: SparseGraph,
    x: jnp.ndarray,
    impl: str = "auto",
    chunk: int = _DEFAULT_CHUNK,
) -> jnp.ndarray:
    """Sparse-matrix x dense-matrix product, auto-dispatched by size.

    Args:
      graph: (n_rows, n_cols) sparse matrix as a row-sorted SparseGraph.
      x:     float[n_cols, F] dense features.
      impl:  'auto' | 'segment' | 'chunked' | 'pallas' | 'hybrid' |
             'blockdense'. 'pallas', 'hybrid' and 'blockdense' do
             host-side tiling on first use, so they need a concrete
             (non-traced) graph — call them outside jit or close over a
             prebuilt tiling/split. 'blockdense' stores admitted cells
             in bf16 (rounding-level, not f32-exact — DESIGN §2e).

    Returns:
      float32[n_rows, F].
    """
    if x.ndim != 2:
        raise ValueError(f"spmm expects rank-2 features, got shape {x.shape}")
    if impl == "auto":
        # On TPU the gather -> scale -> sorted-segment-sum chain compiles to
        # one fused loop with no (E, F) intermediate in HBM (measured: 11.6M
        # edges x 602 features in 0.34 s/hop on v5e with no OOM), so the
        # segment impl is right at any size. The scatter-add chunked path
        # exists for CPU hosts where XLA materializes the gather (the
        # element budget keeps host RSS bounded).
        backend = jax.default_backend()
        if backend == "cpu" and (
            graph.n_edges_padded * x.shape[1] > _SEGMENT_ELEM_BUDGET
        ):
            impl = "chunked"
        else:
            impl = "segment"
    if impl == "segment":
        return spmm_segment(graph, x)
    if impl == "chunked":
        return spmm_chunked(graph, x, chunk=chunk)
    if impl == "pallas":
        from sgc_tpu.ops.spmm_pallas import spmm_pallas

        return spmm_pallas(graph, x)
    if impl == "hybrid":
        from sgc_tpu.ops.spmm_hybrid import spmm_hybrid

        return spmm_hybrid(graph, x)
    if impl == "blockdense":
        from sgc_tpu.ops.spmm_blockdense import spmm_blockdense

        return spmm_blockdense(graph, x)
    raise ValueError(f"unknown spmm impl {impl!r}")


def sddmm(
    graph: SparseGraph, a: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """Sampled dense-dense matmul: edge values of A @ B^T at graph's pattern.

    out[e] = <a[rows[e]], b[cols[e]]> — the building block for attention-style
    edge reweighting and the GCN backward w.r.t. adjacency values.

    Padding-edge slots ([nnz, E_pad)) return exactly 0 — identified by
    POSITION, so genuine edges that currently hold weight 0 still get
    their computed value and ``graph.with_vals(sddmm(...))`` is closed
    under repeated reweighting.
    """
    left = jnp.take(a, graph.rows, axis=0)
    right = jnp.take(b, graph.cols, axis=0)
    vals = jnp.sum(left * right, axis=-1)
    # padding is POSITIONAL (slots >= nnz), not val==0: a genuine edge
    # whose current weight is exactly 0 must keep its computed value so
    # graph.with_vals(sddmm(...)) stays closed under repeated reweighting
    pad_mask = jnp.arange(graph.n_edges_padded) < graph.nnz
    return jnp.where(pad_mask, vals, 0.0)
