"""Sparse graph containers for TPU compute.

The canonical on-device representation is a row-sorted COO edge list
(``rows``, ``cols``, ``vals``) padded to a TPU-friendly edge count, carried
as a JAX pytree so it can flow through ``jit`` / ``shard_map`` unchanged.
A CSR ``row_ptr`` is carried alongside for kernels that want row segments.

This replaces the reference's borrowed scipy/torch sparse machinery
(reference: utils.py:23-30 ``sparse_mx_to_torch_sparse_tensor``,
normalization.py host-side scipy algebra); here the container is a first-
class framework type with explicit padding semantics (padded edges have
``val == 0`` and ``row/col`` clamped in-range so every kernel — XLA
segment-sum, Pallas, and the partitioned halo path — treats them as no-ops).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Default edge-count granularity. Keeping the edge dimension a multiple of
# the 8x128 VPU tile (1024) keeps Pallas block shapes aligned and lets XLA
# tile gathers/segment-sums without remainder handling.
EDGE_PAD_MULTIPLE = 1024


def pad_edges_to(n: int, multiple: int = EDGE_PAD_MULTIPLE) -> int:
    """Round ``n`` up to a multiple of ``multiple`` (minimum one tile)."""
    if n <= 0:
        return multiple
    return ((n + multiple - 1) // multiple) * multiple


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("rows", "cols", "vals", "row_ptr"),
    meta_fields=("n_rows", "n_cols", "nnz"),
)
@dataclasses.dataclass(frozen=True)
class SparseGraph:
    """Row-sorted COO sparse matrix with CSR row pointers, as a pytree.

    Attributes:
      rows:    int32[E_pad] — row index per edge, non-decreasing.
      cols:    int32[E_pad] — column index per edge.
      vals:    float32[E_pad] — edge weight; exactly 0 for padding edges.
      row_ptr: int32[n_rows + 1] — CSR offsets into the *unpadded* edges.
               Guarded: graphs beyond 2^31-1 edges are rejected at
               construction (int32 device indices; enabling jax x64 and
               lifting the guard is the >2B-edge path).
      n_rows, n_cols: static matrix shape.
      nnz:     static true (unpadded) edge count; padding lives in
               ``[nnz, E_pad)``.
    """

    rows: jnp.ndarray
    cols: jnp.ndarray
    vals: jnp.ndarray
    row_ptr: jnp.ndarray
    n_rows: int
    n_cols: int
    nnz: int

    @property
    def n_edges_padded(self) -> int:
        return self.rows.shape[0]

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n_rows, self.n_cols)

    # ---------------------------------------------------------------- build

    @staticmethod
    def from_coo(
        rows: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        n_rows: int,
        n_cols: int,
        pad_multiple: int = EDGE_PAD_MULTIPLE,
        device: bool = True,
        presorted: bool = False,
    ) -> "SparseGraph":
        """Build from host COO arrays; sorts by (row, col) and pads.

        ``presorted=True`` skips the sort for inputs already in
        (row, col) order — subsets of an existing SparseGraph, csr
        ``.tocoo()`` with sorted indices — after an O(E) vectorized
        monotonicity check (raises on violation rather than silently
        mis-building row_ptr).

        Sorting and CSR construction go through the native C++ library
        (sgc_tpu/native) when built — a parallel radix sort that is the
        host-side hot path at 10M+ edges — with numpy fallbacks otherwise.

        ``device=False`` keeps the edge arrays as NUMPY (host-resident):
        identical semantics everywhere (numpy leaves trace fine in jit),
        but construction does no device transfer. Use it for graphs that
        feed HOST pipelines (reordering, tiling, cost-model splits —
        graph/locality.py), where an eager placement would round-trip
        100+ MB over the tunneled backend per intermediate graph
        (measured: LocalityPlan.build 209 s with device puts vs 22 s
        host-only at Reddit scale). Device placement then happens once,
        explicitly (jax.device_put / ops.spmm_hybrid.hybrid_device_args).
        """
        from sgc_tpu import native

        if len(rows) > np.iinfo(np.int32).max:
            raise ValueError(
                f"{len(rows)} edges overflow int32 device offsets; enable "
                "jax_enable_x64 and widen SparseGraph dtypes for >2B edges"
            )
        if presorted:
            rows = np.ascontiguousarray(rows, dtype=np.int64)
            cols = np.ascontiguousarray(cols, dtype=np.int64)
            vals = np.ascontiguousarray(vals, dtype=np.float32)
            # single composite-key pass: ids are < 2^31 (int32 device
            # buffers), so row<<32|col is exact
            if n_cols > np.iinfo(np.int32).max:
                raise ValueError(
                    f"n_cols {n_cols} overflows int32 device indices")
            key = (rows << 32) | cols
            if len(key) and (key[1:] < key[:-1]).any():
                raise ValueError(
                    "presorted=True but edges are not (row, col)-sorted"
                )
        else:
            rows, cols, vals = native.sort_edges(
                rows, cols, vals, n_rows, n_cols)
        nnz = int(rows.shape[0])
        row_ptr = native.row_ptr_from_sorted(rows, n_rows).astype(np.int32)

        e_pad = pad_edges_to(nnz, pad_multiple)
        pad = e_pad - nnz
        if pad:
            # Padding edges point at the last row/col with zero weight so
            # every consumer treats them as no-ops while indices stay sorted
            # and in-range.
            rows = np.concatenate([rows, np.full(pad, max(n_rows - 1, 0))])
            cols = np.concatenate([cols, np.full(pad, max(n_cols - 1, 0))])
            vals = np.concatenate([vals, np.zeros(pad, dtype=np.float32)])

        as_arr = jnp.asarray if device else np.asarray
        return SparseGraph(
            rows=as_arr(rows, dtype=np.int32),
            cols=as_arr(cols, dtype=np.int32),
            vals=as_arr(vals, dtype=np.float32),
            row_ptr=as_arr(row_ptr, dtype=np.int32),
            n_rows=int(n_rows),
            n_cols=int(n_cols),
            nnz=nnz,
        )

    @staticmethod
    def from_scipy(mat, pad_multiple: int = EDGE_PAD_MULTIPLE,
                   device: bool = True) -> "SparseGraph":
        """Build from any scipy.sparse matrix (``device`` as in from_coo).

        A CSR input with sorted indices converts via the presorted fast
        path (its ``.tocoo()`` is already (row, col)-ordered); anything
        else goes through the native radix sort.
        """
        import scipy.sparse as sp

        presorted = bool(
            sp.issparse(mat) and mat.format == "csr"
            and mat.has_sorted_indices
        )
        coo = mat.tocoo()
        return SparseGraph.from_coo(
            coo.row, coo.col, coo.data, coo.shape[0], coo.shape[1],
            pad_multiple, device=device, presorted=presorted,
        )

    # ------------------------------------------------------------- convert

    def to_scipy(self):
        import scipy.sparse as sp

        rows = np.asarray(self.rows)[: self.nnz]
        cols = np.asarray(self.cols)[: self.nnz]
        vals = np.asarray(self.vals)[: self.nnz]
        return sp.coo_matrix((vals, (rows, cols)), shape=self.shape)

    def transpose(self) -> "SparseGraph":
        """Return the transpose (re-sorted by the new row index), on host."""
        rows = np.asarray(self.rows)[: self.nnz]
        cols = np.asarray(self.cols)[: self.nnz]
        vals = np.asarray(self.vals)[: self.nnz]
        return SparseGraph.from_coo(cols, rows, vals, self.n_cols, self.n_rows)

    def with_vals(self, vals: jnp.ndarray) -> "SparseGraph":
        """Same sparsity pattern, new edge values (traced-value friendly)."""
        return dataclasses.replace(self, vals=vals)

    def row_subgraph(self, row_indices: np.ndarray) -> "SparseGraph":
        """Keep only edges whose ROW is in ``row_indices``; rows are
        renumbered to positions in ``row_indices`` (columns unchanged).

        Host-side, O(E). The resulting (len(rows_indices), n_cols) operator
        computes exactly the selected output rows of this matrix:
        ``spmm(g.row_subgraph(idx), x) == spmm(g, x)[idx]``. This is the
        dead-row-elimination lever for pipelines that slice SpMM output
        (e.g. the final hop of sgc_precompute feeding only train rows —
        reference reddit.py:44-47 trains on a row subset).

        Placement follows the input: a host-resident graph (``from_coo
        device=False``) yields a host-resident subgraph.
        """
        row_indices = np.asarray(row_indices, dtype=np.int64)
        if len(np.unique(row_indices)) != len(row_indices):
            raise ValueError("row_subgraph requires unique row indices")
        if row_indices.size and (
            row_indices.min() < 0 or row_indices.max() >= self.n_rows
        ):
            raise ValueError(
                f"row indices must be in [0, {self.n_rows}); got range "
                f"[{row_indices.min()}, {row_indices.max()}] (negative "
                "ids would silently wrap)"
            )
        lookup = np.full(self.n_rows, -1, dtype=np.int64)
        lookup[row_indices] = np.arange(len(row_indices))
        rows = np.asarray(self.rows)[: self.nnz]
        keep = lookup[rows] >= 0
        # a subset of this graph's (row, col)-sorted edges stays sorted
        # when the row renumbering is monotone (ascending row_indices)
        ascending = bool(np.all(np.diff(row_indices) > 0))
        return SparseGraph.from_coo(
            lookup[rows[keep]],
            np.asarray(self.cols)[: self.nnz][keep],
            np.asarray(self.vals)[: self.nnz][keep],
            len(row_indices),
            self.n_cols,
            device=not isinstance(self.rows, np.ndarray),
            presorted=ascending,
        )

    # --------------------------------------------------------------- utils

    def degrees(self) -> jnp.ndarray:
        """Weighted out-degree per row (padding edges contribute 0)."""
        return jax.ops.segment_sum(
            self.vals, self.rows, num_segments=self.n_rows, indices_are_sorted=True
        )

    def binary_degrees(self) -> jnp.ndarray:
        """Unweighted degree per row (counts true edges only)."""
        ones = (self.vals != 0).astype(jnp.float32)
        return jax.ops.segment_sum(
            ones, self.rows, num_segments=self.n_rows, indices_are_sorted=True
        )


def save_graph(path, graph: SparseGraph) -> None:
    """Persist a SparseGraph to one .npz (unpadded edges + shape)."""
    from pathlib import Path

    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        p,
        rows=np.asarray(graph.rows)[: graph.nnz],
        cols=np.asarray(graph.cols)[: graph.nnz],
        vals=np.asarray(graph.vals)[: graph.nnz],
        shape=np.asarray(graph.shape, np.int64),
    )


def load_graph(path, pad_multiple: int = EDGE_PAD_MULTIPLE) -> SparseGraph:
    """Load a SparseGraph saved by :func:`save_graph`."""
    from pathlib import Path

    p = Path(path)
    if p.suffix != ".npz" and not p.exists():
        p = p.with_suffix(p.suffix + ".npz")
    with np.load(p) as z:
        n_rows, n_cols = (int(x) for x in z["shape"])
        return SparseGraph.from_coo(
            z["rows"], z["cols"], z["vals"], n_rows, n_cols, pad_multiple
        )


def block_diag(graphs: list, pad_multiple: int = EDGE_PAD_MULTIPLE) -> SparseGraph:
    """Batch many graphs into one block-diagonal SparseGraph.

    The standard trick for training over many small graphs at once: one
    SpMM over the block-diagonal operator propagates every graph
    independently; per-graph readout is a segment reduction over the
    node-offset ranges (returned as the second value).

    Returns (graph, offsets) where offsets[i] is graph i's first node id
    (offsets[-1] = total node count).
    """
    rows, cols, vals = [], [], []
    offsets = [0]
    for g in graphs:
        off = offsets[-1]
        rows.append(np.asarray(g.rows)[: g.nnz] + off)
        cols.append(np.asarray(g.cols)[: g.nnz] + off)
        vals.append(np.asarray(g.vals)[: g.nnz])
        if g.n_rows != g.n_cols:
            raise ValueError("block_diag requires square member graphs")
        offsets.append(off + g.n_rows)
    n = offsets[-1]
    out = SparseGraph.from_coo(
        np.concatenate(rows) if rows else np.zeros(0, np.int64),
        np.concatenate(cols) if cols else np.zeros(0, np.int64),
        np.concatenate(vals) if vals else np.zeros(0, np.float32),
        n, n, pad_multiple,
    )
    return out, np.asarray(offsets)
