"""Row-block edge partitioning — the graph analog of sequence parallelism.

Each of P parts owns a contiguous block of destination rows of S (and the
matching shard of the node-feature matrix). Edges are assigned to the part
that owns their destination row, re-indexed to block-local row ids, and
padded to a common per-part edge count so the per-device arrays stack into
one [P, E_max] pytree that shards trivially over the "nodes" mesh axis.

The reference keeps the entire graph on one device (reference utils.py:84
``adj.cuda()``); this descriptor is what lets the K-hop propagation scale
past one chip's HBM. Partitioning happens once on the host at load time —
it is part of graph construction, not the training step.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sgc_tpu.graph.sparse import SparseGraph

# Per-part edge padding granularity (multiple of the 8x128 VPU tile).
PART_EDGE_PAD = 1024


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m if n > 0 else m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("rows_local", "cols", "vals"),
    meta_fields=("n_parts", "rows_per_part", "n_rows", "n_cols", "nnz"),
)
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """P row-blocks of a sparse matrix, stacked along a leading device axis.

    Attributes:
      rows_local: int32[P, E_max] — destination row, local to the block
                  (in [0, rows_per_part)); padding edges point at the last
                  local row with val 0.
      cols:       int32[P, E_max] — global source column index.
      vals:       float32[P, E_max] — edge weight, 0 for padding.
      n_parts, rows_per_part: static partition geometry;
                  global padded rows = n_parts * rows_per_part.
      n_rows, n_cols: static original (unpadded) matrix shape.
      nnz:        true edge count across all parts.
    """

    rows_local: jnp.ndarray
    cols: jnp.ndarray
    vals: jnp.ndarray
    n_parts: int
    rows_per_part: int
    n_rows: int
    n_cols: int
    nnz: int

    @property
    def n_rows_padded(self) -> int:
        return self.n_parts * self.rows_per_part

    @property
    def edges_per_part(self) -> int:
        return self.rows_local.shape[1]


def partition_graph(
    graph: SparseGraph,
    n_parts: int,
    row_align: int = 8,
    edge_pad: int = PART_EDGE_PAD,
    device: bool = True,
) -> PartitionedGraph:
    """Split ``graph`` into ``n_parts`` contiguous row blocks (host-side).

    Rows are padded so every part owns the same number of rows (aligned to
    ``row_align`` sublanes); per-part edge lists are padded to the max part
    size rounded up to ``edge_pad``.

    ``device=False`` keeps the edge arrays host numpy — REQUIRED for
    host-only plan analysis (comm modelling, sharded-plan stats) on a
    tunneled backend: ``jnp.asarray`` on creation would ship ~50 MB/array
    to the chip and every later ``np.asarray`` (build_halo,
    build_sharded_blockdense) would fetch it back at tunnel bandwidth —
    measured as ~13 s of `array._value` inside the bench's plan region.
    The device path is unaffected: shard_map ships numpy args on call.
    """
    from sgc_tpu import native

    rows = np.asarray(graph.rows)[: graph.nnz]
    cols = np.asarray(graph.cols)[: graph.nnz]
    vals = np.asarray(graph.vals)[: graph.nnz]

    rows_per_part = _round_up(-(-graph.n_rows // n_parts), row_align)

    counts = native.edge_counts(rows, n_parts, rows_per_part)
    e_max = _round_up(int(counts.max()) if counts.size else 0, edge_pad)
    p_rows, p_cols, p_vals = native.partition_edges(
        rows, cols, vals, n_parts, rows_per_part, e_max, graph.n_cols
    )

    as_j = jnp.asarray if device else (lambda a: a)
    return PartitionedGraph(
        rows_local=as_j(p_rows),
        cols=as_j(p_cols),
        vals=as_j(p_vals),
        n_parts=n_parts,
        rows_per_part=rows_per_part,
        n_rows=graph.n_rows,
        n_cols=graph.n_cols,
        nnz=graph.nnz,
    )


def pad_node_rows(x: np.ndarray | jnp.ndarray, n_rows_padded: int) -> jnp.ndarray:
    """Zero-pad the node (row) dimension of features up to the partition size."""
    pad = n_rows_padded - x.shape[0]
    if pad < 0:
        raise ValueError(f"features have {x.shape[0]} rows > padded {n_rows_padded}")
    if pad == 0:
        return jnp.asarray(x)
    return jnp.concatenate(
        [jnp.asarray(x), jnp.zeros((pad,) + x.shape[1:], dtype=x.dtype)], axis=0
    )


def pad_feature_dim(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Zero-pad the trailing feature dimension to a multiple (for TP sharding)."""
    f = x.shape[-1]
    target = _round_up(f, multiple)
    if target == f:
        return x
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(0, target - f)]
    return jnp.pad(x, pad_widths)
