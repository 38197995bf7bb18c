"""Sharded inductive dual-adjacency propagation (SURVEY.md §7 hard part 6).

The reference's inductive Reddit flow computes TWO propagations
(reference reddit.py:43-47): the full graph for eval features and the
train-only sub-adjacency for training features (no test-node leakage).
Scaling this across a partitioned graph requires two partition
descriptors — one per adjacency — sharing one feature store.

Design: features live once as a ``[N_pad, F]`` array sharded over the
"nodes" axis of the mesh. Each adjacency gets its own
:class:`PartitionedGraph` + halo plan over its own row space; the train
propagation first *selects* its input rows (``x[idx_train]``, a gather
along the sharded node axis — XLA inserts the collective) and re-pads to
the train partition's row space. Both propagations then run the same
halo-exchanged SpMM hops.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.parallel.halo import build_halo
from sgc_tpu.parallel.mesh import NODES_AXIS
from sgc_tpu.parallel.partition import pad_node_rows, partition_graph
from sgc_tpu.parallel.spmm import propagate_sharded, shard_features


@dataclasses.dataclass
class DualPartition:
    """Two partition descriptors over one feature store."""

    full: object            # PartitionedGraph over all nodes
    train: object           # PartitionedGraph over train nodes
    full_halo: object
    train_halo: object
    idx_train: np.ndarray   # train node ids in full-graph numbering
    full_bd: object = None  # ShardedBlockDense plans (blockdense mode)
    train_bd: object = None


def build_dual_partition(
    full_graph: SparseGraph,
    train_graph: SparseGraph,
    idx_train: np.ndarray,
    n_parts: int,
    formulation: str = "segment",
    n_features: int | None = None,
    row_block: int = 512,
    stripe: int = 512,
) -> DualPartition:
    """Partition both adjacencies and precompute their exchange plans.

    ``formulation="blockdense"`` additionally builds the per-part
    dense-cell plans (parallel/blockdense.py) for BOTH adjacencies —
    the fast sharded formulation on the inductive dual flow;
    ``n_features`` (the per-chip feature width) is then required for
    the admission model.
    """
    pf = partition_graph(full_graph, n_parts)
    pt = partition_graph(train_graph, n_parts)
    hf = build_halo(pf)
    ht = build_halo(pt)
    full_bd = train_bd = None
    if formulation == "blockdense":
        if n_features is None:
            raise ValueError("blockdense needs n_features for admission")
        from sgc_tpu.parallel.blockdense import build_sharded_blockdense

        full_bd = build_sharded_blockdense(
            pf, hf, n_features, row_block=row_block, stripe=stripe)
        train_bd = build_sharded_blockdense(
            pt, ht, n_features, row_block=row_block, stripe=stripe)
    elif formulation != "segment":
        raise ValueError(f"unknown formulation {formulation!r}")
    return DualPartition(
        full=pf,
        train=pt,
        full_halo=hf,
        train_halo=ht,
        idx_train=np.asarray(idx_train),
        full_bd=full_bd,
        train_bd=train_bd,
    )


def inductive_dual_propagate(
    mesh,
    dual: DualPartition,
    x: jnp.ndarray,          # [N, F] raw features (unsharded or sharded)
    degree: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(eval_feats, train_feats): full-graph and train-subgraph S^K X.

    eval_feats  is sharded over the full partition's row space
    ([N_pad, F]); train_feats over the train partition's
    ([T_pad, F]). Both keep P("nodes", "feat") sharding.
    """
    n = dual.full.n_rows_padded

    x_full = shard_features(mesh, pad_node_rows(jnp.asarray(x), n))
    eval_feats = propagate_sharded(
        mesh, dual.full, x_full, degree, halo=dual.full_halo,
        blockdense=dual.full_bd,
    )

    # select train rows from the shared store, re-pad to the train row
    # space, reshard; the cross-shard gather compiles to a collective
    train_in = jnp.take(x_full, jnp.asarray(dual.idx_train), axis=0)
    train_in = shard_features(
        mesh, pad_node_rows(train_in, dual.train.n_rows_padded)
    )
    train_feats = propagate_sharded(
        mesh, dual.train, train_in, degree, halo=dual.train_halo,
        blockdense=dual.train_bd,
    )
    return eval_feats, train_feats
