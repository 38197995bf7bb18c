"""Device-mesh construction for graph-partitioned SGC/GCN training.

Axes:
  "nodes" — graph rows are block-partitioned over this axis. Each chip owns
            a contiguous row range of S and the matching feature-row shard.
            This is the scaling axis for node count (the reference's only
            "long dimension", SURVEY.md §5) and doubles as the data-parallel
            axis for the full-batch linear-head step.
  "feat"  — tensor-parallel axis: the linear head's weight matrix is
            row-sharded over the (propagated) feature dimension; logits are
            assembled with a psum over this axis.

A single chip gets a (1, 1) mesh and all code paths degrade to local
compute with no collectives — there is no separate single-device code path.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

NODES_AXIS = "nodes"
FEAT_AXIS = "feat"


def make_mesh(
    n_nodes_parts: int | None = None,
    n_feat_parts: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("nodes", "feat") mesh over ``devices`` (default: all).

    If ``n_nodes_parts`` is None, all devices go to the "nodes" axis after
    carving out ``n_feat_parts`` for "feat".
    """
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_nodes_parts is None:
        if n_dev % n_feat_parts:
            raise ValueError(
                f"{n_dev} devices not divisible by feat axis {n_feat_parts}"
            )
        n_nodes_parts = n_dev // n_feat_parts
    need = n_nodes_parts * n_feat_parts
    if need > n_dev:
        raise ValueError(f"mesh {n_nodes_parts}x{n_feat_parts} needs {need} devices, have {n_dev}")
    grid = np.asarray(devices[:need]).reshape(n_nodes_parts, n_feat_parts)
    return Mesh(grid, (NODES_AXIS, FEAT_AXIS))


def default_mesh_shape(n_devices: int) -> tuple[int, int]:
    """Pick a (nodes, feat) factorization for n devices.

    Prefers a small tensor-parallel factor (2) when available: the linear
    head is the only dense compute, and node partitioning is where the
    graph-side scaling comes from.
    """
    if n_devices % 2 == 0 and n_devices >= 4:
        return (n_devices // 2, 2)
    return (n_devices, 1)
