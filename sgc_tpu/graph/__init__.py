from sgc_tpu.graph.sparse import SparseGraph, pad_edges_to
from sgc_tpu.graph.normalize import (
    aug_normalized_adjacency,
    fetch_normalization,
    row_normalize,
    normalize_adjacency_device,
    symmetrize_max,
)

__all__ = [
    "SparseGraph",
    "pad_edges_to",
    "aug_normalized_adjacency",
    "fetch_normalization",
    "row_normalize",
    "normalize_adjacency_device",
    "symmetrize_max",
]
