"""Synthetic benchmark graphs (Reddit-dimension stand-in).

The real Reddit npz (FastGCN export, reference README.md:66-68) is not
bundled; this generator builds a graph with Reddit's exact node / edge /
feature / class / train-row counts and a squared-uniform degree skew so
benchmark work matches the real shape (bench.py, cli/pallas_bench.py).
NOT the real power-law tail — results on it are labeled synthetic.
"""

from __future__ import annotations

import numpy as np

REDDIT_NODES = 232_965
REDDIT_EDGES = 11_606_919
REDDIT_FEATURES = 602
REDDIT_CLASSES = 41
REDDIT_TRAIN = 152_410


def synthetic_reddit(scale: float, seed: int = 42):
    """Build (graph, features, labels, idx_train) at ``scale`` of Reddit.

    Returns the aug-normalized :class:`SparseGraph` plus f32 features,
    int32 labels, and the train row ids (first ``REDDIT_TRAIN * scale``).
    """
    import scipy.sparse as sp

    from sgc_tpu.graph.normalize import aug_normalized_adjacency
    from sgc_tpu.graph.sparse import SparseGraph

    n = max(int(REDDIT_NODES * scale), 1024)
    e = max(int(REDDIT_EDGES * scale), 4096)
    rng = np.random.default_rng(seed)

    src = (rng.random(e // 2) ** 2 * n).astype(np.int64) % n
    dst = rng.integers(0, n, e // 2)
    adj = sp.coo_matrix(
        (np.ones(e // 2, dtype=np.float32), (src, dst)), shape=(n, n)
    )
    adj = adj + adj.T
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj))

    features = rng.normal(size=(n, REDDIT_FEATURES)).astype(np.float32)
    labels = rng.integers(0, REDDIT_CLASSES, n).astype(np.int32)
    n_train = min(max(int(REDDIT_TRAIN * scale), 256), n)
    return graph, features, labels, np.arange(n_train)
