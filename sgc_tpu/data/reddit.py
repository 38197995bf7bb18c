"""Reddit dataset loader (233K nodes / ~11.6M edges, inductive).

Parity: reference utils.py:104-131 — npz adjacency + features, labels
scattered from per-split vectors, ``adj = adj + adj.T`` symmetrization,
the train-only sub-adjacency for inductive training (``adj[train][:,
train]``), feature standardization (zero mean / unit std, flagged critical
in reference README.md:8), and AugNormAdj normalization of BOTH
adjacencies. The data files (``reddit_adj.npz`` + ``reddit.npz``) are the
FastGCN export and are not bundled.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from sgc_tpu.graph.normalize import fetch_normalization, standardize_features
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.utils.paths import data_dir


@dataclasses.dataclass(frozen=True)
class RedditData:
    graph: SparseGraph        # normalized full adjacency
    train_graph: SparseGraph  # normalized train-only sub-adjacency
    features: jnp.ndarray     # standardized float32[N, F]
    labels: jnp.ndarray       # int32[N]
    idx_train: np.ndarray
    idx_val: np.ndarray
    idx_test: np.ndarray
    n_classes: int


def load_reddit(
    normalization: str = "AugNormAdj", data_path: str | None = None
) -> RedditData:
    root = data_dir(data_path, marker="reddit_adj.npz")
    adj = sp.load_npz(root / "reddit_adj.npz")
    data = np.load(root / "reddit.npz")
    y_train, y_val, y_test = data["y_train"], data["y_val"], data["y_test"]
    train_index = data["train_index"]
    val_index = data["val_index"]
    test_index = data["test_index"]

    labels = np.zeros(adj.shape[0], dtype=np.int32)
    labels[train_index] = y_train
    labels[val_index] = y_val
    labels[test_index] = y_test

    adj = adj + adj.T
    train_adj = adj[train_index, :][:, train_index]

    normalizer = fetch_normalization(normalization)
    graph = SparseGraph.from_scipy(normalizer(adj))
    train_graph = SparseGraph.from_scipy(normalizer(train_adj))

    features = standardize_features(jnp.asarray(data["feats"], dtype=jnp.float32))

    return RedditData(
        graph=graph,
        train_graph=train_graph,
        features=features,
        labels=jnp.asarray(labels),
        idx_train=np.asarray(train_index),
        idx_val=np.asarray(val_index),
        idx_test=np.asarray(test_index),
        n_classes=int(labels.max()) + 1,
    )
