"""Planetoid citation dataset loader (Cora / Citeseer / Pubmed).

Parity: reference utils.py:32-90 ``load_citation`` — the ``ind.<ds>.*``
pickle format, the citeseer isolated-node zero-fill, test-index reorder,
max-symmetrization, and the canonical splits (train = first len(y) nodes,
val = next 500, test = sorted test.index). The adjacency is built directly
from the pickled dict-of-lists (no networkx dependency) and normalized
host-side, then shipped to device as a :class:`SparseGraph` + dense feature
matrix.
"""

from __future__ import annotations

import dataclasses
import pickle
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from sgc_tpu.graph.normalize import fetch_normalization, row_normalize, symmetrize_max
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.utils.paths import data_dir

PLANETOID_PARTS = ("x", "y", "tx", "ty", "allx", "ally", "graph")


@dataclasses.dataclass(frozen=True)
class CitationData:
    graph: SparseGraph          # normalized adjacency S
    features: jnp.ndarray       # float32[N, F], row-normalized
    labels: jnp.ndarray         # int32[N]
    idx_train: np.ndarray
    idx_val: np.ndarray
    idx_test: np.ndarray
    n_classes: int


def _load_pickle(path: Path):
    with open(path, "rb") as f:
        return pickle.load(f, encoding="latin1")


def parse_index_file(path: Path) -> list[int]:
    return [int(line.strip()) for line in open(path)]


def adjacency_from_dict(graph: dict[int, list[int]], n: int) -> sp.coo_matrix:
    """Binary symmetric adjacency from a dict-of-neighbor-lists."""
    rows, cols = [], []
    for u, nbrs in graph.items():
        for v in nbrs:
            rows.append(u)
            cols.append(v)
            rows.append(v)
            cols.append(u)
    adj = sp.coo_matrix(
        (np.ones(len(rows), dtype=np.float32), (rows, cols)), shape=(n, n)
    ).tocsr()
    adj.data[:] = 1.0  # collapse duplicate edges to a simple graph
    # dict-of-lists self-loops are KEPT, matching the reference's
    # nx.from_dict_of_lists -> adjacency_matrix (utils.py:62; citeseer
    # has 124 of them). Goldens are insensitive (0.810/0.718 either way)
    # but per-hop parity against the reference pipeline requires the
    # same operator.
    return adj.tocoo()


def load_citation(
    dataset: str = "cora",
    normalization: str = "AugNormAdj",
    data_path: str | None = None,
) -> CitationData:
    dataset = dataset.lower()   # one normalization for every path below
    root = data_dir(data_path, marker=f"ind.{dataset}.x")
    objs = {p: _load_pickle(root / f"ind.{dataset}.{p}") for p in PLANETOID_PARTS}
    x, y = objs["x"], objs["y"]
    tx, ty = objs["tx"], objs["ty"]
    allx, ally, graph = objs["allx"], objs["ally"], objs["graph"]

    test_idx_reorder = np.array(parse_index_file(root / f"ind.{dataset}.test.index"))
    test_idx_range = np.sort(test_idx_reorder)

    if dataset == "citeseer":
        # Citeseer has isolated test nodes missing from tx/ty: place the
        # known rows at their positions and zero-fill the gaps
        # (reference utils.py:49-58).
        full = range(test_idx_reorder.min(), test_idx_reorder.max() + 1)
        tx_ext = sp.lil_matrix((len(full), x.shape[1]))
        tx_ext[test_idx_range - test_idx_reorder.min(), :] = tx
        tx = tx_ext
        ty_ext = np.zeros((len(full), y.shape[1]))
        ty_ext[test_idx_range - test_idx_reorder.min(), :] = ty
        ty = ty_ext

    features = np.asarray(sp.vstack((allx, tx)).todense(), dtype=np.float32)
    features[test_idx_reorder, :] = features[test_idx_range, :]

    n = features.shape[0]
    adj = symmetrize_max(adjacency_from_dict(graph, n))

    labels_onehot = np.vstack((ally, ty))
    labels_onehot[test_idx_reorder, :] = labels_onehot[test_idx_range, :]
    labels = labels_onehot.argmax(axis=1).astype(np.int32)

    idx_test = test_idx_range
    idx_train = np.arange(y.shape[0])
    idx_val = np.arange(y.shape[0], y.shape[0] + 500)

    adj_norm = fetch_normalization(normalization)(adj)
    features = row_normalize(features)

    return CitationData(
        graph=SparseGraph.from_scipy(adj_norm),
        features=jnp.asarray(features),
        labels=jnp.asarray(labels),
        idx_train=idx_train,
        idx_val=idx_val,
        idx_test=idx_test,
        n_classes=int(labels_onehot.shape[1]),
    )
