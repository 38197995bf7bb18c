"""Text-corpus dataset loader (TextSGC format).

Parity: reference downstream/TextSGC/utils.py:19-57 ``load_corpus`` —
per-phase id/label pickles ``ind.<ds>.{train,val,test}.{x,y}`` plus the
doc-word adjacency ``ind.<ds>.<subset>.adj``, normalized as
``normalize_adj(adj + I)`` (utils.py:59-71; note this is plain sym
normalization with self-loops, NOT the citation AugNormAdj which adds I
before computing degrees... they coincide: D is computed from A+I here
too). Also the 5-fold cross-validation variant
(downstream/TextSGC_ref/utils.py:59-97 ``load_corpus_crossval``).
"""

from __future__ import annotations

import dataclasses
import pickle
from pathlib import Path

import numpy as np

from sgc_tpu.graph.normalize import sym_normalized_adjacency_selfloops
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.utils.paths import data_dir


@dataclasses.dataclass(frozen=True)
class TextCorpusData:
    graph: SparseGraph                 # normalized doc-word adjacency
    index_dict: dict[str, np.ndarray]  # node ids per phase (docs only)
    label_dict: dict[str, np.ndarray]  # int labels per phase
    n_classes: int
    n_nodes: int


def _load_pickle(path: Path):
    with open(path, "rb") as f:
        return pickle.load(f, encoding="latin1")


def load_corpus(
    dataset: str,
    subset: str = "BCD",
    data_path: str | None = None,
    fold: int | None = None,
) -> TextCorpusData:
    """Load a text-graph dataset; ``fold`` selects a cross-validation fold
    (files ``ind.<ds>.<fold>.{train,val,test}.{x,y}``)."""
    root = data_dir(data_path, marker=f"ind.{dataset}.{subset}.adj")

    index_dict, label_dict = {}, {}
    for phase in ("train", "val", "test"):
        stem = (
            f"ind.{dataset}.{fold}.{phase}"
            if fold is not None
            else f"ind.{dataset}.{phase}"
        )
        index_dict[phase] = np.asarray(_load_pickle(root / f"{stem}.x"))
        label_dict[phase] = np.asarray(_load_pickle(root / f"{stem}.y"))

    adj = _load_pickle(root / f"ind.{dataset}.{subset}.adj").astype(np.float32)
    graph = SparseGraph.from_scipy(sym_normalized_adjacency_selfloops(adj))

    n_classes = 1 + int(max(
        label_dict[p].max() for p in label_dict if label_dict[p].size
    ))
    return TextCorpusData(
        graph=graph,
        index_dict=index_dict,
        label_dict=label_dict,
        n_classes=n_classes,
        n_nodes=adj.shape[0],
    )
