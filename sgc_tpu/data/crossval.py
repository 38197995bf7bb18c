"""Stratified k-fold cross-validation id generation.

Parity: reference downstream/TextSGC_ref/crossval_ids.py:25-33 — 5-fold
sklearn StratifiedKFold over the metadata file's labels; each fold writes
``ind.<ds>.<fold>.{train,val,test}.{x,y}`` pickles (:86-108), where the
fold's held-out chunk is the test set and a slice of the remaining docs
becomes validation.
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np
from sklearn.model_selection import StratifiedKFold


def make_crossval_ids(
    metadata_path: str | Path,
    out_dir: str | Path,
    dataset: str,
    n_folds: int = 5,
    val_fraction: float = 0.1,
    seed: int = 42,
    shuffle: bool = False,
) -> list[dict]:
    """Generate per-fold id/label pickles from a metadata file.

    Metadata lines: ``<id>\\t<train|test>\\t<label>`` — the original
    train/test phases are ignored; folding re-splits ALL docs (reference
    crossval_ids.py treats the full corpus as one pool).
    """
    labels = []
    with open(metadata_path) as f:
        for line in f:
            labels.append(line.strip().split("\t")[2])
    label_names = sorted(set(labels))
    label_to_idx = {l: i for i, l in enumerate(label_names)}
    y = np.asarray([label_to_idx[l] for l in labels])
    ids = np.arange(len(y))

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    # reference crossval_ids.py:25 uses StratifiedKFold(n_splits=5) with
    # NO shuffle — contiguous per-class chunks per fold; shuffle=True is
    # an opt-in deviation
    skf = StratifiedKFold(
        n_splits=n_folds, shuffle=shuffle,
        random_state=seed if shuffle else None,
    )

    folds = []
    for fold, (train_val, test) in enumerate(skf.split(ids, y)):
        train_val = train_val[rng.permutation(len(train_val))]
        n_val = int(val_fraction * len(train_val))
        val = train_val[:n_val]
        train = train_val[n_val:]
        split = {"train": train, "val": val, "test": test}
        for phase, idx in split.items():
            with open(out_dir / f"ind.{dataset}.{fold}.{phase}.x", "wb") as f:
                pickle.dump([int(i) for i in idx], f)
            with open(out_dir / f"ind.{dataset}.{fold}.{phase}.y", "wb") as f:
                pickle.dump([int(y[i]) for i in idx], f)
        folds.append({p: np.asarray(i) for p, i in split.items()})
    return folds
