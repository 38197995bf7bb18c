"""Experiment configuration.

A single dataclass config tree replaces the reference's scattered argparse
builders (args.py:4-40, per-script inline parsers); the ``--tuned``
file-override semantics (citation.py:17-23, downstream/TextSGC/
train.py:34-36) are kept: tuned per-dataset hyperparameters live in
``sgc_tpu/configs/tuned.json`` and override flag defaults on request.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

_TUNED_PATH = Path(__file__).resolve().parent.parent / "configs" / "tuned.json"


def load_tuned(family: str, dataset: str) -> dict:
    """Tuned hyperparameters for (family, dataset); {} if absent."""
    with open(_TUNED_PATH) as f:
        table = json.load(f)
    return table.get(family, {}).get(dataset, {})


@dataclasses.dataclass
class CitationConfig:
    dataset: str = "cora"
    seed: int = 42
    epochs: int = 100
    lr: float = 0.2
    weight_decay: float = 5e-6
    hidden: int = 0
    dropout: float = 0.0
    model: str = "SGC"
    normalization: str = "AugNormAdj"
    degree: int = 2
    tuned: bool = False

    def resolve(self) -> "CitationConfig":
        if self.tuned:
            family = "gcn" if self.model == "GCN" else "citation"
            for k, v in load_tuned(family, self.dataset).items():
                setattr(self, k, v)
        return self


@dataclasses.dataclass
class RedditConfig:
    seed: int = 42
    epochs: int = 2
    weight_decay: float = 0.0
    normalization: str = "AugNormAdj"
    model: str = "SGC"
    degree: int = 2
    inductive: bool = False
    test: bool = False


@dataclasses.dataclass
class TextConfig:
    dataset: str = "20ng"
    seed: int = 42
    epochs: int = 3
    weight_decay: float = 0.0
    degree: int = 2
    tuned: bool = False
    preprocessed: bool = False

    def resolve(self) -> "TextConfig":
        if self.tuned:
            for k, v in load_tuned("text", self.dataset).items():
                setattr(self, k, v)
        return self
