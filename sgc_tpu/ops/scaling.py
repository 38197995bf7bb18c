"""Train-statistic feature scaling (TextSGC min-max).

Parity: downstream/TextSGC/utils.py:137-150 — per-feature min/max are fit
on the train split, dimensions with zero range are dropped, and the same
affine transform is applied to val/test. Dropping dims is a data-dependent
shape change, so the mask is pulled to host once at fit time and the
compaction gather uses concrete indices (XLA needs static shapes).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MinMaxStats:
    keep: np.ndarray      # int indices of dims with range > 0 (host, static)
    mins: jnp.ndarray     # float32[len(keep)]
    ranges: jnp.ndarray   # float32[len(keep)]


def fit_minmax(train_feats: jnp.ndarray) -> MinMaxStats:
    """Fit per-feature min/range on the train matrix; drop zero-range dims."""
    mins = train_feats.min(axis=0)
    ranges = train_feats.max(axis=0) - mins
    keep = np.flatnonzero(np.asarray(ranges) > 0)
    return MinMaxStats(keep=keep, mins=mins[keep], ranges=ranges[keep])


def apply_minmax(stats: MinMaxStats, feats: jnp.ndarray) -> jnp.ndarray:
    """(feats[:, keep] - min) / range."""
    return (feats[:, stats.keep] - stats.mins[None, :]) / stats.ranges[None, :]
