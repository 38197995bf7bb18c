"""Dataset path resolution.

Datasets are external artifacts (Planetoid pickles, Reddit npz, text-graph
exports). The search order is: explicit argument > ``SGC_TPU_DATA`` env var
> ``./data`` in the working directory > the read-only reference checkout's
data directory (if mounted).
"""

from __future__ import annotations

import os
from pathlib import Path

_REFERENCE_DATA = Path("/root/reference/data")


def data_dir(
    explicit: str | os.PathLike | None = None, marker: str | None = None
) -> Path:
    """Resolve the dataset directory.

    With ``marker`` set, ``./data`` and the reference checkout are only
    chosen if they actually contain that file — so a partially-populated
    local ./data does not shadow datasets that live elsewhere.
    """
    if explicit is not None:
        return Path(explicit)
    env = os.environ.get("SGC_TPU_DATA")
    if env:
        return Path(env)
    candidates = [Path.cwd() / "data", _REFERENCE_DATA]
    for c in candidates:
        if c.is_dir() and (marker is None or (c / marker).exists()):
            return c
    for c in candidates:
        if c.is_dir():
            return c
    raise FileNotFoundError(
        "no dataset directory found: pass a path, set SGC_TPU_DATA, or "
        "create ./data"
    )
