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


def data_dir(explicit: str | os.PathLike | None = None) -> Path:
    if explicit is not None:
        return Path(explicit)
    env = os.environ.get("SGC_TPU_DATA")
    if env:
        return Path(env)
    cwd_data = Path.cwd() / "data"
    if cwd_data.is_dir():
        return cwd_data
    if _REFERENCE_DATA.is_dir():
        return _REFERENCE_DATA
    raise FileNotFoundError(
        "no dataset directory found: pass a path, set SGC_TPU_DATA, or "
        "create ./data"
    )
