"""Test configuration.

Tests run on a virtual 8-device CPU mesh so the multi-chip sharding paths
(halo exchange, pjit shardings) are exercised without TPU hardware:
``--xla_force_host_platform_device_count=8`` must be set before jax
initializes, hence this happens at conftest import time.
"""

import os
import sys
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment may pin JAX_PLATFORMS to a hardware backend (e.g. a
# tunneled TPU) via sitecustomize before this file runs; the programmatic
# config update below overrides it so tests stay local and fast.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import pytest  # noqa: E402


def reference_data_available(*files: str) -> bool:
    root = Path(os.environ.get("SGC_TPU_DATA", "/root/reference/data"))
    return all((root / f).exists() for f in files)


requires_cora = pytest.mark.skipif(
    not reference_data_available("ind.cora.x", "ind.cora.graph"),
    reason="cora dataset not available",
)
requires_citeseer = pytest.mark.skipif(
    not reference_data_available("ind.citeseer.x", "ind.citeseer.graph"),
    reason="citeseer dataset not available",
)
requires_pubmed = pytest.mark.skipif(
    not reference_data_available(
        "ind.pubmed.x", "ind.pubmed.graph", "ind.pubmed.allx"
    ),
    reason="pubmed dataset not available (allx is a missing large blob)",
)
requires_reddit = pytest.mark.skipif(
    not reference_data_available("reddit_adj.npz", "reddit.npz"),
    reason="reddit dataset not available",
)
