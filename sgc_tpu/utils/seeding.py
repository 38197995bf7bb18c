"""Seeding.

JAX PRNG is functional, so "setting the seed" means minting a root key that
flows explicitly through init/dropout/sampling — the reference's global
``set_seed(42)`` (utils.py:99-102) becomes a key factory. numpy's global
state is still seeded for host-side preprocessing (shuffles, CV splits).
"""

from __future__ import annotations

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed numpy's global PRNG and return a JAX root key."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
