"""Per-shard host staging: sharded arrays larger than any one device.

The reference loads the full feature matrix into one GPU before training
(reference utils.py:104-131, reddit.py:43-47) — its capacity ceiling is
one device's memory. The mesh exists to break that ceiling (SURVEY §5
"long-context" row: node count is the scaling dimension), but a sharded
array built by ``jax.device_put(full_host_array, sharding)`` still
requires the FULL value as one contiguous buffer first, and on a real
pod the per-host staging buffer (or a single chip, when someone debugs
on one) becomes the limit instead of the aggregate HBM.

This module builds the sharded feature matrix one shard at a time from a
row *provider* — a callable that materializes any requested row range on
demand. ``jax.make_array_from_callback`` asks for exactly the index
ranges of the shards addressable by this process, so peak memory is one
shard (N*F/D bytes), never N*F:

    provider = synthetic_features(n_rows, n_cols, seed=0)
    x = stage_rows(mesh, provider)                # [N_pad, F_pad] sharded

Providers are plain callables ``provider(start, stop) -> np.ndarray``
of shape ``[stop-start, n_cols]`` with ``.shape``/``.dtype`` attributes
— a memory-mapped ``.npy`` (``numpy.load(mmap_mode="r")`` wrapped by
:func:`mmap_rows`), a per-row generator, or a slice of a larger store.
Zero-padding (rows to the partition geometry, columns to the TP tiling)
happens inside the callback, per shard.

``fit_sharded`` accepts a provider for ``features`` and routes it here;
``scripts/exp_beyond_device.py`` is the capability demo (a working set
larger than one v5e HBM trained on the 8-device mesh).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from sgc_tpu.parallel.mesh import FEAT_AXIS, NODES_AXIS

# One v5e chip's HBM — the capacity bar the staged path is measured
# against (a working set above this provably needs >1 device).
V5E_HBM_BYTES = 16 * 1024**3


def is_provider(obj) -> bool:
    """Duck-type check: a row provider is callable with a 2-D ``shape``."""
    return (
        callable(obj)
        and not isinstance(obj, (np.ndarray, jax.Array))
        and hasattr(obj, "shape")
        and len(obj.shape) == 2
    )


class mmap_rows:
    """Row provider over an on-disk ``.npy`` (no full load; OS page cache
    streams each shard's rows exactly once)."""

    def __init__(self, path):
        self._arr = np.load(path, mmap_mode="r")
        if self._arr.ndim != 2:
            raise ValueError(f"{path}: expected 2-D array, got {self._arr.shape}")
        self.shape = self._arr.shape
        self.dtype = self._arr.dtype

    def __call__(self, start: int, stop: int) -> np.ndarray:
        return np.asarray(self._arr[start:stop])


class synthetic_features:
    """Deterministic synthetic row provider with O(1) state.

    Values come from a splitmix64-style integer hash of (row, col, seed)
    — any row range can be materialized independently and reproducibly,
    so a multi-terabyte feature matrix "exists" without ever being
    stored. Output is uniform in [-0.5, 0.5).
    """

    def __init__(self, n_rows: int, n_cols: int, seed: int = 0,
                 dtype=np.float32):
        self.shape = (int(n_rows), int(n_cols))
        self.dtype = np.dtype(dtype)
        self.seed = int(seed)

    def __call__(self, start: int, stop: int) -> np.ndarray:
        i = np.arange(start, stop, dtype=np.uint64)[:, None]
        j = np.arange(self.shape[1], dtype=np.uint64)[None, :]
        h = (i * np.uint64(0x9E3779B97F4A7C15)
             + j * np.uint64(0xC2B2AE3D27D4EB4F)
             + np.uint64((self.seed * 0xD6E8FEB86659FD93 + 1)
                         & 0xFFFFFFFFFFFFFFFF))
        h ^= h >> np.uint64(31)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        # top 24 bits -> [0, 1) -> [-0.5, 0.5)
        vals = (h >> np.uint64(40)).astype(np.float32) / np.float32(2**24)
        return (vals - np.float32(0.5)).astype(self.dtype, copy=False)


def stage_rows(mesh, provider, n_rows_padded: int | None = None,
               n_cols_padded: int | None = None,
               dtype=np.float32) -> jax.Array:
    """Build a P("nodes", "feat")-sharded [N_pad, F_pad] array shard by
    shard from ``provider`` — the full matrix never exists in one buffer.

    Rows beyond ``provider.shape[0]`` and columns beyond
    ``provider.shape[1]`` are zero (the same padding contract as
    ``pad_node_rows``/``pad_feature_dim``). Defaults pad rows to the
    "nodes" axis and columns to 8x the "feat" axis (the TP tiling
    ``fit_sharded`` uses).
    """
    n_rows, n_cols = (int(s) for s in provider.shape)
    n_nodes_parts = mesh.shape[NODES_AXIS]
    n_feat_parts = mesh.shape[FEAT_AXIS]
    if n_rows_padded is None:
        n_rows_padded = -(-n_rows // n_nodes_parts) * n_nodes_parts
    if n_cols_padded is None:
        mult = 8 * n_feat_parts
        n_cols_padded = -(-n_cols // mult) * mult
    if n_rows_padded < n_rows:
        raise ValueError(f"n_rows_padded {n_rows_padded} < provider rows {n_rows}")
    if n_cols_padded < n_cols:
        raise ValueError(f"n_cols_padded {n_cols_padded} < provider cols {n_cols}")
    shape = (int(n_rows_padded), int(n_cols_padded))
    sharding = NamedSharding(mesh, P(NODES_AXIS, FEAT_AXIS))
    dtype = np.dtype(dtype)

    def _shard(index):
        rs, cs = index
        r0 = rs.start or 0
        r1 = shape[0] if rs.stop is None else rs.stop
        c0 = cs.start or 0
        c1 = shape[1] if cs.stop is None else cs.stop
        out = np.zeros((r1 - r0, c1 - c0), dtype)
        vr = min(r1, n_rows) - r0          # valid (unpadded) extent
        vc = min(c1, n_cols) - c0
        if vr > 0 and vc > 0:
            block = np.asarray(provider(r0, r0 + vr))
            out[:vr, :vc] = block[:, c0:c0 + vc]
        return out

    # place shard-by-shard (not make_array_from_callback, which holds
    # every shard's host block until the whole array assembles — a
    # ~1.5x-store transient measured on the beyond-device probe,
    # DESIGN §staging): each host block is freed as soon as its device
    # put lands, so peak host overhead is ONE shard block.
    arrays = []
    for d, index in sharding.addressable_devices_indices_map(shape).items():
        block = _shard(index)
        arrays.append(jax.device_put(block, d))
        del block
        arrays[-1].block_until_ready()
    return jax.make_array_from_single_device_arrays(
        shape, sharding, arrays)


def sharding_report(x: jax.Array) -> dict:
    """Size evidence for a sharded array: global vs per-device bytes and
    whether the global value exceeds one v5e's HBM."""
    shards = x.addressable_shards
    per_dev = max(s.data.nbytes for s in shards) if shards else 0
    total = int(np.prod([int(d) for d in x.shape])) * x.dtype.itemsize
    return {
        "global_shape": tuple(int(d) for d in x.shape),
        "global_gb": round(total / 1e9, 2),
        "n_shards": len(shards),
        "per_device_gb": round(per_dev / 1e9, 3),
        "exceeds_v5e_hbm": total > V5E_HBM_BYTES,
        "fits_per_device_v5e": per_dev < V5E_HBM_BYTES,
    }
