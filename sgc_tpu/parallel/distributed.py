"""Multi-process (multi-host) array placement and retrieval.

The SPMD programs in :mod:`sgc_tpu.parallel` are mesh-generic: the same
``shard_map`` step runs on a single-process virtual mesh (tests), one
real slice (ICI), or a mesh spanning multiple processes (the DCN regime
— ``jax.distributed``). What differs across those regimes is only how
host data gets ON the mesh and how results come back OFF it:

* single process — every device is addressable; ``jax.device_put`` and
  ``jax.device_get`` just work.
* multi process — each process addresses only its local devices. Host
  input must be placed shard-wise (every process passes the SAME full
  host value and contributes its local shards); fetching a value that
  spans processes needs a collective (``process_allgather``).

:func:`put_global` and :func:`fetch_global` hide that difference so
callers (``fit_sharded``, CLIs) contain no process-count branches.

The reference has no distributed path at all (SURVEY.md §2.5); its only
multi-device construct is ``torch.nn.DataParallel`` in the XLNet
baseline (reference xlnet/xlnet.py:163-164).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def put_global(mesh: Mesh, spec: P, value) -> jax.Array:
    """Place a full host array onto ``mesh`` with PartitionSpec ``spec``.

    Works identically in single- and multi-process runs. In the
    multi-process case every participating process must call this with
    the same full host value (the usual SPMD contract: data construction
    is deterministic per process); each process materializes only the
    shards its local devices own.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        # device_put handles host and device values alike (no forced
        # host roundtrip for values already on device)
        return jax.device_put(value, sharding)
    arr = np.asarray(value)
    # Shard-wise construction: the callback is invoked once per local
    # shard with the global index of that shard.
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def fetch_global(value: jax.Array) -> np.ndarray:
    """Full host value of a (possibly process-spanning) global array.

    Single process / fully-addressable: a plain device_get. Otherwise the
    local shards are assembled when they cover the full value (e.g. a
    tensor-parallel weight whose shards are all present on every
    process), falling back to a cross-process allgather — so this is a
    COLLECTIVE in the general case: all processes must call it together,
    in the same order, like any other SPMD operation.
    """
    if not isinstance(value, jax.Array):
        return np.asarray(value)
    if jax.process_count() == 1 or value.is_fully_addressable:
        return np.asarray(jax.device_get(value))
    if value.is_fully_replicated:
        return np.asarray(value.addressable_data(0))
    # Do the local shards cover every element? (True for shardings that
    # only partition over process-local mesh axes.)
    covered = np.zeros(value.shape, dtype=bool)
    for shard in value.addressable_shards:
        covered[shard.index] = True
    if bool(covered.all()):
        out = np.empty(value.shape, dtype=value.dtype)
        for shard in value.addressable_shards:
            out[shard.index] = np.asarray(shard.data)
        return out
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(value, tiled=True)
    )


def scrub_single_host_tpu_env() -> None:
    """Remove stale single-host TPU cluster-detection variables.

    Some single-chip TPU runtimes export cluster-shaped variables (e.g.
    ``TPU_WORKER_HOSTNAMES=localhost``) that make
    ``jax.distributed.initialize`` mis-detect a one-worker TPU pod and
    ignore explicitly passed coordinator/process arguments. Call this
    before initializing an explicit multi-process CPU/GPU cluster on
    such a host. (Measured on this terminal: with the variable present,
    two CPU processes each came up as their own 1-process cluster; with
    it scrubbed, the same launch forms the 2-process global mesh.)
    """
    import os

    for k in ("TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID", "TPU_ACCELERATOR_TYPE"):
        os.environ.pop(k, None)
