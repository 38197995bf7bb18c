"""Exchange validation + deterministic-mode checks (the race-detector analog).

The reference is single-threaded and needs no race detection (SURVEY.md §5);
once the halo exchange exists, silent communication corruption (wrong
send-index tables, mis-rotated all_to_all layouts, stale halo buffers)
becomes the GNN equivalent of a data race. This module provides:

* :func:`validate_exchange` — debug-mode checksum validation: every shard
  checksums the boundary rows it *sends* per destination, the checksums
  ride a second ``all_to_all`` as a tiny side channel, and each receiver
  recomputes checksums over the halo rows it *received*. A mismatch
  pinpoints the (src_part, dst_part) pair whose exchange corrupted data.
* :func:`assert_deterministic` — runs a function twice and asserts
  bitwise-identical results (the framework's reductions are fixed-order
  by construction; this catches regressions that introduce
  non-deterministic reductions — SURVEY.md §4c parity strategy).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sgc_tpu.parallel.mesh import NODES_AXIS


def _fold_checksum(x: jnp.ndarray) -> jnp.ndarray:
    """Position-sensitive float checksum over a (H, F) block of rows.

    Row i is weighted by (i + 1), so a permutation of rows within a block
    (a mis-slotted send table delivering the right multiset in the wrong
    order) changes the checksum — plain sums would not detect it. Cheap,
    not cryptographic."""
    x = x.astype(jnp.float32)
    w = jnp.arange(1, x.shape[0] + 1, dtype=jnp.float32)[:, None]
    return jnp.sum(w * x) + 0.5 * jnp.sum(w * jnp.abs(x))


def validate_exchange(
    mesh: Mesh,
    send_idx: jnp.ndarray,    # int32[P, P, H] (HaloDescriptor.send_idx)
    x: jnp.ndarray,           # float[N_pad, F] node features
    inject_fault: tuple[int, int] | None = None,
) -> np.ndarray:
    """Checksum-validate one halo exchange over the mesh.

    Returns the (P, P) matrix of |sent - received| checksum deltas
    (row = receiving/dst part, col = sending/src part); all-zero means
    the exchange is bit-faithful. Raises AssertionError on any mismatch.

    ``inject_fault=(src, dst)`` deliberately corrupts the halo block that
    ``dst`` receives from ``src`` after transport — the fault-injection
    hook (SURVEY.md §5 failure-detection row) that proves the validator
    detects real corruption; production calls leave it None.
    """
    n_parts = mesh.shape[NODES_AXIS]

    def body(send_idx, x_local):
        si = send_idx[0]                       # (P, H) rows we send per dst
        h = si.shape[1]
        send = jnp.take(x_local, si.reshape(-1), axis=0)       # (P*H, F)
        sent_sums = jax.vmap(_fold_checksum)(
            send.reshape(n_parts, h, -1)
        )                                                       # (P,)
        halo = jax.lax.all_to_all(
            send, NODES_AXIS, split_axis=0, concat_axis=0, tiled=True
        )
        if inject_fault is not None:
            src, dst = inject_fault
            me = jax.lax.axis_index(NODES_AXIS)
            blk = halo.reshape(n_parts, h, -1)
            corrupted = blk.at[src, 0, 0].add(1.0)
            halo = jnp.where(me == dst, corrupted, blk).reshape(halo.shape)
        recv_sums = jax.vmap(_fold_checksum)(
            halo.reshape(n_parts, h, -1)
        )                                                       # (P,)
        # ship each sent-checksum to its destination for comparison
        sent_at_dst = jax.lax.all_to_all(
            sent_sums.reshape(n_parts, 1), NODES_AXIS,
            split_axis=0, concat_axis=0, tiled=True,
        ).reshape(n_parts)
        return jnp.abs(sent_at_dst - recv_sums)[None, :]

    deltas = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(NODES_AXIS, None, None), P(NODES_AXIS, None)),
        out_specs=P(NODES_AXIS, None),
    )(send_idx, x)
    deltas = np.asarray(deltas)

    bad = np.argwhere(deltas > 0)
    if bad.size:
        dst, src = bad[0]
        raise AssertionError(
            f"halo exchange corruption: src part {src} -> dst part {dst} "
            f"checksum delta {deltas[dst, src]:.3e} "
            f"({len(bad)} corrupted pairs total)"
        )
    return deltas


def assert_deterministic(fn, *args, runs: int = 2) -> None:
    """Run ``fn`` ``runs`` times; assert bitwise-identical outputs."""
    ref = jax.tree_util.tree_map(np.asarray, fn(*args))
    for r in range(1, runs):
        got = jax.tree_util.tree_map(np.asarray, fn(*args))
        pairs = zip(
            jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(got)
        )
        for a, b in pairs:
            if not np.array_equal(a, b):
                diff = np.abs(
                    a.astype(np.float64) - b.astype(np.float64)
                ).max()
                raise AssertionError(
                    f"non-deterministic result on run {r}: max |delta| {diff}"
                )
