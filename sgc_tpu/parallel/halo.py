"""Halo exchange: boundary-feature all-to-all for partitioned SpMM.

The all-gather exchange moves the full N x F/pf feature matrix to every
chip each hop. For well-partitioned graphs each row block only references
a subset of remote columns (the "halo"); exchanging exactly those rows
via a single all_to_all is the bandwidth-optimal pattern — the ring-
attention analog for graphs (SURVEY.md §5 long-context note).

Host-side, once per graph:
  * for every (src q -> dst p) pair, the sorted unique columns of p's
    edges that q owns become q's send list to p,
  * all pair lists are padded to a common halo width H,
  * edge columns are remapped into halo-buffer coordinates
    (q * H + position), so the device-side gather is a plain local take.

Device-side, per hop (inside shard_map on chip q):
  1. pack:    send[p] = x_local[send_idx[q, p]]          (local gather)
  2. exchange: all_to_all over the "nodes" axis          (ICI)
  3. compute: contrib = halo[cols_halo] * vals -> segment_sum row block.

Comm volume per chip: P*H*F vs N*F for all-gather; ``halo_fraction``
reports H*P/N so callers can auto-select (random graphs approach 1.0 and
should stay on all-gather; locality-partitioned graphs win big).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sgc_tpu.parallel.mesh import NODES_AXIS
from sgc_tpu.parallel.partition import PartitionedGraph, _round_up

HALO_PAD = 8


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("send_idx", "cols_halo"),
    meta_fields=("halo_width", "n_parts"),
)
@dataclasses.dataclass(frozen=True)
class HaloDescriptor:
    """Static exchange plan for one partitioned graph.

    send_idx:  int32[P, P, H] — send_idx[q, p] = local row ids chip q
               sends to chip p (padded with 0; padded slots are never
               referenced by any edge).
    cols_halo: int32[P, E_max] — edge columns remapped to halo-buffer
               positions (src_part * H + slot).
    """

    send_idx: jnp.ndarray
    cols_halo: jnp.ndarray
    halo_width: int
    n_parts: int


def build_halo(pgraph: PartitionedGraph) -> HaloDescriptor:
    """Compute the exchange plan from a partitioned graph (host-side).

    Locally-owned columns never enter the exchange: the device-side gather
    table is ``concat(x_local, halo_buffer)`` and local edges index the
    first R rows directly. H is therefore the max REMOTE unique-column
    count over (dst, src) pairs — intra-block edges cost nothing.
    """
    P = pgraph.n_parts
    R = pgraph.rows_per_part
    cols = np.asarray(pgraph.cols)          # [P, E_max] global columns
    vals = np.asarray(pgraph.vals)

    # per-(dst p, src q != p) unique needed remote columns
    needed: list[list[np.ndarray]] = [[None] * P for _ in range(P)]
    h_max = 1
    for p in range(P):
        real = vals[p] != 0
        c = cols[p][real]
        src = np.minimum(c // R, P - 1)
        for q in range(P):
            if q == p:
                needed[p][q] = np.empty(0, dtype=np.int64)
                continue
            u = np.unique(c[src == q])
            needed[p][q] = u
            h_max = max(h_max, len(u))
    H = _round_up(h_max, HALO_PAD)

    send_idx = np.zeros((P, P, H), dtype=np.int32)
    cols_halo = np.zeros_like(cols, dtype=np.int32)
    for p in range(P):
        # gather-table layout on chip p: rows [0, R) = x_local,
        # rows [R + q*H, R + (q+1)*H) = halo block received from q.
        for q in range(P):
            if q == p:
                continue
            u = needed[p][q]
            send_idx[q, p, : len(u)] = u - q * R   # local ids on q
        real = vals[p] != 0
        c = cols[p]
        src = np.minimum(c // R, P - 1)
        mapped = np.zeros(cols.shape[1], dtype=np.int32)
        local = real & (src == p)
        mapped[local] = (c[local] - p * R).astype(np.int32)
        # remote columns, vectorized per source part: each needed[p][q] is
        # sorted-unique, so the slot of a global column is its searchsorted
        # position (no per-edge Python)
        for q in range(P):
            if q == p:
                continue
            u = needed[p][q]
            if not len(u):
                continue
            sel = real & (src == q)
            if not sel.any():
                continue
            slots = np.searchsorted(u, c[sel])
            mapped[sel] = (R + q * H + slots).astype(np.int32)
        cols_halo[p] = mapped

    return HaloDescriptor(
        send_idx=jnp.asarray(send_idx),
        cols_halo=jnp.asarray(cols_halo),
        halo_width=H,
        n_parts=P,
    )


def halo_fraction(halo: HaloDescriptor, pgraph: PartitionedGraph) -> float:
    """Fraction of the padded node count exchanged per hop (<1 is a win)."""
    return halo.n_parts * halo.halo_width / pgraph.n_rows_padded


def exchange_and_spmm(
    rows_local: jnp.ndarray,      # [E] local destination rows (this chip)
    cols_halo: jnp.ndarray,       # [E] halo-buffer positions (this chip)
    vals: jnp.ndarray,            # [E]
    send_idx: jnp.ndarray,        # [P, H] rows this chip sends to each peer
    x_local: jnp.ndarray,         # [R, F] local feature rows
    rows_per_part: int,
) -> jnp.ndarray:
    """One halo-exchanged SpMM hop; call inside shard_map over "nodes"."""
    send = jnp.take(x_local, send_idx.reshape(-1), axis=0)   # (P*H, F)
    halo = jax.lax.all_to_all(
        send, NODES_AXIS, split_axis=0, concat_axis=0, tiled=True
    )                                                        # (P*H, F)
    table = jnp.concatenate([x_local, halo], axis=0)         # (R + P*H, F)
    contrib = jnp.take(table, cols_halo, axis=0) * vals[:, None]
    return jax.ops.segment_sum(
        contrib, rows_local, num_segments=rows_per_part,
        indices_are_sorted=False,
    )
