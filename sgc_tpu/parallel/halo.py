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
    data_fields=("send_idx", "cols_halo", "edges_int", "edges_bnd"),
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
    edges_int / edges_bnd: optional (rows, cols, vals) triples from
               ``build_halo(overlap=True)`` — the per-part edge list
               split into INTERIOR edges (cols index x_local) and
               BOUNDARY edges (cols index the halo buffer). With the
               split, the hop's interior segment-sum has no data
               dependence on the ``all_to_all``, so XLA's async
               collectives hide the ICI exchange behind local compute
               (SURVEY §7 hard-part 2: "hiding all-to-all latency
               behind local SpMM").
    """

    send_idx: jnp.ndarray
    cols_halo: jnp.ndarray
    halo_width: int
    n_parts: int
    edges_int: tuple | None = None
    edges_bnd: tuple | None = None

    @property
    def overlapped(self) -> bool:
        return self.edges_int is not None


def build_halo(pgraph: PartitionedGraph,
               overlap: bool = False,
               device: bool = True) -> HaloDescriptor:
    """Compute the exchange plan from a partitioned graph (host-side).

    Locally-owned columns never enter the exchange: the device-side gather
    table is ``concat(x_local, halo_buffer)`` and local edges index the
    first R rows directly. H is therefore the max REMOTE unique-column
    count over (dst, src) pairs — intra-block edges cost nothing. (H is a
    single global width because ``all_to_all`` needs equal per-peer block
    sizes; hub-heavy pairs therefore pad every pair's buffer —
    ``halo_stats`` reports the mean/max widths so the padding cost is
    visible.)

    Fully vectorized: one sort of (dst_part, src_part, col) composite keys
    replaces the former O(P^2) per-pair ``np.unique`` loops — the plan for
    a 10M-edge graph at P=256 builds in seconds (see
    tests/test_halo.py::test_build_halo_scales).
    """
    from sgc_tpu.utils.alloc import ensure_fault_rate

    # fault-wall guard (DESIGN §2e): the flat masks/keys/argsort below
    # allocate ~10x the edge bytes; compaction first if the machine is
    # in its fragmented 27 us/page state (probe is ~20 ms when healthy,
    # and rate-limited to once a minute)
    ensure_fault_rate()

    P = pgraph.n_parts
    R = pgraph.rows_per_part
    cols = np.asarray(pgraph.cols)          # [P, E_max] global columns
    vals = np.asarray(pgraph.vals)
    e_max = cols.shape[1]

    real = (vals != 0).ravel()
    flat_cols = cols.ravel().astype(np.int64)
    dst = np.repeat(np.arange(P, dtype=np.int64), e_max)
    src = np.minimum(flat_cols // R, P - 1)

    remote = real & (src != dst)
    r_dst, r_src, r_col = dst[remote], src[remote], flat_cols[remote]
    n_rem = len(r_col)

    # composite key (dst, src, col); fits int64 alongside P^2 pairs.
    # ONE argsort replaces the former per-pair np.unique loops AND the
    # follow-up searchsorted: dedup flags, per-pair slots, and the edge
    # remap all come from linear passes over the sorted order.
    ncp = np.int64(P) * R                   # padded column space
    pair = r_dst * P + r_src                # [0, P^2)
    key = pair * ncp + r_col
    order = np.argsort(key, kind="stable")
    ks = key[order]

    is_new = np.empty(n_rem, dtype=bool)
    is_new_pair = np.empty(n_rem, dtype=bool)
    if n_rem:
        is_new[0] = True
        np.not_equal(ks[1:], ks[:-1], out=is_new[1:])
        pair_s = ks // ncp
        is_new_pair[0] = True
        np.not_equal(pair_s[1:], pair_s[:-1], out=is_new_pair[1:])
    else:
        pair_s = ks

    # unique id per sorted element; group-start uid propagated forward
    uid = np.cumsum(is_new) - 1
    group_uid0 = np.maximum.accumulate(np.where(is_new_pair, uid, -1))
    slot_s = uid - group_uid0               # halo slot per sorted element

    h_max = int(slot_s.max()) + 1 if n_rem else 1
    H = _round_up(max(h_max, 1), HALO_PAD)

    # send_idx[q, p, slot] = local row id on q  (flat scatter, one pass
    # over the unique elements)
    send_idx = np.zeros(P * P * H, dtype=np.int32)
    u_pair = pair_s[is_new]
    u_col = ks[is_new] % ncp
    u_src = u_pair % P
    u_dst = u_pair // P
    send_flat = u_src * (P * H) + u_dst * H + slot_s[is_new]
    send_idx[send_flat] = (u_col - u_src * R).astype(np.int32)
    send_idx = send_idx.reshape(P, P, H)

    # remap every edge column into the gather-table layout on its chip:
    # rows [0, R) = x_local, rows [R + q*H, R + (q+1)*H) = halo from q
    mapped = np.zeros(P * e_max, dtype=np.int32)
    local = real & (src == dst)
    mapped[local] = (flat_cols[local] - dst[local] * R).astype(np.int32)
    remote_map = np.empty(n_rem, dtype=np.int32)
    remote_map[order] = (R + (pair_s % P) * H + slot_s).astype(np.int32)
    mapped[remote] = remote_map
    cols_halo = mapped.reshape(P, e_max)

    edges_int = edges_bnd = None
    if overlap:
        edges_int, edges_bnd = _split_interior_boundary(
            pgraph, cols_halo, R, device=device)

    # device=False keeps the plan host numpy (see partition_graph: on a
    # tunneled backend, eager device placement turns later host-side
    # np.asarray reads into tunnel round-trips)
    as_j = jnp.asarray if device else (lambda a: a)
    return HaloDescriptor(
        send_idx=as_j(send_idx),
        # the overlapped device path reads only send_idx + the split edge
        # lists; keep cols_halo HOST-side then so the unused [P, E_max]
        # array doesn't double edge storage on device
        cols_halo=cols_halo if overlap else as_j(cols_halo),
        halo_width=H,
        n_parts=P,
        edges_int=edges_int,
        edges_bnd=edges_bnd,
    )


def _split_interior_boundary(pgraph: PartitionedGraph,
                             cols_halo: np.ndarray, R: int,
                             device: bool = True):
    """Split each part's edges into interior (column < R: reads x_local)
    and boundary (column >= R: reads the halo buffer, re-based to 0).

    Both lists are padded per part to a common width (multiple of
    HALO_PAD) with no-op edges (val 0, row R-1, col 0) — the convention
    used everywhere for static shapes. Relative edge order is preserved
    inside each list, so the accumulation order is fixed (deterministic),
    though it differs from the unsplit path at f32 rounding level.
    """
    P = pgraph.n_parts
    rows = np.asarray(pgraph.rows_local)
    vals = np.asarray(pgraph.vals)
    is_int = cols_halo < R

    n_int = is_int.sum(axis=1)
    ei = _round_up(max(int(n_int.max()), 1), HALO_PAD)
    eb = _round_up(max(int((cols_halo.shape[1] - n_int).max()), 1), HALO_PAD)

    def _alloc(width):
        return (np.full((P, width), R - 1, np.int32),
                np.zeros((P, width), np.int32),
                np.zeros((P, width), np.float32))

    ri, ci, vi = _alloc(ei)
    rb, cb, vb = _alloc(eb)
    for p in range(P):
        m = is_int[p]
        k = int(m.sum())
        ri[p, :k] = rows[p][m]
        ci[p, :k] = cols_halo[p][m]
        vi[p, :k] = vals[p][m]
        kb = cols_halo.shape[1] - k
        rb[p, :kb] = rows[p][~m]
        cb[p, :kb] = cols_halo[p][~m] - R
        vb[p, :kb] = vals[p][~m]
    as_j = jnp.asarray if device else (lambda a: a)
    return ((as_j(ri), as_j(ci), as_j(vi)),
            (as_j(rb), as_j(cb), as_j(vb)))


def _remote_refs(pgraph: PartitionedGraph):
    """(dst_part, src_part, col) triples for live remote references."""
    P = pgraph.n_parts
    R = pgraph.rows_per_part
    cols = np.asarray(pgraph.cols).ravel().astype(np.int64)
    vals = np.asarray(pgraph.vals).ravel()
    dst = np.repeat(np.arange(P, dtype=np.int64), pgraph.edges_per_part)
    src = np.minimum(cols // R, P - 1)
    remote = (vals != 0) & (src != dst)
    return dst[remote], src[remote], cols[remote]


def pair_width_matrix(pgraph: PartitionedGraph) -> np.ndarray:
    """[P, P] unique-remote-column counts: W[dst, src] = rows dst needs
    from src. Diagonal is 0 (local rows are not exchanged)."""
    P = pgraph.n_parts
    R = pgraph.rows_per_part
    dst, src, cols = _remote_refs(pgraph)
    key = (dst * P + src) * (np.int64(P) * R) + cols
    counts = np.bincount(np.unique(key) // (np.int64(P) * R),
                         minlength=P * P)
    return counts.reshape(P, P)


def host_union_widths(
    pgraph: PartitionedGraph, n_hosts: int
) -> np.ndarray:
    """[n_hosts, P] unique columns needed from src part by ANY part on
    the dst host (contiguous parts per host: part p lives on host p//D).

    This is the cross-host volume of a hierarchical exchange: a row a
    host needs crosses DCN once even when several of its chips reference
    it, then fans out over ICI.
    """
    P = pgraph.n_parts
    if P % n_hosts:
        raise ValueError(f"{P} parts not divisible by {n_hosts} hosts")
    D = P // n_hosts
    R = pgraph.rows_per_part
    dst, src, cols = _remote_refs(pgraph)
    key = ((dst // D) * P + src) * (np.int64(P) * R) + cols
    counts = np.bincount(np.unique(key) // (np.int64(P) * R),
                         minlength=n_hosts * P)
    return counts.reshape(n_hosts, P)


def halo_stats(pgraph: PartitionedGraph) -> dict:
    """Per-pair halo-width distribution (padding-cost diagnostics).

    Returns mean/max unique-remote-column counts over (dst, src) pairs and
    the padding overhead factor max/mean — the cost of the uniform
    ``all_to_all`` block size relative to a ragged exchange.
    """
    P = pgraph.n_parts
    counts = pair_width_matrix(pgraph)
    off_diag = counts[~np.eye(P, dtype=bool)]
    mean_w = float(off_diag.mean()) if off_diag.size else 0.0
    max_w = int(off_diag.max()) if off_diag.size else 0
    return {
        "mean_pair_width": mean_w,
        "max_pair_width": max_w,
        "padding_factor": (max_w / mean_w) if mean_w > 0 else 1.0,
    }


def halo_fraction(halo: HaloDescriptor, pgraph: PartitionedGraph) -> float:
    """Fraction of the padded node count exchanged per hop (<1 is a win)."""
    return halo.n_parts * halo.halo_width / pgraph.n_rows_padded


def _chunked_segment_spmm(rows, cols, vals, x, num_segments, chunk):
    """Edge-chunked gather->scale->segment-sum: ``lax.scan`` over fixed
    edge chunks caps the materialized contribution buffer at
    ``chunk x F`` bytes instead of ``E x F`` — the memory-bounded form
    of the segment SpMM for hops whose per-edge working set would not
    fit (beyond-one-device graphs). Fixed chunk order keeps the
    reduction deterministic; result differs from the unchunked form only
    by f32 summation-order rounding.
    """
    e = rows.shape[0]
    n_chunks = -(-e // chunk)
    pad = n_chunks * chunk - e
    if pad:
        # padding edges: val 0 into row 0 — contribute exactly nothing
        rows = jnp.concatenate([rows, jnp.zeros((pad,), rows.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros((pad,), cols.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad,), vals.dtype)])
    ch = (rows.reshape(n_chunks, chunk), cols.reshape(n_chunks, chunk),
          vals.reshape(n_chunks, chunk))

    def body(acc, c):
        r, co, v = c
        return acc + jax.ops.segment_sum(
            jnp.take(x, co, axis=0) * v[:, None], r,
            num_segments=num_segments, indices_are_sorted=False,
        ), None

    acc0 = jnp.zeros((num_segments, x.shape[1]), x.dtype)
    out, _ = jax.lax.scan(body, acc0, ch)
    return out


def exchange_and_spmm_overlapped(
    edges_int: tuple,             # (rows[Ei], cols[Ei] -> x_local, vals[Ei])
    edges_bnd: tuple,             # (rows[Eb], cols[Eb] -> halo buf, vals[Eb])
    send_idx: jnp.ndarray,        # [P, H] rows this chip sends to each peer
    x_local: jnp.ndarray,         # [R, F] local feature rows
    rows_per_part: int,
    edge_chunk: int | None = None,
) -> jnp.ndarray:
    """Halo-exchanged SpMM hop with comm/compute overlap.

    The interior segment-sum reads only ``x_local``, so it carries no
    data dependence on the ``all_to_all`` — XLA's async collective
    scheduling starts the ICI exchange, runs the interior SpMM, and only
    the boundary term awaits the halo buffer. Same result as
    :func:`exchange_and_spmm` up to f32 summation-order rounding.

    ``edge_chunk`` routes the interior term through the edge-chunked
    scan (:func:`_chunked_segment_spmm`), bounding transient memory at
    ``edge_chunk x F`` — required when ``E x F`` itself exceeds the
    device budget (the beyond-one-device regime). Default (None) keeps
    the single fused segment-sum, which XLA overlaps best.
    """
    ri, ci, vi = edges_int
    rb, cb, vb = edges_bnd
    send = jnp.take(x_local, send_idx.reshape(-1), axis=0)   # (P*H, F)
    halo = jax.lax.all_to_all(
        send, NODES_AXIS, split_axis=0, concat_axis=0, tiled=True
    )                                                        # (P*H, F)
    if edge_chunk:
        acc = _chunked_segment_spmm(
            ri, ci, vi, x_local, rows_per_part, edge_chunk)
    else:
        acc = jax.ops.segment_sum(
            jnp.take(x_local, ci, axis=0) * vi[:, None],
            ri, num_segments=rows_per_part, indices_are_sorted=False,
        )
    if edge_chunk:
        bnd = _chunked_segment_spmm(
            rb, cb, vb, halo, rows_per_part, edge_chunk)
    else:
        bnd = jax.ops.segment_sum(
            jnp.take(halo, cb, axis=0) * vb[:, None],
            rb, num_segments=rows_per_part, indices_are_sorted=False,
        )
    return acc + bnd


def exchange_and_spmm(
    rows_local: jnp.ndarray,      # [E] local destination rows (this chip)
    cols_halo: jnp.ndarray,       # [E] halo-buffer positions (this chip)
    vals: jnp.ndarray,            # [E]
    send_idx: jnp.ndarray,        # [P, H] rows this chip sends to each peer
    x_local: jnp.ndarray,         # [R, F] local feature rows
    rows_per_part: int,
    edge_chunk: int | None = None,
) -> jnp.ndarray:
    """One halo-exchanged SpMM hop; call inside shard_map over "nodes"."""
    send = jnp.take(x_local, send_idx.reshape(-1), axis=0)   # (P*H, F)
    halo = jax.lax.all_to_all(
        send, NODES_AXIS, split_axis=0, concat_axis=0, tiled=True
    )                                                        # (P*H, F)
    table = jnp.concatenate([x_local, halo], axis=0)         # (R + P*H, F)
    if edge_chunk:
        return _chunked_segment_spmm(
            rows_local, cols_halo, vals, table, rows_per_part, edge_chunk)
    contrib = jnp.take(table, cols_halo, axis=0) * vals[:, None]
    return jax.ops.segment_sum(
        contrib, rows_local, num_segments=rows_per_part,
        indices_are_sorted=False,
    )
