"""Sharded block-dense SpMM: the fast single-chip formulation on the mesh.

Round-2 left a gap (VERDICT #5): the single-chip headline runs the
block-dense formulation (materialized bf16 cells as real MXU matmuls,
129M edges/s) while the multi-chip path ran only the segment-sum kernel
(34M edges/s wall) — a real 8-chip run would have scaled the slow rate.
This module brings the fast formulation to the ("nodes", "feat") mesh.

Geometry (per chip q, all static):

    x_local            [R, F_loc]   rows this chip owns (R = rows_per_part)
    halo buffer        [P*H, F_loc] boundary rows received via all_to_all
    gather table       local rows at stripe positions [0, R_up),
                       halo rows at [R_up, R_up + P*H), zero-padded to
                       T_pad — R_up = R rounded up to the stripe width so
                       local and halo rows never share a stripe.

Each chip's edge list (destination rows local, columns in table
coordinates) is split by the SAME per-cell admission cost model as the
single-chip path (ops/spmm_blockdense.split_block_dense), then cells and
the sparse remainder are further split by whether their stripe/column
touches the halo region:

    interior  — stripes/columns entirely inside [0, R_up): reads only
                x_local, so it carries NO data dependence on the
                all_to_all — XLA's async collectives hide the ICI
                exchange behind the interior matmuls (the overlapped
                halo pattern of parallel/halo.py, SURVEY §7 hard-part 2).
    boundary  — stripes/columns in the halo region: awaits the exchange.

Per-hop device compute (inside shard_map over "nodes"):

    1. pack + all_to_all the halo rows                  (ICI, async)
    2. interior cell matmuls + interior segment remainder (local)
    3. boundary cell matmuls + boundary segment remainder (after 1)

Replaces: reference utils.py:92-97 (torch.spmm hops) at multi-chip
scale; the reference has no distributed path at all (SURVEY §2.5).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.ops.spmm_blockdense import (
    DEFAULT_BYTE_BUDGET,
    DEFAULT_ROW_BLOCK,
    DEFAULT_STRIPE,
    _scan_chunk,
    apply_cells_scan,
    split_block_dense,
)
from sgc_tpu.parallel.halo import HaloDescriptor
from sgc_tpu.parallel.mesh import NODES_AXIS
from sgc_tpu.parallel.partition import PartitionedGraph, _round_up

REST_PAD = 8


@partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "cells_int", "rb_int", "st_int", "vis_int",
        "cells_bnd", "rb_bnd", "st_bnd", "vis_bnd",
        "rest_int", "rest_bnd", "send_idx",
    ),
    meta_fields=(
        "row_block", "stripe", "n_parts", "rows_per_part", "halo_width",
        "r_up", "t_pad", "chunk_int", "chunk_bnd", "n_cells",
        "dense_edges", "sparse_edges",
    ),
)
@dataclasses.dataclass(frozen=True)
class ShardedBlockDense:
    """Per-part block-dense splits in gather-table coordinates, stacked
    along a leading [P] device axis (shards trivially over "nodes").

    cells_*: bf16[P, C, RB, W]; rb_*/st_*: int32[P, C] — interior stripe
    ids index the local stripe space [0, R_up/W); boundary stripe ids are
    REBASED to the halo stripe space [0, (T_pad-R_up)/W).
    rest_*: (rows, cols, vals) triples [P, E] — interior cols index
    x_local, boundary cols index the halo buffer. Padding edges are
    (row R-1, col 0, val 0), the framework-wide no-op convention.
    send_idx: int32[P, P, H] — copied from the HaloDescriptor so one
    plan object carries everything the device hop needs.
    """

    cells_int: jnp.ndarray
    rb_int: jnp.ndarray
    st_int: jnp.ndarray
    vis_int: jnp.ndarray          # bool[P, n_rb]: row blocks with cells
    cells_bnd: jnp.ndarray
    rb_bnd: jnp.ndarray
    st_bnd: jnp.ndarray
    vis_bnd: jnp.ndarray
    rest_int: tuple
    rest_bnd: tuple
    send_idx: jnp.ndarray
    row_block: int
    stripe: int
    n_parts: int
    rows_per_part: int
    halo_width: int
    r_up: int
    t_pad: int
    chunk_int: int
    chunk_bnd: int
    n_cells: int
    dense_edges: int
    sparse_edges: int

    @property
    def n_rb(self) -> int:
        return -(-self.rows_per_part // self.row_block)

    @property
    def dense_fraction(self) -> float:
        total = self.dense_edges + self.sparse_edges
        return self.dense_edges / max(1, total)


def _pad_cells(per_part: list, n_rb: int):
    """Stack per-part (cells, rb, st) lists to a common scan-ready width.

    Pads each part with zero cells; pad slots repeat the part's last
    (rb, st) so rb stays non-decreasing (empty parts use (0, 0) — a zero
    matmul into block 0). Also returns the per-part row-block VISITED
    mask: the Pallas kernel form leaves unvisited out-blocks
    uninitialized (same contract as spmm_blockdense_pallas's `visited`
    mask), so the device path must zero them explicitly.
    """
    c_max = max((c.shape[0] for c, _, _ in per_part), default=0)
    c_max = max(c_max, 1)
    chunk = _scan_chunk(c_max)
    width = _round_up(c_max, chunk)
    P = len(per_part)
    rb0, w0 = per_part[0][0].shape[1], per_part[0][0].shape[2]
    from sgc_tpu.utils.alloc import zeros_hugepage

    cells = zeros_hugepage(
        P * width * rb0 * w0, np.dtype("bfloat16")
    ).reshape(P, width, rb0, w0)
    rb = np.zeros((P, width), np.int32)
    st = np.zeros((P, width), np.int32)
    vis = np.zeros((P, n_rb), np.bool_)
    for p, (c, r, s) in enumerate(per_part):
        k = c.shape[0]
        if k:
            cells[p, :k] = c
            rb[p, :k] = r
            st[p, :k] = s
            rb[p, k:] = r[-1]
            st[p, k:] = s[-1]
            vis[p, np.unique(r)] = True
        else:
            vis[p, 0] = True   # the (0,0) zero pad cell writes block 0
    return cells, rb, st, vis, chunk


def _pad_rest(per_part: list, rows_per_part: int):
    """Stack per-part (rows, cols, vals) remainder lists, padded with
    no-op edges (row R-1, col 0, val 0)."""
    e_max = _round_up(max((len(r) for r, _, _ in per_part), default=0),
                      REST_PAD)
    P = len(per_part)
    rows = np.full((P, e_max), rows_per_part - 1, np.int32)
    cols = np.zeros((P, e_max), np.int32)
    vals = np.zeros((P, e_max), np.float32)
    for p, (r, c, v) in enumerate(per_part):
        k = len(r)
        rows[p, :k] = r
        cols[p, :k] = c
        vals[p, :k] = v
    return rows, cols, vals


def build_sharded_blockdense(
    pgraph: PartitionedGraph,
    halo: HaloDescriptor,
    n_features: int,
    row_block: int = DEFAULT_ROW_BLOCK,
    stripe: int = DEFAULT_STRIPE,
    min_edges: float | None = None,
    byte_budget: int = DEFAULT_BYTE_BUDGET,
    device: bool = True,
) -> ShardedBlockDense:
    """Host-side plan: per-part block-dense split of the halo-remapped
    edge lists, interior/boundary separated (see module docstring).

    ``n_features`` should be the PER-CHIP feature width (F / feat-axis
    size) — the admission crossover compares per-chip matmul time against
    per-chip gather time, both of which scale with the local width.
    ``byte_budget`` caps each chip's bf16 cell bytes. ``device=False``
    keeps every array host-resident (plan inspection / comm modelling
    without shipping GBs of cells to the chip).

    Two implementations with identical outputs (tests/
    test_blockdense_sharded.py asserts bitwise equality):

    * fast (default when the native library is built) — admission
      metadata first, then the native bf16 cell scatter writes each
      part's cells DIRECTLY into the final stacked [P, width, RB, W]
      buffer. The round-3 path materialized every part's cells three
      times (split buffer -> interior/boundary fancy-index copies ->
      ``_pad_cells`` restack), ~8 GB of bf16 copies at Reddit scale —
      the 109.5 s plan build VERDICT round-3 #2 flagged.
    * portable — the original per-part ``split_block_dense`` + restack
      composition; numpy-only, kept as the behavioral reference
      (``SGC_TPU_PORTABLE_SHARDED_BUILD=1`` forces it).
    """
    from sgc_tpu import native

    if (native.has_cell_scatter()
            and os.environ.get("SGC_TPU_PORTABLE_SHARDED_BUILD") != "1"):
        return _build_sharded_fast(
            pgraph, halo, n_features, row_block, stripe, min_edges,
            byte_budget, device)
    return _build_sharded_portable(
        pgraph, halo, n_features, row_block, stripe, min_edges,
        byte_budget, device)


def _build_sharded_fast(
    pgraph: PartitionedGraph,
    halo: HaloDescriptor,
    n_features: int,
    row_block: int,
    stripe: int,
    min_edges: float | None,
    byte_budget: int,
    device: bool,
) -> ShardedBlockDense:
    """Direct-scatter plan build (see :func:`build_sharded_blockdense`)."""
    from sgc_tpu import native
    from sgc_tpu.ops.spmm_blockdense import min_edges_for
    from sgc_tpu.utils.alloc import ensure_fault_rate, zeros_hugepage

    # fault-wall guard (DESIGN §2e): the cell buffers + per-part edge
    # copies below are GBs of fresh allocations; on a fragmented machine
    # they fault at 27 us/page unless compaction runs first
    ensure_fault_rate()

    P = pgraph.n_parts
    R = pgraph.rows_per_part
    H = halo.halo_width
    r_up = _round_up(R, stripe)
    t_pad = r_up + _round_up(P * H, stripe)
    n_st_loc = r_up // stripe
    n_st = t_pad // stripe
    n_rb = -(-R // row_block)
    if min_edges is None:
        min_edges = min_edges_for(row_block, stripe, n_features)
    max_cells = max(int(byte_budget // (2 * row_block * stripe)), 0)

    cols_halo = np.asarray(halo.cols_halo)
    rows_l = np.asarray(pgraph.rows_local)
    vals_all = np.asarray(pgraph.vals)
    pow2 = (row_block & (row_block - 1) == 0
            and stripe & (stripe - 1) == 0)

    def phase1(p):
        # private sorted copies of this part's live edges, in gather-
        # table coordinates + the per-cell admission decision
        live = vals_all[p] != 0
        r = rows_l[p][live].astype(np.int64)
        ch = cols_halo[p][live].astype(np.int64)
        v = vals_all[p][live].astype(np.float32)
        ct = np.where(ch < R, ch, ch - R + r_up)
        native.sort_edges_inplace(r, ct, v, R, t_pad)
        if pow2:
            cell = ((r >> row_block.bit_length() - 1) * n_st
                    + (ct >> stripe.bit_length() - 1))
        else:
            cell = (r // row_block) * n_st + (ct // stripe)
        counts = np.bincount(cell, minlength=n_rb * n_st)
        qualifying = np.flatnonzero(counts > min_edges)
        if len(qualifying) > max_cells:
            order = np.argsort(-counts[qualifying], kind="stable")
            qualifying = np.sort(qualifying[order[:max_cells]])
        st_q = qualifying % n_st
        return (r, ct, v, qualifying[st_q < n_st_loc],
                qualifying[st_q >= n_st_loc],
                int(counts[qualifying].sum()))

    import concurrent.futures as cf

    with cf.ThreadPoolExecutor(
            max_workers=min(P, os.cpu_count() or 1)) as ex:
        parts = list(ex.map(phase1, range(P)))

    def alloc_cells(c_max):
        c_max = max(c_max, 1)
        chunk = _scan_chunk(c_max)
        width = _round_up(c_max, chunk)
        flat = zeros_hugepage(
            P * width * row_block * stripe, np.dtype("bfloat16"))
        cells = flat.reshape(P, width, row_block, stripe)
        return cells, flat.view(np.uint16), width, chunk

    ci, ci_u16, w_int, chunk_i = alloc_cells(
        max(len(q) for _, _, _, q, _, _ in parts))
    cb, cb_u16, w_bnd, chunk_b = alloc_cells(
        max(len(q) for _, _, _, _, q, _ in parts))
    rbi = np.zeros((P, w_int), np.int32)
    sti = np.zeros((P, w_int), np.int32)
    vis_i = np.zeros((P, n_rb), np.bool_)
    rbb = np.zeros((P, w_bnd), np.int32)
    stb = np.zeros((P, w_bnd), np.int32)
    vis_b = np.zeros((P, n_rb), np.bool_)
    rest_int, rest_bnd = [None] * P, [None] * P
    n_cells = dense_edges = sparse_edges = 0

    def ids_fill(q, rb_arr, st_arr, vis, p, width, st_base):
        k = len(q)
        if not k:
            vis[p, 0] = True  # the (0, 0) zero pad cell writes block 0
            return
        rb_loc = (q // n_st).astype(np.int32)
        rb_arr[p, :k] = rb_loc
        st_arr[p, :k] = (q % n_st - st_base).astype(np.int32)
        rb_arr[p, k:] = rb_loc[-1]   # pads repeat the last (rb, st) so
        st_arr[p, k:] = st_arr[p, k - 1]   # rb stays non-decreasing
        vis[p, np.unique(rb_loc)] = True

    def phase2(p):
        r, ct, v, q_int, q_bnd, _ = parts[p]
        mask_int = np.zeros(len(r), np.uint8)
        mask_bnd = np.zeros(len(r), np.uint8)
        compact = np.full(n_rb * n_st, -1, np.int64)
        if len(q_int):
            compact[q_int] = p * w_int + np.arange(len(q_int))
            native.cell_scatter(r, ct, v, compact, n_st, row_block,
                                stripe, ci_u16, mask_int)
            compact[q_int] = -1
        if len(q_bnd):
            compact[q_bnd] = p * w_bnd + np.arange(len(q_bnd))
            native.cell_scatter(r, ct, v, compact, n_st, row_block,
                                stripe, cb_u16, mask_bnd)
        restm = (mask_int | mask_bnd) == 0
        rr, rc, rv = r[restm], ct[restm], v[restm]
        m_loc = rc < R
        rest_int[p] = (rr[m_loc], rc[m_loc], rv[m_loc])
        rest_bnd[p] = (rr[~m_loc], rc[~m_loc] - r_up, rv[~m_loc])
        ids_fill(q_int, rbi, sti, vis_i, p, w_int, 0)
        ids_fill(q_bnd, rbb, stb, vis_b, p, w_bnd, n_st_loc)

    with cf.ThreadPoolExecutor(
            max_workers=min(P, os.cpu_count() or 1)) as ex:
        list(ex.map(phase2, range(P)))
    for r, _, _, q_int, q_bnd, dcnt in parts:
        n_cells += len(q_int) + len(q_bnd)
        dense_edges += dcnt
        sparse_edges += len(r) - dcnt

    ri = _pad_rest(rest_int, R)
    rb_ = _pad_rest(rest_bnd, R)
    as_j = jnp.asarray if device else (lambda a: a)
    return ShardedBlockDense(
        cells_int=as_j(ci), rb_int=as_j(rbi), st_int=as_j(sti),
        vis_int=as_j(vis_i),
        cells_bnd=as_j(cb), rb_bnd=as_j(rbb), st_bnd=as_j(stb),
        vis_bnd=as_j(vis_b),
        rest_int=tuple(as_j(a) for a in ri),
        rest_bnd=tuple(as_j(a) for a in rb_),
        send_idx=halo.send_idx,
        row_block=row_block, stripe=stripe, n_parts=P, rows_per_part=R,
        halo_width=H, r_up=r_up, t_pad=t_pad,
        chunk_int=chunk_i, chunk_bnd=chunk_b, n_cells=n_cells,
        dense_edges=dense_edges, sparse_edges=sparse_edges,
    )


def _build_sharded_portable(
    pgraph: PartitionedGraph,
    halo: HaloDescriptor,
    n_features: int,
    row_block: int,
    stripe: int,
    min_edges: float | None,
    byte_budget: int,
    device: bool,
) -> ShardedBlockDense:
    """Composition-of-parts plan build: per-part ``split_block_dense``
    then restack (the numpy-only reference the fast path must match)."""
    P = pgraph.n_parts
    R = pgraph.rows_per_part
    H = halo.halo_width
    r_up = _round_up(R, stripe)
    t_pad = r_up + _round_up(P * H, stripe)
    n_st_loc = r_up // stripe

    cols_halo = np.asarray(halo.cols_halo)
    rows_l = np.asarray(pgraph.rows_local)
    vals = np.asarray(pgraph.vals)

    per_int, per_bnd = [], []
    rest_int, rest_bnd = [], []
    n_cells = dense_edges = sparse_edges = 0
    for p in range(P):
        live = vals[p] != 0
        r = rows_l[p][live].astype(np.int64)
        ch = cols_halo[p][live].astype(np.int64)
        v = vals[p][live]
        # halo positions (>= R) shift up so local stripes never mix with
        # halo rows; gap rows [R, r_up) stay unoccupied (zero-padded x)
        ct = np.where(ch < R, ch, ch - R + r_up)
        g = SparseGraph.from_coo(r, ct, v, n_rows=R, n_cols=t_pad,
                                 device=False)
        split = split_block_dense(
            g, n_features, row_block, stripe,
            min_edges=min_edges, byte_budget=byte_budget)
        n_cells += split.n_cells
        dense_edges += split.dense_edges
        sparse_edges += split.sparse_edges

        k = split.n_cells
        c, rb, st = split.cells[:k], split.rb_ids[:k], split.st_ids[:k]
        is_int = st < n_st_loc
        per_int.append((c[is_int], rb[is_int], st[is_int]))
        per_bnd.append((c[~is_int], rb[~is_int],
                        (st[~is_int] - n_st_loc).astype(np.int32)))

        if split.rest is not None:
            rr = np.asarray(split.rest.rows)[: split.rest.nnz]
            rc = np.asarray(split.rest.cols)[: split.rest.nnz]
            rv = np.asarray(split.rest.vals)[: split.rest.nnz]
            m = rc < R
            rest_int.append((rr[m], rc[m], rv[m]))
            rest_bnd.append((rr[~m], (rc[~m] - r_up).astype(np.int64),
                             rv[~m]))
        else:
            empty = (np.zeros(0, np.int64),) * 3
            rest_int.append(empty)
            rest_bnd.append(empty)

    n_rb = -(-R // row_block)
    ci, rbi, sti, vis_i, chunk_i = _pad_cells(per_int, n_rb)
    cb, rbb, stb, vis_b, chunk_b = _pad_cells(per_bnd, n_rb)
    ri = _pad_rest(rest_int, R)
    rb_ = _pad_rest(rest_bnd, R)

    as_j = jnp.asarray if device else (lambda a: a)
    return ShardedBlockDense(
        cells_int=as_j(ci), rb_int=as_j(rbi), st_int=as_j(sti),
        vis_int=as_j(vis_i),
        cells_bnd=as_j(cb), rb_bnd=as_j(rbb), st_bnd=as_j(stb),
        vis_bnd=as_j(vis_b),
        rest_int=tuple(as_j(a) for a in ri),
        rest_bnd=tuple(as_j(a) for a in rb_),
        send_idx=halo.send_idx,
        row_block=row_block, stripe=stripe, n_parts=P, rows_per_part=R,
        halo_width=H, r_up=r_up, t_pad=t_pad,
        chunk_int=chunk_i, chunk_bnd=chunk_b, n_cells=n_cells,
        dense_edges=dense_edges, sparse_edges=sparse_edges,
    )


def blockdense_flat_args(bd: ShardedBlockDense) -> tuple:
    """The plan's device arrays as a flat tuple (shard_map arguments)."""
    return (bd.cells_int, bd.rb_int, bd.st_int, bd.vis_int,
            bd.cells_bnd, bd.rb_bnd, bd.st_bnd, bd.vis_bnd,
            *bd.rest_int, *bd.rest_bnd, bd.send_idx)


def blockdense_in_specs(bd: ShardedBlockDense) -> tuple:
    """PartitionSpecs matching :func:`blockdense_flat_args` — every array
    shards its leading [P] axis over "nodes"."""
    from jax.sharding import PartitionSpec as P

    return tuple(
        P(NODES_AXIS, *([None] * (a.ndim - 1)))
        for a in blockdense_flat_args(bd)
    )


def blockdense_exchange_and_spmm(
    bd: ShardedBlockDense,
    local_args: tuple,            # blockdense_flat_args leaves, [0]-indexed
    x_local: jnp.ndarray,         # [R, F_loc]
    precision: str = "bf16",
    form: str = "scan",
    interpret: bool = False,
) -> jnp.ndarray:
    """One halo-exchanged block-dense SpMM hop; call inside shard_map
    over "nodes". Interior terms read only ``x_local`` (no dependence on
    the all_to_all), so the exchange overlaps the interior matmuls.

    ``form="pallas"`` computes the cell terms with the streamed Pallas
    kernel (ops/spmm_blockdense.apply_cells_pallas — the single-chip
    headline kernel, per chip); ``"scan"`` is the portable einsum form.
    """
    from sgc_tpu.ops.spmm_blockdense import (
        apply_cells_pallas,
        default_feature_tile,
    )

    (ci, rbi, sti, vis_i, cb, rbb, stb, vis_b,
     ri_r, ri_c, ri_v, rb_r, rb_c, rb_v, send_idx) = local_args
    R = bd.rows_per_part
    W = bd.stripe
    RB = bd.row_block
    n_rb = bd.n_rb
    mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    F = x_local.shape[1]

    def cells_term(cells, rb_ids, st_ids, vis, x2d, chunk):
        # x2d: [n_st_local_or_halo * W, F] stripe-space operand
        if form == "pallas":
            ftile = default_feature_tile(F)
            f_extra = (-F) % ftile
            xpp = jnp.pad(x2d, ((0, 0), (0, f_extra)))
            out = apply_cells_pallas(cells, rb_ids, st_ids, xpp, n_rb,
                                     ftile, interpret, mm_dtype=mm_dtype)
            # unvisited out-blocks are UNINITIALIZED kernel memory (the
            # single-chip op masks them the same way; where() also
            # neutralizes NaN garbage, unlike multiply-by-zero)
            out = jnp.where(jnp.repeat(vis, RB)[:, None], out[:, :F], 0.0)
            return out.reshape(n_rb, RB, F)
        xb = x2d.astype(mm_dtype).reshape(-1, W, F)
        return apply_cells_scan(cells, rb_ids, st_ids, xb, n_rb, chunk,
                                mm_dtype=mm_dtype)

    # 1. pack + exchange (async-schedulable: nothing below depends on it
    #    until the boundary terms)
    send = jnp.take(x_local, send_idx.reshape(-1), axis=0)
    halo = jax.lax.all_to_all(
        send, NODES_AXIS, split_axis=0, concat_axis=0, tiled=True
    )                                                       # [P*H, F]

    # 2. interior: local stripes + local segment remainder
    xi = jnp.pad(x_local, ((0, bd.r_up - R), (0, 0)))
    acc = cells_term(ci, rbi, sti, vis_i, xi, bd.chunk_int)
    acc = acc.reshape(n_rb * RB, F)[:R]
    acc = acc + jax.ops.segment_sum(
        jnp.take(x_local, ri_c, axis=0) * ri_v[:, None],
        ri_r, num_segments=R, indices_are_sorted=False)

    # 3. boundary: halo stripes + halo segment remainder
    hb = jnp.pad(halo, ((0, bd.t_pad - bd.r_up - halo.shape[0]), (0, 0)))
    accb = cells_term(cb, rbb, stb, vis_b, hb, bd.chunk_bnd)
    acc = acc + accb.reshape(n_rb * RB, F)[:R]
    acc = acc + jax.ops.segment_sum(
        jnp.take(halo, rb_c, axis=0) * rb_v[:, None],
        rb_r, num_segments=R, indices_are_sorted=False)
    return acc
