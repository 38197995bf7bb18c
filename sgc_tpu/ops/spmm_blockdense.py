"""Block-dense SpMM: materialized dense cells as REAL MXU matmuls.

The one-hot Pallas kernel (ops/spmm_pallas.py) costs 2*(R+W)*F flops per
EDGE; a materialized (R, W) cell costs 2*R*W*F flops per CELL — the
crossover is R*W/(R+W) edges (256 at 512x512). Community-clustered
graphs concentrate thousands of edges per diagonal cell, so real
matmuls over materialized blocks beat both the one-hot form and the XLA
gather wall by a wide margin (measured on v5e at Reddit scale, hop1
dense part: 284 ms segment / 129 ms one-hot / 65 ms block-dense —
scripts/exp_blockdense.py; docs/DESIGN.md §2e).

Storage is bf16: the v5e MXU rounds f32 operands to bf16 regardless
(measured bitwise-identical, DESIGN §2d), so bf16 cells change nothing
numerically while halving HBM footprint (f32 cells OOM a 16 GB chip at
Reddit scale). Accumulation is f32 (`preferred_element_type`).

Replaces: reference utils.py:92-97 torch.spmm hops (the compute), via
the same cost-model-split pattern as ops/spmm_hybrid.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgc_tpu import native
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.ops.spmm import spmm_segment
from sgc_tpu.ops.spmm_hybrid import XLA_EDGES_PER_S

# Measured einsum-path throughput at (512,512,F=602), v5e, Reddit scale:
# 5083 cells in ~65 ms net of dispatch => ~13 us/cell, i.e. an effective
# 2*R*W*F_pad / 13us ~ 2.6e13 flop/s INCLUDING the gather/scatter HBM
# traffic around the matmuls (scripts/exp_blockdense.py). Used by the
# admission model; deliberately conservative so marginal cells stay on
# the segment path.
BLOCKDENSE_EFF_FLOPS = 2.6e13

DEFAULT_ROW_BLOCK = 512
DEFAULT_STRIPE = 512
DEFAULT_BYTE_BUDGET = 4 << 30   # bf16 cell bytes per split
# cells per scan step: bounds BOTH peak memory (per-step out blocks) AND
# list padding waste (< CELL_CHUNK zero cells; at 512x512 bf16 that is
# <= 134 MB / <= 255 wasted matmuls — a review finding showed 2048 could
# nearly double the cell buffer at unlucky counts)
CELL_CHUNK = 256


def _scan_chunk(n_cells: int) -> int:
    """Scan step size: CELL_CHUNK, or the covering power of two when
    the cell list is smaller."""
    return min(CELL_CHUNK, 1 << max(0, n_cells - 1).bit_length())


def min_edges_for(row_block: int, stripe: int, n_features: int,
                  eff_flops: float = BLOCKDENSE_EFF_FLOPS,
                  xla_edges_per_s: float = XLA_EDGES_PER_S) -> float:
    """Edges per cell above which the materialized matmul beats the
    XLA segment path for that cell's edges."""
    f_pad = -(-max(n_features, 128) // 128) * 128
    cell_seconds = 2.0 * row_block * stripe * f_pad / eff_flops
    return cell_seconds * xla_edges_per_s


@dataclasses.dataclass(frozen=True)
class BlockDenseSplit:
    """Host-side split: materialized cells + sparse remainder.

    Arrays are host-resident (numpy); device placement happens once in
    :func:`blockdense_device_args` (same discipline as HybridSplit).
    ``cells`` is bf16 [n_cells_pad, R, W] with zero padding cells so the
    scan length divides CELL_CHUNK; padded entries repeat the last
    cell's (rb, st) — exact zeros on every path, and rb_ids stays
    non-decreasing (the Pallas kernel's output-revisiting contract).
    """

    cells: np.ndarray             # bf16[n_cells_pad, R, W]
    rb_ids: np.ndarray            # int32[n_cells_pad] row-block ids
    st_ids: np.ndarray            # int32[n_cells_pad] stripe ids
    rest: SparseGraph | None      # remainder for the segment path
    n_rows: int
    n_cols: int
    row_block: int
    stripe: int
    n_cells: int                  # real (unpadded) cell count
    dense_edges: int
    sparse_edges: int
    min_edges: float
    # cell ORDER contract: None -> (rb, st) ascending (the classic
    # kernel's non-decreasing-rb revisit contract); S -> (rb//S, st, rb)
    # ascending, for the super-row kernel (out panel of S row blocks
    # resident in VMEM, stripes shared across the panel's row blocks
    # load once per (panel, stripe) — attacks the stripe re-read factor
    # the roofline shows). The scan form accepts either order
    # (per-chunk segment_sum is order-insensitive).
    super_rows: int | None = None
    # with group_cells=G (requires super_rows): each (panel, stripe)
    # run is padded to a multiple of G with zero cells, so the grouped
    # kernel runs G matmuls per grid step against ONE stripe block —
    # attacks the per-grid-step overhead the super-row A/B measured as
    # the dense term's true bound (~8.7 us/step vs 1.7 us of MXU work).
    # Zero pad cells contribute nothing on every path; pad slots repeat
    # their run's last (rb, st).
    group_cells: int | None = None

    @property
    def cell_bytes(self) -> int:
        return self.cells.nbytes

    @property
    def n_row_blocks(self) -> int:
        return -(-self.n_rows // self.row_block)

    @property
    def n_stripes(self) -> int:
        return -(-self.n_cols // self.stripe)


def split_block_dense(
    graph: SparseGraph,
    n_features: int,
    row_block: int = DEFAULT_ROW_BLOCK,
    stripe: int = DEFAULT_STRIPE,
    min_edges: float | None = None,
    byte_budget: int = DEFAULT_BYTE_BUDGET,
    super_rows: int | None = None,
    group_cells: int | None = None,
) -> BlockDenseSplit:
    """Partition edges by per-cell count; materialize qualifying cells.

    Host-side, O(E). Admission: a cell qualifies when its edge count
    exceeds the measured cost-model crossover (``min_edges_for``);
    qualifying cells are then admitted densest-first until
    ``byte_budget`` bf16 bytes — everything else joins the sparse
    remainder, so the op degrades gracefully to the segment path on
    structureless graphs (zero cells => pure XLA).
    """
    import jax.core

    if isinstance(graph.rows, jax.core.Tracer):
        raise TypeError(
            "split_block_dense needs a concrete graph: build the split "
            "OUTSIDE jit and call spmm_block_dense in traced code")
    if min_edges is None:
        min_edges = min_edges_for(row_block, stripe, n_features)

    rows = np.asarray(graph.rows)[: graph.nnz].astype(np.int64)
    cols = np.asarray(graph.cols)[: graph.nnz].astype(np.int64)
    vals = np.asarray(graph.vals)[: graph.nnz].astype(np.float32)

    n_st = -(-graph.n_cols // stripe)
    # power-of-two tiles take shifts: int64 division over 11.7M edges is
    # ~4 s on the build VM, shifts are memory-speed (prep hot path)
    if row_block & (row_block - 1) == 0 and stripe & (stripe - 1) == 0:
        cell = ((rows >> row_block.bit_length() - 1) * n_st
                + (cols >> stripe.bit_length() - 1))
    else:
        cell = (rows // row_block) * n_st + (cols // stripe)
    counts = np.bincount(
        cell, minlength=(-(-graph.n_rows // row_block)) * n_st)

    qualifying = np.flatnonzero(counts > min_edges)
    cell_bytes = 2 * row_block * stripe
    max_cells = max(int(byte_budget // cell_bytes), 0)
    if len(qualifying) > max_cells:
        order = np.argsort(-counts[qualifying], kind="stable")
        qualifying = np.sort(qualifying[order[:max_cells]])

    if group_cells is not None:
        if super_rows is None:
            raise ValueError("group_cells requires super_rows")
        if CELL_CHUNK % group_cells:
            raise ValueError(
                f"group_cells {group_cells} must divide CELL_CHUNK "
                f"{CELL_CHUNK} (tail padding must keep group alignment)")
    slot_rb = slot_st = None
    if super_rows is not None and len(qualifying):
        # super-row cell order (see BlockDenseSplit.super_rows): the
        # compact mapping below writes each cell straight into its slot
        # in THIS order, so the reorder costs a lexsort of the cell-id
        # list — no extra pass over the multi-GB buffer
        rbq = qualifying // n_st
        stq = qualifying % n_st
        qualifying = qualifying[
            np.lexsort((rbq, stq, rbq // super_rows))]
    compact = np.full(len(counts), -1, np.int64)
    n_cells = len(qualifying)
    slots = np.arange(n_cells)
    if group_cells is not None and n_cells:
        # grouped layout: pad each (panel, stripe) run to a multiple of
        # G with zero-cell holes; cells scatter straight into their
        # padded slots, pad slots repeat the run's last (rb, st)
        G = group_cells
        rbq = qualifying // n_st
        stq = qualifying % n_st
        key = (rbq // super_rows) * n_st + stq
        run_start = np.concatenate(([True], key[1:] != key[:-1]))
        run_id = np.cumsum(run_start) - 1
        counts_r = np.bincount(run_id)
        padded_r = -(-counts_r // G) * G
        starts = np.concatenate(([0], np.cumsum(padded_r)[:-1]))
        cum_real = np.concatenate(([0], np.cumsum(counts_r)[:-1]))
        slots = starts[run_id] + (np.arange(n_cells) - cum_real[run_id])
        n_slot_total = int(padded_r.sum())
        slot_rb = np.zeros(n_slot_total, np.int32)
        slot_st = np.zeros(n_slot_total, np.int32)
        slot_rb[slots] = rbq
        slot_st[slots] = stq
        hole = np.ones(n_slot_total, bool)
        hole[slots] = False
        if hole.any():
            slot_run = np.repeat(np.arange(len(padded_r)), padded_r)
            last_idx = np.cumsum(counts_r) - 1
            slot_rb[hole] = rbq[last_idx][slot_run[hole]]
            slot_st[hole] = stq[last_idx][slot_run[hole]]
    compact[qualifying] = slots

    cells = np.zeros((0, row_block, stripe), np.dtype("bfloat16"))
    rb_ids = np.zeros(0, np.int32)
    st_ids = np.zeros(0, np.int32)
    dense_mask = np.zeros(len(rows), np.bool_)
    if n_cells:
        # pad the cell list so the device scan has equal-size steps —
        # allocated UP FRONT: np.concatenate on the ml_dtypes bfloat16
        # dtype is an element-wise cast loop, not memcpy (measured 27 s
        # for a 2.5 GB append of 67 zero cells; exp_split_stages.py).
        # Pre-sizing the buffer makes the pad cells free (already zero).
        n_slots = len(slot_rb) if slot_rb is not None else n_cells
        chunk = _scan_chunk(n_slots)
        pad = -n_slots % chunk
        # hugepage-backed: plain np.zeros first-touch faults cost ~27us/
        # page once the process holds a few GB (utils/alloc.py) — at
        # 2.7 GB that was 15-30 s of the round-2 "host prep" variance
        from sgc_tpu.utils.alloc import zeros_hugepage

        cells = zeros_hugepage(
            (n_slots + pad) * row_block * stripe, np.dtype("bfloat16"))
        # fused native scatter (graphprep.cpp cell_scatter_bf16):
        # flat-index + bf16 round + adjacent-duplicate f32 run-sums in
        # one multithreaded pass, bitwise-equal to the numpy twin below
        # (tests/test_native.py) — ~8 s -> <1 s per call at Reddit scale.
        mask_u8 = np.empty(len(rows), np.uint8)
        if native.cell_scatter(rows, cols, vals, compact, n_st,
                               row_block, stripe, cells.view(np.uint16),
                               mask_u8):
            dense_mask = mask_u8.view(np.bool_)
        else:
            # numpy twin of the native pass
            k = compact[cell]
            dense_mask = k >= 0
            kd = k[dense_mask]
            rdm = rows[dense_mask]
            cdm = cols[dense_mask]
            vd = vals[dense_mask]
            flat_idx = (kd * (row_block * stripe)
                        + (rdm % row_block) * stripe + (cdm % stripe))
            # flat bf16 scatter: per-element round-to-nearest, identical
            # to f32-build + astype, and ~100x faster at 5 GB scale
            # (measured 0.5s vs 33s assign + 22s astype — the f32
            # buffer doubles the page-fault footprint)
            cells[flat_idx] = vd.astype(np.dtype("bfloat16"))
            # duplicates (rare: from_coo does not coalesce) must SUM,
            # not last-write-win. Sorted edges make them adjacent: fix
            # up ONLY the duplicated positions with f32 group sums
            # (reduceat), so a single dup doesn't forfeit the fast path
            # or allocate a second multi-GB f32 buffer.
            key = (rdm << 32) | cdm
            if len(key) > 1 and (key[1:] == key[:-1]).any():
                starts = np.flatnonzero(
                    np.concatenate(([True], key[1:] != key[:-1])))
                lengths = np.diff(np.append(starts, len(key)))
                dup = lengths > 1
                sums = np.add.reduceat(vd, starts)[dup].astype(np.float32)
                cells[flat_idx[starts[dup]]] = sums.astype(
                    np.dtype("bfloat16"))
        cells = cells.reshape(n_slots + pad, row_block, stripe)
        if slot_rb is not None:
            rb_ids, st_ids = slot_rb, slot_st
        else:
            rb_ids = (qualifying // n_st).astype(np.int32)
            st_ids = (qualifying % n_st).astype(np.int32)
        # Tail padding repeats the LAST slot's (rb, st) with a zero
        # matrix: contributes nothing on any path, keeps rb_ids
        # non-decreasing (classic kernel's output-revisiting contract),
        # and — since group_cells divides CELL_CHUNK — keeps the
        # grouped layout's G-alignment.
        if pad:
            rb_ids = np.concatenate(
                [rb_ids, np.full(pad, rb_ids[-1], np.int32)])
            st_ids = np.concatenate(
                [st_ids, np.full(pad, st_ids[-1], np.int32)])

    rest = None
    n_dense = int(dense_mask.sum())
    n_sparse = len(rows) - n_dense
    if n_sparse:
        rest = SparseGraph.from_coo(
            rows[~dense_mask], cols[~dense_mask], vals[~dense_mask],
            n_rows=graph.n_rows, n_cols=graph.n_cols,
            device=False, presorted=True,
        )
    return BlockDenseSplit(
        cells=cells, rb_ids=rb_ids, st_ids=st_ids, rest=rest,
        n_rows=graph.n_rows, n_cols=graph.n_cols,
        row_block=row_block, stripe=stripe, n_cells=n_cells,
        dense_edges=n_dense, sparse_edges=n_sparse, min_edges=min_edges,
        super_rows=super_rows, group_cells=group_cells,
    )


def blockdense_device_args(split: BlockDenseSplit) -> tuple:
    """Device-placed (cells, rb_ids, st_ids, rest) — placed ONCE; pass
    as jit arguments (HLO-literal closures trip remote-compile limits,
    see ops/spmm_hybrid.hybrid_device_args)."""
    dense = None
    if split.n_cells:
        dense = (jnp.asarray(split.cells), jnp.asarray(split.rb_ids),
                 jnp.asarray(split.st_ids))
    rest = jax.device_put(split.rest) if split.rest is not None else None
    return (dense, rest)


def _blockdense_kernel(
    rb_ref,            # int32[n_cells] (SMEM, prefetched)
    st_ref,            # int32[n_cells] (SMEM, prefetched)
    a_ref,             # bf16[1, R, W] (VMEM block: cell k)
    xs_ref,            # [W, Ft]      (VMEM block: stripe st[k], f-tile f)
    out_ref,           # f32[R, Ft]   (VMEM block: row block rb[k], f-tile f)
    *, mm_dtype,
):
    k = pl.program_id(1)

    # first cell of a row block initializes the accumulator; the
    # pipeline flushes it when rb[k] changes (rb is non-decreasing —
    # split_block_dense sorts cells and pads with the last rb)
    @pl.when((k == 0) | (rb_ref[k] != rb_ref[jnp.maximum(k - 1, 0)]))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jnp.dot(
        a_ref[0].astype(mm_dtype), xs_ref[...].astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )


def _blockdense_super_kernel(
    rbs_ref,           # int32[n_cells] super-row id rb//S (SMEM)
    rloc_ref,          # int32[n_cells] rb within the super row (SMEM)
    st_ref,            # int32[n_cells] (SMEM)
    a_ref,             # bf16[1, R, W] (VMEM block: cell k)
    xs_ref,            # [W, Ft]      (VMEM block: stripe st[k], f-tile f)
    out_ref,           # f32[S*R, Ft] (VMEM block: super row rbs[k], f-tile)
    *, mm_dtype, row_block,
):
    """Super-row variant: the out panel spans S row blocks, so cells
    ordered (rb//S, st, rb) revisit it consecutively while CONSECUTIVE
    EQUAL st entries reuse the stripe block without a re-fetch — one
    stripe load per (panel, stripe) instead of per (row block, stripe).
    Attacks the stripe re-read factor (the dense term's dominant bytes
    at clustered dense fractions; RESULTS.md roofline)."""
    k = pl.program_id(1)

    @pl.when((k == 0) | (rbs_ref[k] != rbs_ref[jnp.maximum(k - 1, 0)]))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    r0 = rloc_ref[k] * row_block
    out_ref[pl.dslice(r0, row_block), :] += jnp.dot(
        a_ref[0].astype(mm_dtype), xs_ref[...].astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )


def _blockdense_group_kernel(
    rbs_ref,           # int32[n_groups] super-row id per GROUP (SMEM)
    rloc_ref,          # int32[n_slots] rb within super row, per slot
    stg_ref,           # int32[n_groups] stripe id per group (SMEM)
    a_ref,             # bf16[G, R, W] (VMEM block: group k's cells)
    xs_ref,            # [W, Ft]      (VMEM block: stripe stg[k])
    out_ref,           # f32[S*R, Ft] (VMEM block: super row rbs[k])
    *, mm_dtype, row_block, group,
):
    """Grouped super-row variant: G cells per grid step, all in one
    (panel, stripe) run — one stripe block feeds G matmuls, cutting the
    per-grid-step overhead the super-row A/B measured as the dense
    term's bound (~8.7 us/step vs 1.7 us of MXU work per cell). Pad
    cells are zero matrices (their rloc repeats a real row slice) and
    contribute nothing."""
    k = pl.program_id(1)

    @pl.when((k == 0) | (rbs_ref[k] != rbs_ref[jnp.maximum(k - 1, 0)]))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    xs = xs_ref[...].astype(mm_dtype)
    for g in range(group):        # static unroll
        r0 = rloc_ref[k * group + g] * row_block
        out_ref[pl.dslice(r0, row_block), :] += jnp.dot(
            a_ref[g].astype(mm_dtype), xs,
            preferred_element_type=jnp.float32,
        )


def default_feature_tile(n_features: int) -> int:
    """ONE f-tile up to 1024 lanes (128-rounded): n_ft multiplies cell
    re-reads — every f-tile re-streams every cell — and the single-tile
    form measured 26.8 -> 19.3 ms net on the full-scale main split
    (round 3, scripts/exp_dense_term.py)."""
    return min(-(-max(int(n_features), 128) // 128) * 128, 1024)


def apply_cells_pallas(
    cells: jnp.ndarray,      # bf16[C, R, W]
    rb: jnp.ndarray,         # int32[C], order per ``super_rows``
    st: jnp.ndarray,         # int32[C]
    xp: jnp.ndarray,         # [n_st * W, F_pad], F_pad % Ft == 0
    n_rb: int,
    feature_tile: int,
    interpret: bool,
    mm_dtype=jnp.bfloat16,
    super_rows: int | None = None,
    group_cells: int | None = None,
) -> jnp.ndarray:
    """The streamed dense-cell term as one pallas_call: cells and
    x-stripes arrive as scalar-prefetch-indexed VMEM blocks, the output
    block revisits/accumulates per row block (``super_rows=None``,
    cells in (rb, st) order) or per S-row-block panel (``super_rows=S``,
    cells in (rb//S, st, rb) order — one stripe load per (panel,
    stripe); see ``_blockdense_super_kernel``). Returns
    f32[ceil(n_rb/S)*S*R, F_pad] (callers slice to n_rows).

    Shared by the single-chip op (:func:`spmm_blockdense_pallas`) and
    the per-chip sharded hop (parallel/blockdense.py form="pallas").
    """
    C, R, W = cells.shape
    Ft = feature_tile
    if xp.shape[1] % Ft:
        raise ValueError(f"F_pad {xp.shape[1]} not divisible by Ft {Ft}")
    n_ft = xp.shape[1] // Ft
    if mm_dtype == jnp.bfloat16:
        xp = xp.astype(jnp.bfloat16)   # halves stripe traffic; MXU
        # rounds operands to bf16 regardless (DESIGN §2d)

    if super_rows is not None:
        S = int(super_rows)
        n_rb_pad = -(-n_rb // S) * S
        rbs = rb // S
        rloc = rb - rbs * S
        if group_cells is not None:
            G = int(group_cells)
            if C % G:
                raise ValueError(f"cell count {C} not a multiple of "
                                 f"group_cells {G}")
            n_groups = C // G
            # per-GROUP panel/stripe (a group lies inside one
            # (panel, stripe) run by construction)
            rbs_g = rbs[::G]
            st_g = st[::G]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_ft, n_groups),
                in_specs=[
                    pl.BlockSpec((G, R, W),
                                 lambda f, k, rbs, rl, st: (k, 0, 0)),
                    pl.BlockSpec((W, Ft),
                                 lambda f, k, rbs, rl, st: (st[k], f)),
                ],
                out_specs=pl.BlockSpec(
                    (S * R, Ft), lambda f, k, rbs, rl, st: (rbs[k], f),
                    memory_space=pltpu.VMEM,
                ),
            )
            return pl.pallas_call(
                partial(_blockdense_group_kernel, mm_dtype=mm_dtype,
                        row_block=R, group=G),
                out_shape=jax.ShapeDtypeStruct(
                    (n_rb_pad * R, xp.shape[1]), jnp.float32),
                grid_spec=grid_spec,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024),
                cost_estimate=pl.CostEstimate(
                    flops=2 * R * W * Ft * C * n_ft,
                    bytes_accessed=(
                        (C * R * W * 2) * n_ft
                        + n_groups * W * Ft * xp.dtype.itemsize
                        + n_rb_pad * R * xp.shape[1] * 4
                    ),
                    transcendentals=0,
                ),
                interpret=interpret,
            )(rbs_g, rloc, st_g, cells, xp)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_ft, C),
            in_specs=[
                pl.BlockSpec((1, R, W),
                             lambda f, k, rbs, rl, st: (k, 0, 0)),
                pl.BlockSpec((W, Ft),
                             lambda f, k, rbs, rl, st: (st[k], f)),
            ],
            out_specs=pl.BlockSpec(
                (S * R, Ft), lambda f, k, rbs, rl, st: (rbs[k], f),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            partial(_blockdense_super_kernel, mm_dtype=mm_dtype,
                    row_block=R),
            out_shape=jax.ShapeDtypeStruct((n_rb_pad * R, xp.shape[1]),
                                           jnp.float32),
            grid_spec=grid_spec,
            # the S*R x Ft out panel exceeds the backend's default 16 MB
            # scoped-vmem budget at S >= 8 (measured OOM at 22.25M);
            # v5e VMEM is 128 MB, so raise the cap for this kernel
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * R * W * Ft * C * n_ft,
                bytes_accessed=(
                    (C * R * W * 2) * n_ft
                    + C * W * Ft * xp.dtype.itemsize  # ~1 stripe/visit group
                    + n_rb_pad * R * xp.shape[1] * 4
                ),
                transcendentals=0,
            ),
            interpret=interpret,
        )(rbs, rloc, st, cells, xp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_ft, C),
        in_specs=[
            pl.BlockSpec((1, R, W), lambda f, k, rb, st: (k, 0, 0)),
            pl.BlockSpec((W, Ft), lambda f, k, rb, st: (st[k], f)),
        ],
        out_specs=pl.BlockSpec(
            (R, Ft), lambda f, k, rb, st: (rb[k], f),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        partial(_blockdense_kernel, mm_dtype=mm_dtype),
        out_shape=jax.ShapeDtypeStruct((n_rb * R, xp.shape[1]),
                                       jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * R * W * Ft * C * n_ft,
            bytes_accessed=(
                (C * (R * W * 2 + W * Ft * xp.dtype.itemsize)) * n_ft
                + n_rb * R * xp.shape[1] * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(rb, st, cells, xp)


def spmm_blockdense_pallas(
    split: BlockDenseSplit,
    x: jnp.ndarray,
    args: tuple | None = None,
    feature_tile: int | None = None,
    interpret: bool | None = None,
    precision: str = "bf16",
) -> jnp.ndarray:
    """The dense cells as a Pallas kernel + segment remainder.

    Same math as :func:`spmm_block_dense`'s scan path, but the stripe
    gather and out-blocks never materialize in HBM: the block pipeline
    streams A cells and x stripes into VMEM (scalar-prefetch index
    maps, the mechanism `spmm_pallas_flat` compiles with on this
    backend) and the output block revisits/accumulates per row block.
    Removes the scan path's ~2x HBM-traffic overhead around the
    matmuls (DESIGN §2e) — benchmark via `pallas_bench --blockdense`.
    """
    from sgc_tpu.ops.spmm_pallas import _default_interpret

    if interpret is None:
        interpret = _default_interpret()
    if args is None:
        args = blockdense_device_args(split)
    dense, rest = args
    if split.n_cells and dense is None:
        raise ValueError("split has dense cells but args carry none")
    if split.rest is not None and rest is None:
        raise ValueError("split has a sparse remainder but args carry none")

    parts = []
    if split.n_cells:
        cells, rb, st = dense
        R, W = split.row_block, split.stripe
        n_rb, n_st = split.n_row_blocks, split.n_stripes
        mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
        if feature_tile is None:
            feature_tile = default_feature_tile(x.shape[1])
        Ft = min(feature_tile, max(int(x.shape[1]), 128))
        f_pad = (-x.shape[1]) % Ft
        xp = jnp.pad(x, ((0, n_st * W - x.shape[0]), (0, f_pad)))
        out = apply_cells_pallas(cells, rb, st, xp, n_rb, Ft,
                                 interpret, mm_dtype=mm_dtype,
                                 super_rows=split.super_rows,
                                 group_cells=split.group_cells)
        # row blocks no cell visits leave their slots undefined
        visited = np.zeros(n_rb, bool)
        visited[np.unique(np.asarray(split.rb_ids))] = True
        res = out[: split.n_rows, : x.shape[1]]
        if not visited.all():
            mask = jnp.asarray(
                np.repeat(visited, R)[: split.n_rows])
            res = jnp.where(mask[:, None], res, 0.0)
        parts.append(res)
    if rest is not None:
        parts.append(spmm_segment(rest, x))
    if not parts:
        return jnp.zeros((split.n_rows, x.shape[1]), jnp.float32)
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def apply_cells_scan(
    cells: jnp.ndarray,        # bf16[C, R, W], C a multiple of ``chunk``
    rb_ids: jnp.ndarray,       # int32[C]
    st_ids: jnp.ndarray,       # int32[C]
    xb: jnp.ndarray,           # [n_st, W, F] striped dense operand
    n_rb: int,
    chunk: int,
    mm_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """``sum_k cells[k] @ xb[st[k]]`` scattered into row blocks.

    The scan form of the dense-cell term, shared by the single-chip
    :func:`spmm_block_dense` and the sharded per-chip path
    (parallel/blockdense.py — the same math applied to the local+halo
    gather table inside shard_map). Returns f32[n_rb, R, F];
    deterministic (fixed scan order + segment_sum f32 accumulation).
    """
    C, R, _ = cells.shape
    F = xb.shape[2]
    if C == 0:
        return jnp.zeros((n_rb, R, F), jnp.float32)
    if C % chunk:
        raise ValueError(f"cell count {C} not a multiple of chunk {chunk}")
    n_steps = C // chunk
    cells_s = cells.reshape(n_steps, chunk, R, cells.shape[2])
    rb_s = rb_ids.reshape(n_steps, chunk)
    st_s = st_ids.reshape(n_steps, chunk)

    def step(acc, inp):
        a, rbi, sti = inp
        xg = jnp.take(xb, sti, axis=0)              # [chunk, W, F]
        out = jnp.einsum(
            "crw,cwf->crf", a.astype(mm_dtype), xg.astype(mm_dtype),
            preferred_element_type=jnp.float32)
        acc = acc + jax.ops.segment_sum(out, rbi, num_segments=n_rb)
        return acc, None

    acc0 = jnp.zeros((n_rb, R, F), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (cells_s, rb_s, st_s))
    return acc


def spmm_block_dense(
    split: BlockDenseSplit,
    x: jnp.ndarray,
    args: tuple | None = None,
    precision: str = "bf16",
) -> jnp.ndarray:
    """``S @ x`` through materialized-cell matmuls + segment remainder.

    Jit-traceable. ``args`` (from :func:`blockdense_device_args`) carries
    the large arrays as traced values; omitting it closes over the host
    arrays (fine in tests, wrong at scale). ``precision`` controls the
    x-side cast only — cells are stored bf16 either way, and the MXU
    rounds operands to bf16 regardless, so 'f32' is for CPU-exactness
    tests (where bf16 emulation actually loses bits).

    Deterministic: cell accumulation order is fixed (scan order + f32
    segment-sum), remainder is the sorted segment path.
    """
    if args is None:
        args = blockdense_device_args(split)
    dense, rest = args
    if split.n_cells and dense is None:
        raise ValueError("split has dense cells but args carry none")
    if split.rest is not None and rest is None:
        raise ValueError("split has a sparse remainder but args carry none")

    parts = []
    if split.n_cells:
        cells, rb, st = dense
        R, W = split.row_block, split.stripe
        n_rb, n_st = split.n_row_blocks, split.n_stripes
        mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
        xp = jnp.pad(x, ((0, n_st * W - x.shape[0]), (0, 0)))
        xb = xp.astype(mm_dtype).reshape(n_st, W, -1)
        acc = apply_cells_scan(
            cells, rb, st, xb, n_rb, _scan_chunk(split.n_cells),
            mm_dtype=mm_dtype)
        parts.append(acc.reshape(n_rb * R, -1)[: split.n_rows])
    if rest is not None:
        parts.append(spmm_segment(rest, x))
    if not parts:
        return jnp.zeros((split.n_rows, x.shape[1]), jnp.float32)
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


# Same keying discipline as spmm_hybrid._split_cached: repeated hops /
# training calls must not re-split (O(E) host work + GBs of cells).
from sgc_tpu.utils.buildcache import HostBuildCache

_SPLIT_CACHE = HostBuildCache(4)


def _split_cached(graph: SparseGraph, n_features: int, row_block: int,
                  stripe: int) -> BlockDenseSplit:
    return _SPLIT_CACHE.get(
        (graph.rows, graph.cols, graph.vals),
        (graph.nnz, n_features, row_block, stripe),
        lambda: split_block_dense(graph, n_features, row_block, stripe))


# Device-args cache beside the split cache: without it every drop-in
# call rebuilt them via jnp.asarray, RE-UPLOADING the multi-GB bf16
# cell buffer per hop over a tunneled backend (round-4 review finding;
# CLAUDE.md: device_put once, pass as jit arguments). Capped at 2
# entries: each pins a device-RESIDENT multi-GB cell buffer, and on a
# 16 GB v5e holding 4 stale splits' HBM is a real budget risk (round-4
# advisor) — 2 covers the K-hop main+final pair; swapped-out graphs'
# buffers free on FIFO eviction, or explicitly via
# :func:`clear_device_args_cache`.
_ARGS_CACHE = HostBuildCache(2)


def _device_args_cached(split: BlockDenseSplit):
    return _ARGS_CACHE.get(
        (split,), (), lambda: blockdense_device_args(split))


def clear_device_args_cache() -> None:
    """Free the cached device-resident cell buffers (HBM) now instead of
    waiting for FIFO eviction — call when the graph working set changes."""
    _ARGS_CACHE.clear()


def spmm_blockdense(
    graph: SparseGraph,
    x: jnp.ndarray,
    row_block: int = DEFAULT_ROW_BLOCK,
    stripe: int = DEFAULT_STRIPE,
    precision: str = "bf16",
) -> jnp.ndarray:
    """Drop-in block-dense SpMM: split on first use (cached), dispatch.

    Needs a concrete graph (host tiling) — call outside jit or use
    LocalityPlan/spmm_block_dense with prebuilt splits for traced code.
    """
    split = _split_cached(graph, int(x.shape[1]), row_block, stripe)
    return spmm_block_dense(split, x, args=_device_args_cached(split),
                            precision=precision)
