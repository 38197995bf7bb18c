"""Pallas TPU SpMM kernel: tiled sparse (adjacency) x dense (features).

The reference delegates SpMM to cuSPARSE (``torch.spmm``, reference
utils.py:95). This kernel is the TPU-native equivalent, built for the
hardware rather than translated: the irregular gather/scatter of a
power-law graph is restructured into **dense MXU work over VMEM-resident
tiles** so the systolic array does the data movement.

Design (see SURVEY.md §7 "hard parts" #1):

* The matrix is pre-tiled into (row-block R x column-stripe W) **cells**;
  edges are sorted by (cell, row) and padded per-cell to CHUNK-sized
  slices (:func:`tile_graph`, host-side, numpy — the C++ graphprep tool
  covers the large-graph sort).
* Grid = (feature-tile, row-block). The output block (R, Ft) stays
  resident in VMEM across the whole stripe loop (grid iterates row-blocks
  in the minor-most grid dimension only once per f-tile), so partial sums
  never round-trip HBM — the (E, F) edge-major intermediate of the XLA
  segment-sum path never exists.
* Per stripe j: the x-stripe (W, Ft) is DMA'd HBM->VMEM once and reused
  by every edge chunk of the cell (cells are skipped entirely when empty
  — `cell_nchunks` arrives via scalar prefetch).
* Per edge chunk (C edges): gather and scatter both become **one-hot
  matmuls on the MXU** with f32 accumulation (f32 one-hots by default —
  exact selection; bf16 optional for 2x MXU rate):
      gathered = onehot(cols_local, W) @ x_stripe        (C, Ft)
      acc     += onehot_T(rows_local, R) @ (gathered * vals)  (R, Ft)
  One-hot matmul trades (W + R) * 2 * Ft flops/edge for perfectly regular
  MXU work. MODEL ESTIMATE (never measured compiled — see below): at
  Reddit scale the audited cost model (cli/pallas_bench.py, CostEstimate
  audit test) gives ~91 TFLOP/hop at the R=W=2048 defaults (~460 ms bf16
  at v5e peak; smaller cells trade FLOPs against chunk padding and stripe
  re-reads — ~35 TFLOP at R=W=1024/C=256), with the HBM stripe stream
  (x re-read once per row block) overlapped by the block pipeline.
* Deterministic: edges have a fixed order per cell and accumulation is
  f32 adds in stripe-major order, so results are bitwise reproducible
  run-to-run (the adversarial case for parity tests, SURVEY.md §4c).

Correctness is validated in interpret mode against the XLA segment-sum
oracle on every test run (tests/test_spmm_pallas.py); compiled execution
requires direct (non-tunneled) TPU access.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgc_tpu.graph.sparse import SparseGraph

# Defaults tuned for ~16 MB VMEM: x-stripe (W, 256) f32 = 2 MB (double-
# buffered), one-hot operands (C, W) + (R, C) bf16 = 4 MB + 4 MB, output
# accumulator (R, 256) f32 = 2 MB.
DEFAULT_ROW_BLOCK = 2048     # R
DEFAULT_STRIPE = 2048        # W
DEFAULT_CHUNK = 1024         # C (edges per chunk)
DEFAULT_FEATURE_TILE = 256   # Ft


@dataclasses.dataclass(frozen=True)
class TiledGraph:
    """Cell-tiled edge layout consumed by the Pallas kernel.

    Edge arrays are concatenated per-cell chunk slices; ``cell_start[i,j]``
    (in chunks) and ``cell_nchunks[i,j]`` index them. Padding edges have
    ``val == 0`` and in-cell-range row/col so they contribute nothing.
    """

    rows: np.ndarray          # int32[n_chunks_total * C]
    cols: np.ndarray          # int32[n_chunks_total * C]
    vals: np.ndarray          # float32[n_chunks_total * C]
    cell_start: np.ndarray    # int32[n_rb, n_st]
    cell_nchunks: np.ndarray  # int32[n_rb, n_st]
    n_rows: int
    n_cols: int
    row_block: int
    stripe: int
    chunk: int

    @property
    def n_row_blocks(self) -> int:
        return self.cell_start.shape[0]

    @property
    def n_stripes(self) -> int:
        return self.cell_start.shape[1]


def tile_graph(
    graph: SparseGraph,
    row_block: int = DEFAULT_ROW_BLOCK,
    stripe: int = DEFAULT_STRIPE,
    chunk: int = DEFAULT_CHUNK,
) -> TiledGraph:
    """Sort edges into (row-block, stripe) cells, pad each cell to chunks.

    Host-side preprocessing (numpy). Done once per graph — the SGC K-hop
    loop reuses the tiling for every hop and every K.
    """
    rows = np.asarray(graph.rows)[: graph.nnz].astype(np.int64)
    cols = np.asarray(graph.cols)[: graph.nnz].astype(np.int64)
    vals = np.asarray(graph.vals)[: graph.nnz].astype(np.float32)

    n_rb = -(-graph.n_rows // row_block)
    n_st = -(-graph.n_cols // stripe)

    cell = (rows // row_block) * n_st + (cols // stripe)
    counts = np.bincount(cell, minlength=n_rb * n_st)
    nchunks = -(-counts // chunk)  # ceil; 0 for empty cells
    out_chunks = int(nchunks.sum())
    cell_start = np.zeros(n_rb * n_st, np.int64)
    np.cumsum(nchunks[:-1], out=cell_start[1:])

    from sgc_tpu import native

    filled = native.tile_fill(
        rows, cols, vals, cell, cell_start, counts, chunk, n_st,
        row_block, stripe, out_chunks,
    )
    if filled is not None:
        # native counting sort: edges arrive (row, col)-sorted (the
        # SparseGraph invariant), the stable bucket walk yields the same
        # (cell, row, col) layout as the numpy twin below, bitwise
        r_out, c_out, v_out = filled
    else:
        order = np.lexsort((rows, cell))
        rows, cols, vals, cl = (rows[order], cols[order], vals[order],
                                cell[order])

        r_out = np.zeros(out_chunks * chunk, np.int32)
        c_out = np.zeros(out_chunks * chunk, np.int32)
        v_out = np.zeros(out_chunks * chunk, np.float32)

        # scatter each cell's edges into its padded slot (vectorized)
        in_cell_pos = np.arange(len(rows)) - np.concatenate(
            ([0], np.cumsum(counts)))[cl]
        dst = cell_start[cl] * chunk + in_cell_pos
        r_out[dst] = rows
        c_out[dst] = cols
        v_out[dst] = vals

        # padding edges: clamp indices into the cell so local offsets
        # stay in-range (val 0 makes them no-ops)
        pad_mask = np.ones(out_chunks * chunk, bool)
        pad_mask[dst] = False
        if pad_mask.any():
            pad_cell = np.repeat(
                np.arange(n_rb * n_st), nchunks * chunk)[pad_mask]
            r_out[pad_mask] = (pad_cell // n_st) * row_block
            c_out[pad_mask] = (pad_cell % n_st) * stripe

    return TiledGraph(
        rows=r_out, cols=c_out, vals=v_out,
        cell_start=cell_start.astype(np.int32).reshape(n_rb, n_st),
        cell_nchunks=nchunks.astype(np.int32).reshape(n_rb, n_st),
        n_rows=graph.n_rows, n_cols=graph.n_cols,
        row_block=row_block, stripe=stripe, chunk=chunk,
    )


def _spmm_kernel(
    # scalar prefetch
    cell_start_ref,    # int32[n_rb, n_st] (SMEM)
    cell_nchunks_ref,  # int32[n_rb, n_st] (SMEM)
    # tensor inputs
    rows_ref,          # int32[n_chunks*C] (ANY/HBM)
    cols_ref,
    vals_ref,
    x_ref,             # f32[n_cols_padded, F] (ANY/HBM)
    # output
    out_ref,           # f32[R, Ft] (VMEM block)
    # scratch
    xs_ref,            # f32[2, W, Ft] stripe double buffer
    er_ref,            # int32[2, C] edge rows double buffer
    ec_ref,            # int32[2, C]
    ev_ref,            # f32[2, C]
    acc_ref,           # f32[R, Ft]
    sems,              # DMA sems: (2, 4) [slot][x, rows, cols, vals]
    *,
    R: int, W: int, C: int, Ft: int, n_st: int, mm_dtype,
):
    f = pl.program_id(0)
    i = pl.program_id(1)

    acc_ref[:] = jnp.zeros_like(acc_ref)

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)

    def x_dma(slot, j):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(j * W, W), pl.ds(f * Ft, Ft)],
            xs_ref.at[slot],
            sems.at[slot, 0],
        )

    def edge_dma(slot, chunk_idx):
        s = pl.ds(chunk_idx * C, C)
        return (
            pltpu.make_async_copy(rows_ref.at[s], er_ref.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(cols_ref.at[s], ec_ref.at[slot], sems.at[slot, 2]),
            pltpu.make_async_copy(vals_ref.at[s], ev_ref.at[slot], sems.at[slot, 3]),
        )

    def process_cell(j, x_slot):
        """All chunks of cell (i, j); x stripe already resident in x_slot."""
        start = cell_start_ref[i, j]
        n = cell_nchunks_ref[i, j]

        @pl.when(n > 0)
        def _():
            for d in edge_dma(0, start):
                d.start()

            def chunk_body(k, _):
                slot = jax.lax.rem(k, 2)
                nxt = jax.lax.rem(k + 1, 2)

                @pl.when(k + 1 < n)
                def _():
                    for d in edge_dma(nxt, start + k + 1):
                        d.start()

                for d in edge_dma(slot, start + k):
                    d.wait()

                local_c = ec_ref[slot] - j * W
                local_r = er_ref[slot] - i * R
                g = (local_c[:, None] == iota_w).astype(mm_dtype)
                gathered = jnp.dot(
                    g, xs_ref[x_slot].astype(mm_dtype),
                    preferred_element_type=jnp.float32,
                )
                weighted = gathered * ev_ref[slot][:, None]
                s = (iota_r == local_r[None, :]).astype(mm_dtype)
                acc_ref[:] += jnp.dot(
                    s, weighted.astype(mm_dtype),
                    preferred_element_type=jnp.float32,
                )
                return 0

            jax.lax.fori_loop(0, n, chunk_body, 0)

    # stripe loop with double-buffered x DMA, skipping empty cells' compute
    # (their stripe still streams in; skipping the load too would need a
    # nonempty-stripe index list — a second-order optimization)
    x_dma(0, 0).start()

    def stripe_body(j, _):
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < n_st)
        def _():
            x_dma(nxt, j + 1).start()

        x_dma(slot, j).wait()
        process_cell(j, slot)
        return 0

    jax.lax.fori_loop(0, n_st, stripe_body, 0)
    out_ref[:] = acc_ref[:]


def _pad_for_kernel(tiled: TiledGraph, x: jnp.ndarray, feature_tile: int,
                    precision: str):
    """Shared kernel prologue: pad x to the tiling, pick the f-tile.

    Columns pad to n_stripes*W; Ft is snapped up to a 128-lane multiple
    (Mosaic wants minor dims in lane-width multiples on real hardware —
    unaligned Ft only ever ran in interpret mode). Both kernel
    generations and the CLI cost model must agree on this selection, so
    it lives in exactly one place. Returns (x, Ft, n_ft, mm_dtype).
    """
    n_cols_pad = tiled.n_stripes * tiled.stripe
    if x.shape[0] < n_cols_pad:
        x = jnp.pad(x, ((0, n_cols_pad - x.shape[0]), (0, 0)))
    Ft = min(feature_tile, max(int(x.shape[1]), 128))
    Ft = -(-Ft // 128) * 128
    f_pad = (-x.shape[1]) % Ft
    if f_pad:
        x = jnp.pad(x, ((0, 0), (0, f_pad)))
    n_ft = x.shape[1] // Ft
    mm_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[precision]
    return x, Ft, n_ft, mm_dtype


def spmm_pallas_tiled(
    tiled: TiledGraph,
    x: jnp.ndarray,
    feature_tile: int = DEFAULT_FEATURE_TILE,
    interpret: bool = False,
    precision: str = "f32",
) -> jnp.ndarray:
    """SpMM over a pre-tiled graph. Returns float32[n_rows, F_padded] with
    rows/features padded to block multiples (caller slices)."""
    R, W, C = tiled.row_block, tiled.stripe, tiled.chunk
    n_rb, n_st = tiled.n_row_blocks, tiled.n_stripes

    x, Ft, n_ft, mm_dtype = _pad_for_kernel(tiled, x, feature_tile,
                                            precision)
    if tiled.rows.shape[0] == 0:
        # zero-edge graph: the kernel's per-cell DMA loops slice empty
        # edge arrays (rejected even in interpret mode); product is zero
        return jnp.zeros((n_rb * R, x.shape[1]), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_ft, n_rb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # rows
            pl.BlockSpec(memory_space=pl.ANY),   # cols
            pl.BlockSpec(memory_space=pl.ANY),   # vals
            pl.BlockSpec(memory_space=pl.ANY),   # x
        ],
        out_specs=pl.BlockSpec(
            (R, Ft), lambda f, i, *_: (i, f), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, W, Ft), jnp.float32),
            pltpu.VMEM((2, C), jnp.int32),
            pltpu.VMEM((2, C), jnp.int32),
            pltpu.VMEM((2, C), jnp.float32),
            pltpu.VMEM((R, Ft), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )

    kernel = partial(
        _spmm_kernel, R=R, W=W, C=C, Ft=Ft, n_st=n_st, mm_dtype=mm_dtype,
    )
    # One-hot gather (C,W)@(W,Ft) + scatter (R,C)@(C,Ft) per chunk per
    # feature tile -> 2*(W+R)*Ft flops per padded edge per f-tile. The
    # audit test (tests/test_spmm_pallas.py) pins this against an
    # independent per-matmul count.
    edge_flops = 2 * (W + R) * Ft * tiled.rows.shape[0] * n_ft
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rb * R, x.shape[1]), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=edge_flops,
            bytes_accessed=(
                x.size * 4 * n_rb + tiled.rows.size * 12 * n_ft
                + n_rb * R * x.shape[1] * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(tiled.cell_start),
        jnp.asarray(tiled.cell_nchunks),
        jnp.asarray(tiled.rows),
        jnp.asarray(tiled.cols),
        jnp.asarray(tiled.vals),
        x,
    )
    return out


# ---------------------------------------------------------------------------
# Flat-schedule kernel (generation 2): scalar-prefetch index maps +
# output revisiting — NO manual DMA, NO semaphores
# ---------------------------------------------------------------------------


def _flat_schedule(tiled: TiledGraph):
    """Per-chunk (row_block, stripe) ids in the cells' chunk order.

    tile_graph lays chunks out cell-major (cells sorted by
    rb * n_st + st), so chunk_rb is NON-DECREASING — the property that
    lets the output block revisit (accumulate in VMEM, flush once per
    row block) instead of round-tripping HBM per chunk.
    """
    n_st = tiled.n_stripes
    cell_ids = np.repeat(
        np.arange(tiled.n_row_blocks * n_st),
        tiled.cell_nchunks.reshape(-1),
    )
    chunk_rb = (cell_ids // n_st).astype(np.int32)
    chunk_st = (cell_ids % n_st).astype(np.int32)
    return chunk_rb, chunk_st


def _spmm_flat_kernel(
    rb_ref,            # int32[n_chunks] (SMEM, prefetched)
    st_ref,            # int32[n_chunks] (SMEM, prefetched)
    rows_ref,          # int32[C]   (VMEM block of chunk k)
    cols_ref,          # int32[C]
    vals_ref,          # f32[C]
    xs_ref,            # f32[W, Ft] (VMEM block: stripe st[k], f-tile f)
    out_ref,           # f32[R, Ft] (VMEM block: row block rb[k], f-tile f)
    *, R: int, W: int, C: int, mm_dtype,
):
    k = pl.program_id(1)

    # first chunk of a row block (within this f-tile pass) initializes
    # the accumulator; the pipeline flushes it when rb[k] changes
    @pl.when((k == 0) | (rb_ref[k] != rb_ref[jnp.maximum(k - 1, 0)]))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    local_c = cols_ref[...] - st_ref[k] * W
    local_r = rows_ref[...] - rb_ref[k] * R
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    g = (local_c[:, None] == iota_w).astype(mm_dtype)
    gathered = jnp.dot(g, xs_ref[...].astype(mm_dtype),
                       preferred_element_type=jnp.float32)
    weighted = gathered * vals_ref[...][:, None]
    s = (iota_r == local_r[None, :]).astype(mm_dtype)
    out_ref[...] += jnp.dot(s, weighted.astype(mm_dtype),
                            preferred_element_type=jnp.float32)


def spmm_pallas_flat(
    tiled: TiledGraph,
    x: jnp.ndarray,
    feature_tile: int = DEFAULT_FEATURE_TILE,
    interpret: bool = False,
    precision: str = "f32",
) -> jnp.ndarray:
    """Generation-2 SpMM kernel: flat chunk schedule, automatic pipelining.

    Same cell tiling and one-hot MXU math as :func:`spmm_pallas_tiled`,
    restructured so ALL data movement is Pallas's automatic block
    pipeline driven by scalar-prefetch index maps:

    * grid = (n_ft, n_chunks); chunk k's edge slice arrives as an
      affine-indexed VMEM block, its x-stripe via index map
      ``(st[k], f)``, and its output block via ``(rb[k], f)``;
    * chunks are cell-major so ``rb[k]`` is non-decreasing — consecutive
      chunks REVISIT the same output block, which therefore stays
      resident in VMEM and accumulates (the classic reduction-grid
      pattern), flushing once per (row block, f-tile);
    * empty cells contribute no chunks at all (the manual-DMA kernel
      still streams their stripes), and there are no semaphores or
      double-buffer slots to manage — the pipeline overlaps the loads.

    This is the PREFERRED form on a healthy backend. On this round's
    tunneled terminal every scalar->address construct (including the
    scalar-prefetch index maps used here) fails remote compilation
    (CLAUDE.md), so like the gen-1 kernel it ships interpret-validated;
    `cli/pallas_bench.py --flat` compares both the moment hardware
    allows.
    """
    R, W, C = tiled.row_block, tiled.stripe, tiled.chunk
    n_rb, n_st = tiled.n_row_blocks, tiled.n_stripes
    if not interpret and C % 1024 != 0:
        # Measured on the first healthy backend (round 2): a 1-D (C,)
        # edge block below 1024 = 8 sublanes x 128 lanes (the f32/int32
        # min tile) crashes the Mosaic compile with no diagnostic, so
        # fail loudly here instead. Interpret mode has no such floor.
        raise ValueError(
            f"spmm_pallas_flat compiled mode needs chunk % 1024 == 0 "
            f"(got {C}): 1-D edge blocks must cover the 8x128 min tile")

    x, Ft, n_ft, mm_dtype = _pad_for_kernel(tiled, x, feature_tile,
                                            precision)

    chunk_rb, chunk_st = _flat_schedule(tiled)
    n_chunks = len(chunk_rb)
    if n_chunks == 0:
        # a zero-edge graph has no chunks; a (n_ft, 0) grid with empty
        # scalar-prefetch arrays is rejected by pallas_call, and the
        # product is identically zero anyway (gen-1 kernel parity)
        return jnp.zeros((n_rb * R, x.shape[1]), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_ft, n_chunks),
        in_specs=[
            pl.BlockSpec((C,), lambda f, k, rb, st: (k,)),
            pl.BlockSpec((C,), lambda f, k, rb, st: (k,)),
            pl.BlockSpec((C,), lambda f, k, rb, st: (k,)),
            pl.BlockSpec((W, Ft), lambda f, k, rb, st: (st[k], f)),
        ],
        out_specs=pl.BlockSpec(
            (R, Ft), lambda f, k, rb, st: (rb[k], f),
            memory_space=pltpu.VMEM,
        ),
    )
    edge_flops = 2 * (W + R) * Ft * n_chunks * C * n_ft
    # x traffic: the pipeline skips re-fetching a block whose index map
    # is unchanged between consecutive grid steps, and chunks are
    # cell-major — so each NONEMPTY cell fetches its (W, Ft) stripe
    # block once per f-tile (empty cells fetch nothing at all); edge
    # blocks change every step and stream once per chunk per f-tile
    n_nonempty = int(np.count_nonzero(tiled.cell_nchunks))
    out = pl.pallas_call(
        partial(_spmm_flat_kernel, R=R, W=W, C=C, mm_dtype=mm_dtype),
        out_shape=jax.ShapeDtypeStruct((n_rb * R, x.shape[1]), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=edge_flops,
            bytes_accessed=(
                (n_chunks * C * 12 + n_nonempty * W * Ft * 4) * n_ft
                + n_rb * R * x.shape[1] * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(chunk_rb),
        jnp.asarray(chunk_st),
        jnp.asarray(tiled.rows),
        jnp.asarray(tiled.cols),
        jnp.asarray(tiled.vals),
        x,
    )
    # Row blocks with NO chunks (isolated-node ranges, padding blocks)
    # are never visited by the grid, so their output slots hold whatever
    # the buffer contained — zero them with a statically-known mask.
    visited = np.zeros(n_rb, bool)
    visited[np.unique(chunk_rb)] = True
    if not visited.all():
        mask = jnp.asarray(np.repeat(visited, R))
        out = jnp.where(mask[:, None], out, 0.0)
    return out


def _default_interpret() -> bool:
    """Interpreter mode off-TPU, and on TPU when SGC_TPU_PALLAS_INTERPRET=1
    (tunneled dev backends hang in Mosaic compilation — see CLAUDE.md)."""
    import os

    return (
        jax.default_backend() != "tpu"
        or os.environ.get("SGC_TPU_PALLAS_INTERPRET") == "1"
    )


_SCALAR_PREFETCH_COMPILES: bool | None = None


def scalar_prefetch_compiles() -> bool:
    """True iff the default backend COMPILES a scalar-prefetch-driven
    BlockSpec index_map — the Mosaic mechanism behind both
    :func:`spmm_pallas_flat` and ``spmm_blockdense_pallas``.

    Some backends reject data-dependent addressing outright (the probe
    fails fast with a compile error), so formulation auto-selection
    (``LocalityPlan.build(formulation="auto")``) runs this tiny probe —
    one 8-block permuted copy, ~0.4 s compile on a v5e — instead of
    assuming. The verdict is cached per process. Off-TPU, and when
    SGC_TPU_PALLAS_INTERPRET=1, returns False without probing
    (interpret-mode kernels run but are never worth auto-selecting).
    """
    global _SCALAR_PREFETCH_COMPILES
    if _default_interpret():
        return False
    if _SCALAR_PREFETCH_COMPILES is None:
        # disk cache keyed like ops.calibrate's rates: over a tunneled
        # backend the FIRST remote compile in a process costs ~30 s
        # (compile-helper warmup) regardless of jax's own persistent
        # cache, and this probe was paying it inside every fresh
        # process's first LocalityPlan.build (measured as split_s
        # 33.8 s vs 2.9 s on the second build in the same process).
        # SGC_TPU_REPROBE=1 forces a fresh probe (the backend healed
        # mid-round-2 once; a cached verdict must be refreshable).
        cache = _probe_cache_path()
        if cache and os.environ.get("SGC_TPU_REPROBE") != "1":
            try:
                import json
                import time

                with open(cache) as fh:
                    blob = json.load(fh)
                verdict = bool(blob["compiles"])
                # a cached FALSE expires (default 1 h): a transient
                # failure (wedged tunnel, OOM) is indistinguishable from
                # a genuine Mosaic rejection at probe time, and the
                # backend has healed mid-round before — a pinned False
                # would silently lock every future process onto the
                # slower path (round-4 advisor). TRUE never expires
                # (a backend losing a capability is the rare direction,
                # and the kernel itself would fail loudly).
                ttl = float(os.environ.get(
                    "SGC_TPU_PROBE_FALSE_TTL_S", "3600"))
                age = time.time() - float(blob.get("ts", 0.0))
                if verdict or age < ttl:
                    _SCALAR_PREFETCH_COMPILES = verdict
                    return _SCALAR_PREFETCH_COMPILES
            except (OSError, ValueError, KeyError):
                pass
        nb, b, f = 8, 8, 128
        x = jnp.arange(nb * b * f, dtype=jnp.float32).reshape(nb * b, f)
        sel = jnp.asarray(
            np.random.RandomState(0).permutation(nb), jnp.int32)

        def kernel(sel_ref, x_ref, o_ref):
            o_ref[...] = x_ref[...] * 2.0

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec((b, f), lambda i, s: (s[i], 0))],
            out_specs=pl.BlockSpec((b, f), lambda i, s: (i, 0)),
        )
        fn = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb * b, f), jnp.float32),
        )
        try:
            got = np.asarray(jax.jit(fn)(sel, x))
            want = (np.asarray(x).reshape(nb, b, f)[np.asarray(sel)]
                    * 2.0).reshape(nb * b, f)
            _SCALAR_PREFETCH_COMPILES = bool(np.allclose(got, want))
        except Exception:  # compile helper exits 1 / Mosaic rejects
            _SCALAR_PREFETCH_COMPILES = False
        if cache:
            try:
                import json
                import time

                os.makedirs(os.path.dirname(cache), exist_ok=True)
                tmp = cache + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump({"compiles": _SCALAR_PREFETCH_COMPILES,
                               "ts": time.time()}, fh)
                os.replace(tmp, cache)
            except OSError:
                pass
    return _SCALAR_PREFETCH_COMPILES


def _probe_cache_path() -> str | None:
    """Per-(backend, device-kind) cache file for the probe verdict —
    same keying as ops.calibrate._cache_path."""
    try:
        import jax

        root = os.environ.get(
            "SGC_TPU_CALIBRATE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "..", ".sgc_tpu_cache"),
        )
        dev = jax.devices()[0]
        kind = getattr(dev, "device_kind", "unknown").replace(" ", "_")
        return os.path.join(
            os.path.abspath(root),
            f"scalar-prefetch-{jax.default_backend()}-{kind}.json")
    except Exception:
        return None


def spmm_pallas(
    graph: SparseGraph,
    x: jnp.ndarray,
    row_block: int = DEFAULT_ROW_BLOCK,
    stripe: int = DEFAULT_STRIPE,
    chunk: int = DEFAULT_CHUNK,
    feature_tile: int = DEFAULT_FEATURE_TILE,
    interpret: bool | None = None,
    precision: str = "f32",
) -> jnp.ndarray:
    """Drop-in SpMM: tile on first use, run the kernel, slice padding off.

    interpret=None auto-selects interpret mode off-TPU so tests and CPU
    fallbacks run the same kernel logic through the Pallas interpreter.

    precision='f32' (default) keeps the one-hot matmuls in float32: the
    gather/scatter are then *exact selections with f32 accumulation*, so
    values match the segment-sum path to f32 rounding. 'bf16' doubles MXU
    rate at ~3 decimal digits of per-hop precision — the speed
    configuration for bandwidth-tolerant propagation.
    """
    if interpret is None:
        interpret = _default_interpret()
    tiled = _tile_cached(graph, row_block, stripe, chunk)
    out = spmm_pallas_tiled(
        tiled, x, feature_tile, interpret=interpret, precision=precision
    )
    return out[: graph.n_rows, : x.shape[1]]


# Host-side tiling is O(E log E); a K-hop loop must not re-tile per hop.
# Keyed on the edge-array buffer identity + tile params; bounded size.
from sgc_tpu.utils.buildcache import HostBuildCache

_TILE_CACHE = HostBuildCache(8)


def _tile_cached(graph: SparseGraph, row_block, stripe, chunk) -> TiledGraph:
    return _TILE_CACHE.get(
        (graph.rows, graph.cols, graph.vals),
        (graph.nnz, row_block, stripe, chunk),
        lambda: tile_graph(graph, row_block, stripe, chunk))


# ---------------------------------------------------------------------------
# SDDMM — sampled dense-dense matmul (edge values of A @ B^T)
# ---------------------------------------------------------------------------


def _sddmm_kernel(
    rows_ref, cols_ref,      # int32[C] (VMEM blocks of the chunk grid)
    a_ref, b_ref,            # f32[n, F] (ANY; compiler places small panels)
    out_ref,                 # f32[C] (VMEM block)
    *, C: int, F: int, mm_dtype,
):
    """Per chunk: gather a-rows and b-rows via DMA… the gather here is
    row-contiguous only for sorted rows, so a/b rows are fetched with a
    one-hot MXU gather from VMEM-resident feature panels is not possible
    (a/b span all nodes). Instead SDDMM keeps the XLA gather (fast path in
    ops/spmm.py:sddmm); this Pallas variant handles the case where a and b
    fit VMEM (graph transformer blocks), doing gather+dot fused."""
    rows = rows_ref[:]
    cols = cols_ref[:]
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (C, a_ref.shape[0]), 1)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (C, b_ref.shape[0]), 1)
    ga = (rows[:, None] == iota_a).astype(mm_dtype)
    gb = (cols[:, None] == iota_b).astype(mm_dtype)
    left = jnp.dot(ga, a_ref[:].astype(mm_dtype),
                   preferred_element_type=jnp.float32)
    right = jnp.dot(gb, b_ref[:].astype(mm_dtype),
                    preferred_element_type=jnp.float32)
    out_ref[:] = jnp.sum(left * right, axis=-1)


def sddmm_pallas(
    graph: SparseGraph,
    a: jnp.ndarray,
    b: jnp.ndarray,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool | None = None,
    precision: str = "f32",
) -> jnp.ndarray:
    """Edge values of a @ b.T at the graph's sparsity pattern (small-n
    fused path; ops/spmm.py:sddmm is the general XLA path). Padding-edge
    slots return exactly 0 (SparseGraph invariant).

    precision='f32' (default, matching :func:`spmm_pallas`) keeps the
    one-hot selections and the a/b operands in float32 — results agree
    with the XLA sddmm to f32 rounding. 'bf16' doubles MXU rate but
    rounds a and b to bfloat16 first (~3 decimal digits)."""
    if interpret is None:
        interpret = _default_interpret()
    mm_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[precision]
    e_pad = graph.rows.shape[0]
    # the chunk grid must tile e_pad exactly (floor division would leave
    # the output tail uninitialized); snap to the largest divisor <= chunk
    import math

    C = math.gcd(min(chunk, e_pad), e_pad)
    n_chunks = e_pad // C

    out = pl.pallas_call(
        partial(_sddmm_kernel, C=C, F=a.shape[1], mm_dtype=mm_dtype),
        out_shape=jax.ShapeDtypeStruct((e_pad,), jnp.float32),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((C,), lambda k: (k,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda k: (k,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((C,), lambda k: (k,), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(graph.rows, graph.cols, a, b)
    # positional padding mask (matches ops/spmm.py:sddmm): zero-weight
    # TRUE edges keep their computed value
    pad_mask = jnp.arange(e_pad) < graph.nnz
    return jnp.where(pad_mask, out, 0.0)
