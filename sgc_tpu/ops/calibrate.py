"""Measured admission-model rates (replaces assumed constants).

VERDICT round-2 #4: the block-dense admission crossover
(:func:`sgc_tpu.ops.spmm_blockdense.min_edges_for`) was driven by two
constants measured once on one machine/graph (`BLOCKDENSE_EFF_FLOPS`,
`XLA_EDGES_PER_S`). This module measures both rates with a ~1 s
micro-probe on the CURRENT backend and caches the result on disk (keyed
by backend + device kind), so the admission model self-calibrates on a
new machine instead of assuming.

The probe is opt-in (`LocalityPlan.build(calibrate=True)`, bench.py) —
default plan builds keep the committed constants so CPU test runs stay
deterministic and probe-free. `SGC_TPU_NO_CALIBRATE=1` forces constants
everywhere.

Replaces: nothing in the reference (its torch.spmm has no admission
model); the calibration pattern follows
`ops.spmm_pallas.scalar_prefetch_compiles` (probe once, cache).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

_RATES: dict | None = None

# Two sizes per probe: the RATE comes from the (work2 - work1) /
# (time2 - time1) difference, cancelling the fixed per-dispatch latency
# (23 ms over a tunneled backend — a single small probe would be
# dispatch-dominated and underestimate the rate ~30x, which round-3
# measured the hard way: admission rejected every cell).
PROBE_CELLS = (64, 1024)  # bf16 cells streamed by the matmul probe
PROBE_EDGES = (200_000, 1_600_000)  # segment-path probe edges
PROBE_F = 256             # feature width for both probes


def _cache_path() -> str:
    import jax

    root = os.environ.get(
        "SGC_TPU_CALIBRATE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".sgc_tpu_cache"),
    )
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown").replace(" ", "_")
    return os.path.join(root, f"rates-{jax.default_backend()}-{kind}.json")


def _timed_best(fn, *args, reps: int = 3) -> float:
    """Min of ``reps`` sync-closed timings (fn already warmed)."""
    from sgc_tpu.utils.profiling import sync

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _probe_blockdense_eff_flops(row_block: int = 512,
                                stripe: int = 512) -> float:
    """Effective flop rate of the streamed cell-matmul path, INCLUDING
    gather/scatter HBM traffic around the matmuls (the number
    min_edges_for divides by). Differenced over two cell counts to
    cancel the per-dispatch latency."""
    import jax
    import jax.numpy as jnp

    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.ops.spmm_blockdense import (
        blockdense_device_args,
        spmm_block_dense,
        split_block_dense,
    )
    from sgc_tpu.utils.profiling import sync

    rng = np.random.default_rng(0)
    f_pad = -(-PROBE_F // 128) * 128
    times, flops = [], []
    for n_cells in PROBE_CELLS:
        n_rb = 8
        n = max(n_rb, -(-n_cells // n_rb)) * row_block
        n_grid = n // row_block
        ci = rng.integers(0, n_grid, n_cells)
        cj = rng.integers(0, n_grid, n_cells)
        rows = (ci[:, None] * row_block
                + rng.integers(0, row_block, (n_cells, 64))).ravel()
        cols = (cj[:, None] * stripe
                + rng.integers(0, stripe, (n_cells, 64))).ravel()
        vals = rng.random(rows.size).astype(np.float32)
        g = SparseGraph.from_coo(rows, cols, vals, n, n, device=False)
        split = split_block_dense(g, PROBE_F, row_block, stripe,
                                  min_edges=0)
        x = jnp.asarray(rng.random((n, PROBE_F)).astype(np.float32))
        args = blockdense_device_args(split)
        fn = jax.jit(lambda xx, a, s=split: spmm_block_dense(s, xx, args=a))
        sync(fn(x, args))  # compile + place
        times.append(_timed_best(fn, x, args))
        flops.append(2.0 * split.n_cells * row_block * stripe * f_pad)
    dt = times[1] - times[0]
    if dt <= 0:
        raise RuntimeError("probe sizes not separable (dispatch noise)")
    return (flops[1] - flops[0]) / dt


def _probe_xla_edges_per_s() -> float:
    """Gather/segment-sum path edge rate (the wall the admission model
    compares against). Differenced over two edge counts to cancel the
    per-dispatch latency."""
    import jax
    import jax.numpy as jnp

    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.ops.spmm import spmm_segment
    from sgc_tpu.utils.profiling import sync

    rng = np.random.default_rng(1)
    # Reddit-like gather-table size: the segment rate is strongly
    # table-size dependent (measured 61M edges/s at 65K x 256 but
    # 34-38M at 233K x 602 — cache locality), and the admission model
    # must reflect the operating point, not an L2-friendly toy.
    n = 229_376
    x = jnp.asarray(rng.random((n, 2 * PROBE_F)).astype(np.float32))
    times, edges = [], []
    for n_edges in PROBE_EDGES:
        rows = np.sort(rng.integers(0, n, n_edges))
        cols = rng.integers(0, n, n_edges)
        vals = rng.random(n_edges).astype(np.float32)
        g = SparseGraph.from_coo(rows, cols, vals, n, n, device=False)
        gd = jax.device_put(g)
        fn = jax.jit(lambda gg, xx: spmm_segment(gg, xx))
        sync(fn(gd, x))
        times.append(_timed_best(fn, gd, x))
        edges.append(g.nnz)
    dt = times[1] - times[0]
    if dt <= 0:
        raise RuntimeError("probe sizes not separable (dispatch noise)")
    return (edges[1] - edges[0]) / dt


def measured_rates(force: bool = False) -> dict:
    """{"blockdense_eff_flops", "xla_edges_per_s", "probed": bool}.

    Probes the current backend (cached in-process and on disk); falls
    back to the committed constants when probing is disabled or fails.
    """
    from sgc_tpu.ops.spmm_blockdense import BLOCKDENSE_EFF_FLOPS
    from sgc_tpu.ops.spmm_hybrid import XLA_EDGES_PER_S

    global _RATES
    fallback = {
        "blockdense_eff_flops": BLOCKDENSE_EFF_FLOPS,
        "xla_edges_per_s": XLA_EDGES_PER_S,
        "probed": False,
    }
    if os.environ.get("SGC_TPU_NO_CALIBRATE"):
        return fallback
    if _RATES is not None and not force:
        return _RATES
    path = _cache_path()
    if not force and os.path.exists(path):
        try:
            with open(path) as f:
                _RATES = json.load(f)
            return _RATES
        except Exception:
            pass
    import jax

    if jax.default_backend() == "cpu" and not force:
        # CPU runs (tests, virtual meshes) never PROBE implicitly:
        # probing there measures the wrong machine AND makes split
        # geometry vary with host load (splits must be deterministic
        # under test). An existing disk cache (from an explicit
        # force-probe) is still honored above; force=True probes.
        return fallback
    try:
        rates = {
            "blockdense_eff_flops": _probe_blockdense_eff_flops(),
            "xla_edges_per_s": _probe_xla_edges_per_s(),
            "probed": True,
        }
    except Exception:
        _RATES = fallback
        return _RATES
    _RATES = rates
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(rates, f)
    except OSError:
        pass
    return _RATES
