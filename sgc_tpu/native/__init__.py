"""ctypes bindings for the native host-side graph preprocessing library.

Exposes the C ABI of graphprep.cpp with numpy-fallback twins so the
framework runs (slower) without the compiled library. ``available()``
reports whether the fast path is active; the library auto-builds on first
import when a compiler is present (cheap: single TU, ~2 s) and silently
falls back otherwise.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_LIB_PATH = _HERE / "libgraphprep.so"
_lib = None
_load_failed = False


def _stale() -> bool:
    """Rebuild when graphprep.cpp is newer than the compiled library —
    a stale binary silently running old code is worse than a 2s rebuild."""
    src = _HERE / "graphprep.cpp"
    try:
        return src.stat().st_mtime > _LIB_PATH.stat().st_mtime
    except OSError:
        return False


def _try_load():
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed or os.environ.get("SGC_TPU_NO_NATIVE") == "1":
        return None
    if not _LIB_PATH.exists() or _stale():
        try:
            from sgc_tpu.native.build import build

            build(verbose=False)
        except Exception:
            pass  # fall through: a pre-built (possibly stale) lib or None
    if not _LIB_PATH.exists():
        _load_failed = True   # no compiler: don't respawn g++ per call
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _load_failed = True
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64

    lib.sort_edges_by_row_col.argtypes = [i64p, i64p, f32p, i64, i64, i64]
    lib.sort_edges_by_row_col.restype = ctypes.c_int
    lib.build_row_ptr.argtypes = [i64p, i64, i64, i64p]
    lib.build_row_ptr.restype = ctypes.c_int
    lib.coalesce_sorted.argtypes = [i64p, i64p, f32p, i64]
    lib.coalesce_sorted.restype = i64
    lib.weighted_degrees.argtypes = [i64p, f32p, i64, i64, f64p]
    lib.weighted_degrees.restype = ctypes.c_int
    lib.scale_sym_norm.argtypes = [i64p, i64p, f32p, i64, f64p]
    lib.scale_sym_norm.restype = ctypes.c_int
    lib.partition_count.argtypes = [i64p, i64, i64, i64, i64p]
    lib.partition_count.restype = ctypes.c_int
    lib.lpa_labels.argtypes = [i64p, i64p, i64, ctypes.c_int,
                               ctypes.c_double, i64p]
    lib.lpa_labels.restype = ctypes.c_int
    lib.tile_fill.argtypes = [i64p, i64p, f32p, i64, i64p, i64p, i64p,
                              i64, i64, i64, i64, i64, i32p, i32p, f32p]
    lib.tile_fill.restype = ctypes.c_int
    lib.partition_fill.argtypes = [
        i64p, i64p, f32p, i64, i64, i64, i64, i32p, i32p, f32p,
    ]
    lib.partition_fill.restype = ctypes.c_int
    # guarded: a pre-built stale .so (compiler vanished mid-session) may
    # predate this entry point — fall back to the numpy twin then.
    if hasattr(lib, "cell_scatter_bf16"):
        u16p = ctypes.POINTER(ctypes.c_uint16)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.cell_scatter_bf16.argtypes = [
            i64p, i64p, f32p, i64, i64p, i64, i64, i64, u16p, u8p,
        ]
        lib.cell_scatter_bf16.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _try_load() is not None


def has_cell_scatter() -> bool:
    """True when the fused bf16 cell scatter entry point is loadable
    (a stale pre-built .so may predate it)."""
    lib = _try_load()
    return lib is not None and hasattr(lib, "cell_scatter_bf16")


def _p(a, t):
    return a.ctypes.data_as(t)


_I64P = ctypes.POINTER(ctypes.c_int64)
_I32P = ctypes.POINTER(ctypes.c_int32)
_F32P = ctypes.POINTER(ctypes.c_float)
_F64P = ctypes.POINTER(ctypes.c_double)


def sort_edges(rows, cols, vals, n_rows: int, n_cols: int):
    """Sort COO edges by (row, col). Returns NEW (rows, cols, vals)
    int64/f32 arrays — inputs are never mutated (the native kernel sorts
    in place, so it gets private copies)."""
    rows = np.array(rows, dtype=np.int64)
    cols = np.array(cols, dtype=np.int64)
    vals = np.array(vals, dtype=np.float32)
    lib = _try_load()
    if lib is not None:
        lib.sort_edges_by_row_col(
            _p(rows, _I64P), _p(cols, _I64P), _p(vals, _F32P),
            len(rows), n_rows, n_cols,
        )
        return rows, cols, vals
    order = np.lexsort((cols, rows))
    return rows[order], cols[order], vals[order]


def sort_edges_inplace(rows, cols, vals, n_rows: int, n_cols: int):
    """Sort COO edges by (row, col) IN PLACE — caller-owned private
    int64/int64/f32 contiguous arrays (no copies; the zero-copy variant
    of :func:`sort_edges` for hot host paths that already staged their
    own buffers, e.g. parallel/blockdense.build_sharded_blockdense)."""
    assert rows.dtype == np.int64 and rows.flags.c_contiguous
    assert cols.dtype == np.int64 and cols.flags.c_contiguous
    assert vals.dtype == np.float32 and vals.flags.c_contiguous
    lib = _try_load()
    if lib is not None:
        lib.sort_edges_by_row_col(
            _p(rows, _I64P), _p(cols, _I64P), _p(vals, _F32P),
            len(rows), n_rows, n_cols,
        )
        return
    order = np.lexsort((cols, rows))
    rows[:] = rows[order]
    cols[:] = cols[order]
    vals[:] = vals[order]


def row_ptr_from_sorted(rows, n_rows: int):
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    lib = _try_load()
    out = np.zeros(n_rows + 1, dtype=np.int64)
    if lib is not None:
        lib.build_row_ptr(_p(rows, _I64P), len(rows), n_rows, _p(out, _I64P))
        return out
    np.add.at(out, rows + 1, 1)
    return np.cumsum(out)


def coalesce(rows, cols, vals):
    """Sum duplicates in a (row, col)-sorted edge list. Returns new
    arrays; inputs are never mutated."""
    rows = np.array(rows, dtype=np.int64)
    cols = np.array(cols, dtype=np.int64)
    vals = np.array(vals, dtype=np.float32)
    lib = _try_load()
    if lib is not None:
        n = lib.coalesce_sorted(
            _p(rows, _I64P), _p(cols, _I64P), _p(vals, _F32P), len(rows)
        )
        return rows[:n].copy(), cols[:n].copy(), vals[:n].copy()
    if len(rows) == 0:
        return rows, cols, vals
    key_change = np.empty(len(rows), dtype=bool)
    key_change[0] = True
    key_change[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
    group = np.cumsum(key_change) - 1
    out_vals = np.zeros(group[-1] + 1, dtype=np.float32)
    np.add.at(out_vals, group, vals)
    return rows[key_change], cols[key_change], out_vals


def sym_normalize_edges(rows, cols, vals, n_rows: int):
    """d^-1/2 A d^-1/2 scaling given weighted row degrees of A.

    Returns new arrays; inputs are never mutated."""
    rows = np.array(rows, dtype=np.int64)
    cols = np.array(cols, dtype=np.int64)
    vals = np.array(vals, dtype=np.float32)
    # the scaling indexes the degree vector with BOTH endpoints — a col
    # id >= n_rows would read out of bounds in the native kernel (UB)
    # where the numpy twin raises; validate up front so the two paths
    # stay behavioral twins
    if len(cols) and (cols.max() >= n_rows or cols.min() < 0):
        raise ValueError(
            f"sym_normalize_edges requires a square operator: col ids "
            f"must be in [0, {n_rows})"
        )
    lib = _try_load()
    deg = np.zeros(n_rows, dtype=np.float64)
    if lib is not None:
        lib.weighted_degrees(
            _p(rows, _I64P), _p(vals, _F32P), len(rows), n_rows, _p(deg, _F64P)
        )
    else:
        np.add.at(deg, rows, vals.astype(np.float64))
    with np.errstate(divide="ignore"):
        dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    if lib is not None:
        lib.scale_sym_norm(
            _p(rows, _I64P), _p(cols, _I64P), _p(vals, _F32P), len(rows),
            _p(dinv, _F64P),
        )
    else:
        vals = (vals * dinv[rows] * dinv[cols]).astype(np.float32)
    return rows, cols, vals


def partition_edges(rows, cols, vals, n_parts: int, rows_per_part: int,
                    e_max: int, n_cols: int):
    """Scatter row-sorted edges into the padded [n_parts, e_max] layout."""
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    p_rows = np.full((n_parts, e_max), rows_per_part - 1, dtype=np.int32)
    p_cols = np.full((n_parts, e_max), max(n_cols - 1, 0), dtype=np.int32)
    p_vals = np.zeros((n_parts, e_max), dtype=np.float32)
    lib = _try_load()
    if lib is not None:
        lib.partition_fill(
            _p(rows, _I64P), _p(cols, _I64P), _p(vals, _F32P), len(rows),
            n_parts, rows_per_part, e_max,
            _p(p_rows, _I32P), _p(p_cols, _I32P), _p(p_vals, _F32P),
        )
        return p_rows, p_cols, p_vals
    part = np.minimum(rows // rows_per_part, n_parts - 1)
    for p in range(n_parts):
        sel = part == p
        k = int(sel.sum())
        p_rows[p, :k] = rows[sel] - p * rows_per_part
        p_cols[p, :k] = cols[sel]
        p_vals[p, :k] = vals[sel]
    return p_rows, p_cols, p_vals


def lpa_labels(row_ptr, cols, max_iter: int = 20,
               min_moved_frac: float = 1e-3):
    """Asynchronous label-propagation community labels over a CSR graph.

    Deterministic: nodes sweep in ascending id, each adopts its
    neighbors' most frequent label, ties break to the smallest label.
    Returns ``(labels int64[n], sweeps)``. The numpy twin is an exact
    behavioral copy (same sweep order, same tie-break) but a per-node
    Python loop — fine for tests and small graphs; the native path is
    the at-scale one (~30x faster than even the vectorized synchronous
    formulation in graph/reorder.py at 23M edges).
    """
    row_ptr = np.ascontiguousarray(row_ptr, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    n = len(row_ptr) - 1
    labels = np.arange(n, dtype=np.int64)
    lib = _try_load()
    if lib is not None:
        sweeps = lib.lpa_labels(
            _p(row_ptr, _I64P), _p(cols, _I64P), n,
            int(max_iter), float(min_moved_frac), _p(labels, _I64P),
        )
        return labels, int(sweeps)
    quota = int(min_moved_frac * n)
    sweeps = 0
    while sweeps < max_iter:
        moved = 0
        for u in range(n):
            nb = cols[row_ptr[u]:row_ptr[u + 1]]
            if len(nb) == 0:
                continue
            uniq, cnt = np.unique(labels[nb], return_counts=True)
            best = int(uniq[np.argmax(cnt)])  # uniq sorted: tie -> smallest
            if best != labels[u]:
                labels[u] = best
                moved += 1
        sweeps += 1
        if moved <= quota:
            break
    return labels, sweeps


def tile_fill(rows, cols, vals, cell, cell_start, counts, chunk: int,
              n_st: int, row_block: int, stripe: int, total_chunks: int):
    """Scatter (row,col)-sorted edges into the padded per-cell chunk
    layout (counting sort by ``cell``; stable, so within-cell order is
    the input's). Returns ``(r_out int32, c_out int32, v_out f32)`` of
    length ``total_chunks * chunk``; padding slots carry the cell's base
    (row, col) and val 0. Returns None when the library isn't built —
    callers fall back to the numpy lexsort+scatter twin
    (ops/spmm_pallas.py tile_graph)."""
    lib = _try_load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    cell = np.ascontiguousarray(cell, dtype=np.int64)
    cell_start = np.ascontiguousarray(cell_start, dtype=np.int64)
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    n_out = int(total_chunks) * int(chunk)
    r_out = np.zeros(n_out, np.int32)
    c_out = np.zeros(n_out, np.int32)
    v_out = np.zeros(n_out, np.float32)
    lib.tile_fill(
        _p(rows, _I64P), _p(cols, _I64P), _p(vals, _F32P), len(rows),
        _p(cell, _I64P), _p(cell_start, _I64P), _p(counts, _I64P),
        len(counts), int(chunk), int(n_st), int(row_block), int(stripe),
        _p(r_out, _I32P), _p(c_out, _I32P), _p(v_out, _F32P),
    )
    return r_out, c_out, v_out


def cell_scatter(rows, cols, vals, compact, n_st: int, row_block: int,
                 stripe: int, cells_flat, mask):
    """Fused dense-cell scatter for split_block_dense: writes
    bf16(value) into ``cells_flat`` (pre-zeroed uint16 view of the
    padded bf16 cell buffer) at each edge's cell-local position and sets
    ``mask[i]=1`` for dense edges. Duplicate (row,col) runs — adjacent,
    the inputs are (row,col)-sorted — are f32-summed left-to-right
    before the single bf16 round, bitwise-matching the numpy
    astype+reduceat twin in ops/spmm_blockdense.py. Returns False when
    the library (or this entry point) is unavailable — the caller runs
    the numpy twin."""
    lib = _try_load()
    if lib is None or not hasattr(lib, "cell_scatter_bf16"):
        return False
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    compact = np.ascontiguousarray(compact, dtype=np.int64)
    assert cells_flat.dtype == np.uint16 and cells_flat.flags.c_contiguous
    assert mask.dtype == np.uint8 and mask.flags.c_contiguous
    u16p = ctypes.POINTER(ctypes.c_uint16)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.cell_scatter_bf16(
        _p(rows, _I64P), _p(cols, _I64P), _p(vals, _F32P), len(rows),
        _p(compact, _I64P), int(n_st), int(row_block), int(stripe),
        _p(cells_flat, u16p), _p(mask, u8p),
    )
    return True


def edge_counts(rows, n_parts: int, rows_per_part: int):
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    lib = _try_load()
    if lib is not None:
        out = np.zeros(n_parts, dtype=np.int64)
        lib.partition_count(
            _p(rows, _I64P), len(rows), n_parts, rows_per_part, _p(out, _I64P)
        )
        return out
    part = np.minimum(rows // rows_per_part, n_parts - 1)
    return np.bincount(part, minlength=n_parts).astype(np.int64)
