"""Line-level timing of split_block_dense at full Reddit scale.

exp_prep_profile.py showed 93s tottime INSIDE split_block_dense (not in
sub-calls) — this script replays each section with perf_counter around
it to find the hot lines, so the fix targets the right statement.

Findings (2026-08-19, full scale): the pad `np.concatenate` on the
ml_dtypes bfloat16 dtype was 26.6s (element-wise cast loop, not
memcpy) — fixed by pre-sizing the padded buffer; the remaining
gather/flat-idx/scatter/dup-key chain (~8s) moved into the native
`cell_scatter_bf16`. This script still replays the NUMPY stages (now
the fallback twin), which is exactly what you want when re-diagnosing:
the twin's per-line costs are the thing the native pass replaces.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from sgc_tpu.data.synthetic import synthetic_reddit_clustered  # noqa: E402
from sgc_tpu.graph.reorder import reorder_graph_arrays  # noqa: E402
from sgc_tpu.ops.spmm_blockdense import min_edges_for, _scan_chunk  # noqa: E402
from sgc_tpu.graph.sparse import SparseGraph  # noqa: E402


def tick(label, t0):
    t1 = time.perf_counter()
    print(f"  {label}: {t1 - t0:.2f}s", flush=True)
    return time.perf_counter()


def main():
    scale = float(os.environ.get("SGC_BENCH_SCALE", "1.0"))
    graph, features, labels, idx_train = synthetic_reddit_clustered(
        scale, shuffle=True)
    print("synthetic built", flush=True)
    graph_p, features_p, labels_p, idx_p, order = reorder_graph_arrays(
        graph, "lpa", features, labels, idx_train)
    print("reordered", flush=True)

    row_block = stripe = 512
    min_edges = min_edges_for(row_block, stripe, features.shape[1])

    t0 = time.perf_counter()
    rows = np.asarray(graph_p.rows)[: graph_p.nnz].astype(np.int64)
    cols = np.asarray(graph_p.cols)[: graph_p.nnz].astype(np.int64)
    vals = np.asarray(graph_p.vals)[: graph_p.nnz].astype(np.float32)
    t0 = tick("astype copies", t0)

    n_st = -(-graph_p.n_cols // stripe)
    cell = (rows // row_block) * n_st + (cols // stripe)
    t0 = tick("cell ids", t0)
    counts = np.bincount(
        cell, minlength=(-(-graph_p.n_rows // row_block)) * n_st)
    t0 = tick("bincount", t0)

    qualifying = np.flatnonzero(counts > min_edges)
    compact = np.full(len(counts), -1, np.int64)
    compact[qualifying] = np.arange(len(qualifying))
    k = compact[cell]
    dense_mask = k >= 0
    n_dense = int(dense_mask.sum())
    n_cells = len(qualifying)
    t0 = tick(f"masks (n_cells={n_cells} n_dense={n_dense})", t0)

    kd = k[dense_mask]
    rd = rows[dense_mask] % row_block
    cd = cols[dense_mask] % stripe
    vd = vals[dense_mask]
    t0 = tick("boolean gathers", t0)

    flat_idx = kd * (row_block * stripe) + rd * stripe + cd
    t0 = tick("flat idx", t0)
    cells = np.zeros(n_cells * row_block * stripe, np.dtype("bfloat16"))
    t0 = tick(f"zeros alloc ({cells.nbytes/2**30:.2f} GB)", t0)
    vb = vd.astype(np.dtype("bfloat16"))
    t0 = tick("vals->bf16", t0)
    cells[flat_idx] = vb
    t0 = tick("scatter", t0)

    key = (rows[dense_mask] << 32) | cols[dense_mask]
    t0 = tick("dup key", t0)
    has_dup = len(key) > 1 and (key[1:] == key[:-1]).any()
    t0 = tick(f"dup any ({has_dup})", t0)

    cells = cells.reshape(n_cells, row_block, stripe)
    chunk = _scan_chunk(n_cells)
    pad = -n_cells % chunk
    if pad:
        cells = np.concatenate(
            [cells, np.zeros((pad, row_block, stripe), cells.dtype)])
    t0 = tick(f"pad concat (pad={pad})", t0)

    n_sparse = len(rows) - n_dense
    if n_sparse:
        rest = SparseGraph.from_coo(
            rows[~dense_mask], cols[~dense_mask], vals[~dense_mask],
            n_rows=graph_p.n_rows, n_cols=graph_p.n_cols,
            device=False, presorted=True)
        t0 = tick(f"rest from_coo ({n_sparse} edges)", t0)


if __name__ == "__main__":
    main()
