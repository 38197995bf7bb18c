"""Pallas SpMM kernel microbench: compiled-vs-XLA the moment hardware allows.

VERDICT round-1 #9: the flagship kernel needs a one-command comparison
against the XLA segment path on any TPU. Compiled execution is attempted
by default on TPU backends (set SGC_TPU_PALLAS_INTERPRET=1 to force the
interpreter on backends whose Mosaic compile hangs — see CLAUDE.md);
failures are reported, not fatal, so this same command documents WHY the
compiled path is unavailable on a given backend.

    python -m sgc_tpu.cli.pallas_bench --scale 0.1 --precision bf16

Also prints the kernel's cost model (FLOPs / bytes from the tiling) so a
measured run can be checked against it; the interpret-mode audit test
(tests/test_spmm_pallas.py) asserts this model matches the kernel's
declared CostEstimate.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def pallas_cost_model(tiled, feature_dim: int, feature_tile: int = 256,
                      flat: bool = False) -> dict:
    """FLOPs/bytes the requested kernel generation performs, from the
    tiling alone.

    Per edge chunk per feature tile: gather one-hot (C, W) @ (W, Ft) and
    scatter one-hot (R, C) @ (C, Ft) — 2*C*(W+R)*Ft flops (identical for
    both generations). HBM differs by schedule: the manual-DMA kernel
    streams EVERY x stripe once per row block, while the flat kernel
    fetches one stripe block per chunk (empty cells cost nothing).
    Mirrors the Ft/f_pad selection of ``_pad_for_kernel``; the audit
    test pins model vs declared CostEstimate for both generations.
    """
    R, W, C = tiled.row_block, tiled.stripe, tiled.chunk
    n_rb, n_st = tiled.n_row_blocks, tiled.n_stripes
    ft = min(feature_tile, max(feature_dim, 128))
    ft = -(-ft // 128) * 128             # 128-lane snap (= _pad_for_kernel)
    f_pad = feature_dim + ((-feature_dim) % ft)
    n_ft = f_pad // ft
    e_padded = int(tiled.rows.shape[0])
    n_chunks = e_padded // C
    flops = 2 * C * (W + R) * ft * n_chunks * n_ft
    if flat:
        n_nonempty = int(np.count_nonzero(tiled.cell_nchunks))
        x_bytes = n_nonempty * W * ft * 4 * n_ft  # stripe / nonempty cell
    else:
        x_bytes = n_st * W * f_pad * 4 * n_rb     # all stripes / row block
    bytes_accessed = (
        x_bytes
        + e_padded * 12 * n_ft           # rows+cols int32 + vals f32
        + n_rb * R * f_pad * 4           # output
    )
    return {
        "kernel": "flat" if flat else "manual-dma",
        "edges_padded": e_padded,
        "padding_factor": e_padded / max(1, int(
            np.count_nonzero(tiled.vals))),
        "flops": int(flops),
        "bytes_accessed": int(bytes_accessed),
        "n_row_blocks": n_rb,
        "n_stripes": n_st,
        "n_feature_tiles": n_ft,
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scale", type=float, default=0.1,
                   help="fraction of Reddit dimensions for the synthetic graph")
    p.add_argument("--row_block", type=int, default=2048)
    p.add_argument("--stripe", type=int, default=2048)
    p.add_argument("--chunk", type=int, default=1024)
    p.add_argument("--feature_tile", type=int, default=256)
    p.add_argument("--precision", default="f32", choices=("f32", "bf16"))
    p.add_argument("--interpret", action="store_true",
                   help="force interpreter mode even on TPU")
    p.add_argument("--flat", action="store_true",
                   help="generation-2 flat-schedule kernel (scalar-prefetch "
                   "index maps + output revisiting) instead of manual-DMA")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--json", action="store_true")
    p.add_argument("--blockdense", action="store_true",
                   help="also time the materialized block-dense "
                        "formulation (ops/spmm_blockdense.py) on a "
                        "CLUSTERED synthetic — the regime it targets")
    p.add_argument("--clustered", action="store_true",
                   help="use the community-clustered synthetic for all "
                        "paths (default: uniform)")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sgc_tpu.data.synthetic import synthetic_reddit
    from sgc_tpu.ops.spmm import spmm_segment
    from sgc_tpu.ops.spmm_pallas import (
        _default_interpret,
        spmm_pallas_flat,
        spmm_pallas_tiled,
        tile_graph,
    )
    from sgc_tpu.utils.profiling import sync

    if a.clustered or a.blockdense:
        from sgc_tpu.data.synthetic import synthetic_reddit_clustered

        graph, features, _, _ = synthetic_reddit_clustered(a.scale)
    else:
        graph, features, _, _ = synthetic_reddit(a.scale)
    x = jnp.asarray(features)
    n, f = features.shape

    out = {"backend": jax.default_backend(), "nodes": n,
           "edges": graph.nnz, "features": f,
           "topology": "clustered" if (a.clustered or a.blockdense)
           else "uniform"}

    def timeit(fn, *args):
        r = fn(*args)
        sync(r)
        ts = []
        for _ in range(a.repeats):
            t0 = time.perf_counter()
            r = fn(*args)
            sync(r)
            ts.append(time.perf_counter() - t0)
        return min(ts), r

    seg = jax.jit(spmm_segment)
    t_seg, ref = timeit(seg, graph, x)
    out["xla_segment_s"] = round(t_seg, 4)
    out["xla_edges_per_s"] = int(graph.nnz / t_seg)

    tiled = tile_graph(graph, a.row_block, a.stripe, a.chunk)
    out["cost_model"] = pallas_cost_model(
        tiled, f, feature_tile=a.feature_tile, flat=a.flat)

    interpret = a.interpret or _default_interpret()
    out["pallas_mode"] = "interpret" if interpret else "compiled"
    out["pallas_kernel"] = "flat" if a.flat else "manual-dma"
    kernel_fn = spmm_pallas_flat if a.flat else spmm_pallas_tiled
    fn = jax.jit(lambda xx: kernel_fn(
        tiled, xx, a.feature_tile, interpret=interpret,
        precision=a.precision))
    try:
        if interpret:
            # interpreter at full repeats is pointless; one correctness run
            r = fn(x)
            sync(r)
            t_pal = float("nan")
        else:
            t_pal, r = timeit(fn, x)
            out["pallas_s"] = round(t_pal, 4)
            out["pallas_edges_per_s"] = int(graph.nnz / t_pal)
            out["pallas_vs_xla"] = round(t_seg / t_pal, 3)
        err = float(np.abs(np.asarray(r)[:n, :f] - np.asarray(ref)).max()
                    / (np.abs(np.asarray(ref)).max() + 1e-9))
        out["rel_err_vs_xla"] = err
    except Exception as e:
        out["pallas_error"] = str(e)[:500]

    if a.blockdense:
        from sgc_tpu.ops.spmm_blockdense import (
            blockdense_device_args, split_block_dense, spmm_block_dense)

        split = split_block_dense(graph, f)
        out["blockdense_cells"] = split.n_cells
        out["blockdense_dense_edges"] = split.dense_edges
        out["blockdense_cell_gb"] = round(split.cell_bytes / 1e9, 3)
        try:
            args = blockdense_device_args(split)
            bd = jax.jit(lambda xx, aa: spmm_block_dense(
                split, xx, args=aa))
            t_bd, r = timeit(bd, x, args)
            out["blockdense_s"] = round(t_bd, 4)
            out["blockdense_edges_per_s"] = int(graph.nnz / t_bd)
            out["blockdense_vs_xla"] = round(t_seg / t_bd, 3)
            err = float(
                np.abs(np.asarray(r) - np.asarray(ref)).max()
                / (np.abs(np.asarray(ref)).max() + 1e-9))
            out["blockdense_rel_err_vs_xla"] = err
        except Exception as e:
            out["blockdense_error"] = str(e)[:500]
        try:
            from sgc_tpu.ops.spmm_blockdense import spmm_blockdense_pallas

            bdk = jax.jit(lambda xx, aa: spmm_blockdense_pallas(
                split, xx, args=aa, interpret=interpret))
            if interpret:
                r = bdk(x, args)
                sync(r)
            else:
                t_bdk, r = timeit(bdk, x, args)
                out["blockdense_pallas_s"] = round(t_bdk, 4)
                out["blockdense_pallas_vs_xla"] = round(t_seg / t_bdk, 3)
            err = float(
                np.abs(np.asarray(r) - np.asarray(ref)).max()
                / (np.abs(np.asarray(ref)).max() + 1e-9))
            out["blockdense_pallas_rel_err"] = err
        except Exception as e:
            out["blockdense_pallas_error"] = str(e)[:500]

    if a.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
