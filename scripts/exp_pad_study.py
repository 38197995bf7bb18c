"""Host-side padding study for the flat Pallas SpMM kernel tiling.

The compiled flat kernel's cost is ~ 2*(W+R)*F_total * (padded edges), so
the operating point is set by the chunk-padding factor of the (row_block,
stripe) cell grid — a pure host-side property of the edge distribution.
This script evaluates pad factors and the resulting per-edge FLOP proxy
for a grid of tile sizes crossed with node orderings (identity, degree,
RCM), on the full-scale synthetic Reddit graph, WITHOUT touching a TPU.

Measured context (scale 0.25, real chip): the kernel sustains ~72% MXU
utilization, so `proxy = pad*(W+R)` ranks configurations; smaller is
faster. The x-stripe refetch traffic `nonempty_cells * W * F * 4` bytes
is also reported (secondary: kernel measured MXU-bound at these shapes).

Usage: python scripts/exp_pad_study.py [--scale 1.0]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = 1024  # Mosaic floor: 1-D edge blocks need 8x128 f32 min tile


def pad_stats(rows, cols, n, rb, w):
    n_rb = -(-n // rb)
    n_st = -(-n // w)
    cell = (rows // rb) * n_st + (cols // w)
    counts = np.bincount(cell, minlength=n_rb * n_st)
    nonzero = counts[counts > 0]
    chunks = -(-nonzero // CHUNK)
    e_pad = int(chunks.sum()) * CHUNK
    return {
        "pad": e_pad / len(rows),
        "nonempty_cells": int(len(nonzero)),
        "cells": int(n_rb * n_st),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--features", type=int, default=602)
    args = p.parse_args()

    import scipy.sparse as sp

    from sgc_tpu.data.synthetic import synthetic_reddit
    from sgc_tpu.graph.reorder import degree_order, rcm_order

    graph, x, _, _ = synthetic_reddit(args.scale)
    n = graph.n_rows
    rows = np.asarray(graph.rows)[: graph.nnz].astype(np.int64)
    cols = np.asarray(graph.cols)[: graph.nnz].astype(np.int64)
    e = len(rows)
    print(f"nodes={n} edges={e}", flush=True)

    adj = sp.coo_matrix(
        (np.ones(e, np.float32), (rows, cols)), shape=(n, n)
    ).tocsr()

    orderings = {"identity": None}
    t0 = time.time()
    orderings["degree"] = degree_order(adj)
    print(f"degree order: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    try:
        orderings["rcm"] = rcm_order(adj)
        print(f"rcm order: {time.time()-t0:.1f}s", flush=True)
    except Exception as ex:
        print(f"rcm failed: {ex}", flush=True)

    f_total = -(-args.features // 128) * 128  # lane-padded feature count
    results = []
    for oname, order in orderings.items():
        if order is None:
            r, c = rows, cols
        else:
            inv = np.empty(n, np.int64)
            inv[order] = np.arange(n)
            r, c = inv[rows], inv[cols]
        for rb in (256, 512, 1024, 2048):
            for w in (512, 1024, 2048):
                s = pad_stats(r, c, n, rb, w)
                # per-edge MXU flops and the projected hop time at the
                # measured 142 TFLOP/s sustained rate (0.72 * 197e12)
                flops_per_edge = 2 * (w + rb) * f_total * s["pad"]
                hop_s = flops_per_edge * e / 142e12
                x_gb = s["nonempty_cells"] * w * f_total * 4 / 1e9
                row = {"order": oname, "rb": rb, "w": w,
                       "pad": round(s["pad"], 3),
                       "nonempty": s["nonempty_cells"],
                       "proxy_Mflop_per_edge": round(flops_per_edge / 1e6, 3),
                       "proj_hop_s": round(hop_s, 4),
                       "x_traffic_gb": round(x_gb, 2)}
                results.append(row)
                print(json.dumps(row), flush=True)

    best = min(results, key=lambda r: r["proj_hop_s"])
    print("BEST:", json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
