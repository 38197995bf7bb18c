"""A/B the super-row blockdense kernel on the full-scale clustered split.

The roofline names the dense term's bytes as cells (compulsory) plus
x-stripes re-read once per (row block, stripe) cell — an ~11x re-read
factor at the headline's dense fraction. The super-row kernel
(`_blockdense_super_kernel`) keeps an S-row-block out panel resident in
VMEM and orders cells (rb//S, st, rb), so a stripe shared by the
panel's row blocks loads once per (panel, stripe). This script measures
the dense term alone, classic vs super_rows in {4, 8, 16}, on the SAME
LPA-reordered graph the bench uses, and reports the host-side
stripe-load counts that bound the possible win.

Run on the real TPU:  python scripts/exp_super_rows.py
(each variant ships its own 2.7 GB cell buffer over the tunnel: minutes)
SGC_SUPER_SCALE=0.25 for a faster pass.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def stripe_loads(rb, st, S):
    """Stripe fetches = consecutive (panel, stripe) runs in the
    kernel's ACTUAL cell order (pallas skips the stripe copy only when
    the block index repeats between consecutive grid steps)."""
    if S is None:
        key = rb.astype(np.int64) * (int(st.max()) + 1) + st
    else:
        key = (rb // S).astype(np.int64) * (int(st.max()) + 1) + st
    return int(1 + (np.diff(key) != 0).sum())


def main():
    import jax
    import jax.numpy as jnp

    from sgc_tpu.data.synthetic import synthetic_reddit_clustered
    from sgc_tpu.graph.locality import LocalityPlan
    from sgc_tpu.ops.spmm_blockdense import (
        blockdense_device_args,
        split_block_dense,
        spmm_blockdense_pallas,
    )
    from sgc_tpu.utils.alloc import prewarm_pool
    from sgc_tpu.utils.profiling import sync

    scale = float(os.environ.get("SGC_SUPER_SCALE", "1.0"))
    log(f"backend {jax.default_backend()}; scale {scale}")
    data = synthetic_reddit_clustered(scale, shuffle=True, device=False)
    graph, features, labels, idx_train = data
    prewarm_pool([int(b * min(scale, 1.0))
                  for b in ((4 << 30), (3 << 30), (700 << 20))])
    plan = LocalityPlan.build(graph, features, labels, idx_train,
                              formulation="blockdense", calibrate=True)
    base = plan.split_main
    log(f"plan: cells {base.n_cells} dense_frac {plan.dense_fraction:.3f}")

    x = jnp.asarray(plan.features)
    rows = {}
    import dataclasses as dc

    variants = [("None", dict())]
    for S in (int(s) for s in os.environ.get(
            "SGC_SUPER_S", "4,8,16").split(",") if s):
        variants.append((f"S{S}", dict(super_rows=S)))
    for S, G in ((8, 2), (8, 4)):
        # grouped: G matmuls per grid step against one stripe block;
        # (panel, stripe) runs padded to G with zero cells — report the
        # slot growth (wasted matmuls + extra cell bytes) with the time
        variants.append((f"S{S}G{G}", dict(super_rows=S, group_cells=G)))
    for name, kw in variants:
        if not kw:
            split = dc.replace(base, rest=None, sparse_edges=0)
        else:
            full = split_block_dense(
                plan.graph, int(x.shape[1]), min_edges=base.min_edges,
                **kw)
            split = dc.replace(full, rest=None, sparse_edges=0)
        S = kw.get("super_rows")
        loads = stripe_loads(
            np.asarray(split.rb_ids)[: split.n_cells],
            np.asarray(split.st_ids)[: split.n_cells], S)
        # cell data rides as jit ARGUMENTS (device_put once) — a jit
        # closure over the split lowers 2.7 GB of cells as HLO
        # constants and trips the remote-compile body limit (CLAUDE.md;
        # measured: HTTP 413 on the first attempt of this experiment)
        dense_args, _ = blockdense_device_args(split)
        fn = jax.jit(lambda xx, a, s=split: spmm_blockdense_pallas(
            s, xx, args=(a, None), interpret=False))
        log(f"{name}: stripe loads {loads} (vs {split.n_cells} cells, "
            f"{split.cells.shape[0]} slots); warming (cell transfer)...")
        t0 = time.perf_counter()
        sync(fn(x, dense_args))
        log(f"  warm {time.perf_counter()-t0:.0f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(x, dense_args))
            best = min(best, time.perf_counter() - t0)
        rows[name] = {"dense_ms": round(best * 1e3, 1),
                      "stripe_loads": loads,
                      "n_cells": split.n_cells,
                      "n_slots": int(split.cells.shape[0]),
                      "cell_gb": round(split.cells.nbytes / 1e9, 2)}
        log(f"  dense term {best*1e3:.1f} ms")
        del fn, split, dense_args  # free 2.7 GB device cells for next

    base_ms = rows["None"]["dense_ms"]
    best_s = min(rows, key=lambda k: rows[k]["dense_ms"])
    print(json.dumps({
        "scale": scale,
        "rows": rows,
        "best": best_s,
        "speedup_vs_classic": round(
            base_ms / rows[best_s]["dense_ms"], 3),
    }))


if __name__ == "__main__":
    main()
