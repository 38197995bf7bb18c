"""Tile sweep for the compiled flat-schedule Pallas SpMM kernel.

The one-hot formulation's flop cost is 2*(R+W)*f_pad per (padded) edge,
so smaller row/stripe tiles cut MXU work linearly — until chunk padding
(each cell pads its edge count up to a multiple of C) and per-chunk
overheads eat the gain. This sweep finds the operating point on the real
chip; run the moment a backend compiles scalar-prefetch index maps
(scripts/exp_pallas_probe.py + the probe ladder in CLAUDE.md).

Usage: python scripts/exp_flat_sweep.py [--scale 0.1] [--json out.jsonl]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SGC_TPU_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=0.1)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--json", default=None)
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["SGC_TPU_COMPILE_CACHE"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from sgc_tpu.data.synthetic import synthetic_reddit
    from sgc_tpu.ops.spmm import spmm_segment
    from sgc_tpu.ops.spmm_pallas import spmm_pallas_flat, tile_graph
    from sgc_tpu.utils.profiling import sync

    graph, x, _, _ = synthetic_reddit(args.scale)
    n, f = x.shape
    e = graph.rows.shape[0]
    print(f"backend={jax.default_backend()} nodes={n} edges={e} f={f}",
          flush=True)

    xd = jnp.asarray(x)
    seg = jax.jit(lambda xx: spmm_segment(graph, xx))
    seg(xd).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        r = seg(xd)
    r.block_until_ready(); sync(r)
    xla_s = (time.perf_counter() - t0) / args.repeats
    ref = np.asarray(r)
    print(f"xla_segment_s={xla_s:.4f} ({e/xla_s/1e6:.1f}M edges/s)",
          flush=True)

    # Measured (round 2, first healthy backend): chunk MUST be a multiple
    # of 1024 = 8 sublanes x 128 lanes — a 1-D (C,) block below the f32
    # min tile crashes the Mosaic compile helper (exit 1). So C is pinned
    # and the sweep explores the (row_block, stripe) cell grid instead:
    # smaller cells cut one-hot FLOPs ~linearly but pad every sparse cell
    # up to a full 1024-edge chunk.
    configs = []
    for rb in (512, 1024, 2048):
        for w in (1024, 2048):
            configs.append((rb, w, 1024, "f32"))
    rows = []
    out_f = open(args.json, "a") if args.json else None
    for rb, w, c, prec in configs:
        try:
            tiled = tile_graph(graph, rb, w, c)
            fn = jax.jit(lambda xx, t=tiled, p=prec: spmm_pallas_flat(
                t, xx, feature_tile=256, interpret=False, precision=p))
            y = fn(xd); y.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(args.repeats):
                y = fn(xd)
            y.block_until_ready(); sync(y)
            dt = (time.perf_counter() - t0) / args.repeats
            err = float(np.max(np.abs(np.asarray(y)[:n, :f] - ref))
                        / max(1e-9, float(np.max(np.abs(ref)))))
            pad = tiled.rows.shape[0] / max(1, e)
            row = {"rb": rb, "w": w, "c": c, "prec": prec,
                   "pallas_s": round(dt, 4), "vs_xla": round(xla_s / dt, 3),
                   "pad": round(pad, 3), "rel_err": float(f"{err:.2e}")}
        except Exception as ex:  # compile failure is a data point here
            row = {"rb": rb, "w": w, "c": c, "prec": prec,
                   "error": str(ex).splitlines()[0][:120]}
        print(json.dumps(row), flush=True)
        rows.append(row)
        if out_f:
            out_f.write(json.dumps(row) + "\n"); out_f.flush()

    good = [r for r in rows if "pallas_s" in r]
    if good:
        best = min(good, key=lambda r: r["pallas_s"])
        print("BEST:", json.dumps(best), flush=True)
        # bf16 variant of the winner
        tiled = tile_graph(graph, best["rb"], best["w"], best["c"])
        fn = jax.jit(lambda xx: spmm_pallas_flat(
            tiled, xx, feature_tile=256, interpret=False, precision="bf16"))
        y = fn(xd); y.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            y = fn(xd)
        y.block_until_ready(); sync(y)
        dt = (time.perf_counter() - t0) / args.repeats
        err = float(np.max(np.abs(np.asarray(y)[:n, :f] - ref))
                    / max(1e-9, float(np.max(np.abs(ref)))))
        print(json.dumps({**{k: best[k] for k in ("rb", "w", "c")},
                          "prec": "bf16", "pallas_s": round(dt, 4),
                          "vs_xla": round(xla_s / dt, 3),
                          "rel_err": float(f"{err:.2e}")}), flush=True)


if __name__ == "__main__":
    main()
