"""XLA-segment vs compiled flat-Pallas SpMM: the crossover curve.

One process, one tunnel claim: measures both implementations at several
graph scales (and the bf16 kernel variant), emitting one JSON line per
point. The flat kernel's cost is ~2*(W+R)*F*pad flops/edge (MXU-bound at
~72% util), so it wins where the cell grid is dense (small scales /
clustered topologies) and loses to the XLA gather wall (~34M edges/s)
where cells are uniformly sparse — this script maps the boundary on the
real chip, feeding the auto-chooser thresholds in sgc_tpu.ops.spmm.

Usage: python scripts/exp_crossover.py [--scales 0.05,0.1,0.25,0.5]
       [--topology uniform|clustered] [--json out.jsonl]
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


def pick_tiles(n_nodes: int):
    """Coarser cells at larger node counts keep chunk padding bounded."""
    if n_nodes <= 80_000:
        return 1024, 1024
    return 2048, 2048


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scales", default="0.05,0.1,0.25,0.5")
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--topology", default="uniform",
                   choices=["uniform", "clustered"])
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

    print("backend:", jax.default_backend(), flush=True)
    out_f = open(args.json, "a") if args.json else None

    def emit(row):
        print(json.dumps(row), flush=True)
        if out_f:
            out_f.write(json.dumps(row) + "\n")
            out_f.flush()

    for scale in [float(s) for s in args.scales.split(",")]:
        if args.topology == "clustered":
            from sgc_tpu.data.synthetic import synthetic_reddit_clustered

            graph, x, _, _ = synthetic_reddit_clustered(scale)
        else:
            graph, x, _, _ = synthetic_reddit(scale)
        n, f = x.shape
        e = graph.nnz
        xd = jnp.asarray(x)

        seg = jax.jit(lambda xx, g=graph: spmm_segment(g, xx))
        r = seg(xd); r.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            r = seg(xd)
        r.block_until_ready(); sync(r)
        xla_s = (time.perf_counter() - t0) / args.repeats
        ref = np.asarray(r)
        emit({"scale": scale, "topology": args.topology, "impl": "xla",
              "nodes": n, "edges": e, "s": round(xla_s, 4),
              "medges_per_s": round(e / xla_s / 1e6, 1)})

        rb, w = pick_tiles(n)
        t0 = time.perf_counter()
        tiled = tile_graph(graph, rb, w, 1024)
        tile_s = time.perf_counter() - t0
        pad = tiled.rows.shape[0] / max(1, e)
        for prec in ("f32", "bf16"):
            try:
                fn = jax.jit(lambda xx, t=tiled, pr=prec: spmm_pallas_flat(
                    t, xx, feature_tile=256, interpret=False, precision=pr))
                y = fn(xd); y.block_until_ready()
                t0 = time.perf_counter()
                for _ in range(args.repeats):
                    y = fn(xd)
                y.block_until_ready(); sync(y)
                dt = (time.perf_counter() - t0) / args.repeats
                err = float(
                    np.max(np.abs(np.asarray(y)[:n, :f] - ref))
                    / max(1e-9, float(np.max(np.abs(ref)))))
                emit({"scale": scale, "topology": args.topology,
                      "impl": f"pallas_flat_{prec}", "rb": rb, "w": w,
                      "pad": round(pad, 3), "tile_s": round(tile_s, 2),
                      "s": round(dt, 4), "vs_xla": round(xla_s / dt, 3),
                      "medges_per_s": round(e / dt / 1e6, 1),
                      "rel_err": float(f"{err:.2e}")})
            except Exception as ex:  # noqa: BLE001
                emit({"scale": scale, "topology": args.topology,
                      "impl": f"pallas_flat_{prec}",
                      "error": str(ex).splitlines()[0][:140]})

        # hybrid: cost-model split -> dense cells on MXU + remainder on XLA
        from sgc_tpu.ops.spmm_hybrid import (split_dense_cells,
                                             spmm_hybrid_split)

        for hrb, hw in ((512, 512), (1024, 1024)):
            try:
                t0 = time.perf_counter()
                split = split_dense_cells(graph, f, hrb, hw, 1024)
                split_s = time.perf_counter() - t0
                fn = jax.jit(lambda xx, s=split: spmm_hybrid_split(
                    s, xx, interpret=False))
                y = fn(xd); y.block_until_ready()
                t0 = time.perf_counter()
                for _ in range(args.repeats):
                    y = fn(xd)
                y.block_until_ready(); sync(y)
                dt = (time.perf_counter() - t0) / args.repeats
                err = float(
                    np.max(np.abs(np.asarray(y)[:n, :f] - ref))
                    / max(1e-9, float(np.max(np.abs(ref)))))
                emit({"scale": scale, "topology": args.topology,
                      "impl": "hybrid", "rb": hrb, "w": hw,
                      "dense_frac": round(split.dense_edges / max(1, e), 3),
                      "pad": round(split.pad, 3),
                      "split_s": round(split_s, 2),
                      "s": round(dt, 4), "vs_xla": round(xla_s / dt, 3),
                      "medges_per_s": round(e / dt / 1e6, 1),
                      "rel_err": float(f"{err:.2e}")})
            except Exception as ex:  # noqa: BLE001
                emit({"scale": scale, "topology": args.topology,
                      "impl": "hybrid", "rb": hrb, "w": hw,
                      "error": str(ex).splitlines()[0][:140]})


if __name__ == "__main__":
    main()
