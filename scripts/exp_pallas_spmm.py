"""TPU experiment 3: COMPILED Pallas cell-tiled SpMM at Reddit scale.

Compiled Pallas works this round (exp_pallas_probe). Measure the one-hot
MXU kernel per hop across cell geometries; FLOP model: 2*(R+W)*F per
padded edge, HBM model: full-X stripe stream per row-block = X * n_rb
bytes. Small cells cut FLOPs but add chunk padding + stripe re-reads.
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("SGC_TPU_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["SGC_TPU_COMPILE_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synthetic_reddit  # noqa: E402
from sgc_tpu.ops.spmm import spmm_segment  # noqa: E402
from sgc_tpu.ops.spmm_pallas import spmm_pallas_tiled, tile_graph  # noqa: E402
from sgc_tpu.utils.profiling import sync  # noqa: E402

SCALE = float(os.environ.get("SGC_BENCH_SCALE", "1.0"))
REPS = 3

CONFIGS = [
    # (R, W, C, Ft, precision)
    (2048, 2048, 1024, 256, "bf16"),
    (2048, 2048, 1024, 256, "f32"),
    (1024, 1024, 256, 640, "bf16"),
    (1536, 1536, 512, 640, "bf16"),
    (768, 768, 128, 640, "bf16"),
]


def main():
    print("backend:", jax.default_backend(), flush=True)
    graph, features, labels, idx_train = synthetic_reddit(SCALE)
    n, f = features.shape
    print(f"n={n} e_pad={graph.n_edges_padded} f={f}", flush=True)
    x = jnp.asarray(features)

    seg = jax.jit(spmm_segment)
    ref = np.asarray(seg(graph, x))

    for (R, W, C, Ft, prec) in CONFIGS:
        t0 = time.perf_counter()
        tiled = tile_graph(graph, row_block=R, stripe=W, chunk=C)
        t_tile = time.perf_counter() - t0
        e_padded = tiled.rows.shape[0]
        blowup = e_padded / graph.nnz
        tflop = 2 * (R + W) * 640 * e_padded / 1e12
        name = f"R{R}_W{W}_C{C}_Ft{Ft}_{prec}"
        print(f"{name}: tile {t_tile:.1f}s, pad x{blowup:.2f}, "
              f"{tflop:.1f} TFLOP/hop", flush=True)

        fn = jax.jit(lambda xx, t=tiled, ft=Ft, p=prec: spmm_pallas_tiled(
            t, xx, feature_tile=ft, interpret=False, precision=p))
        try:
            out = fn(x)
            sync(out)
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:300]}", flush=True)
            continue
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(x)
            sync(out)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        got = np.asarray(out)[:n, :f]
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
        print(f"{name}: {best*1e3:8.1f} ms/hop "
              f"({graph.nnz/best/1e6:.0f} M edges/s, "
              f"{tflop/best:.0f} TFLOP/s)  rel_err {err:.1e}  (all: "
              + ", ".join(f"{t*1e3:.0f}" for t in ts) + ")", flush=True)


if __name__ == "__main__":
    main()
