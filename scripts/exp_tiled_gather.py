"""TPU experiment: tile-aligned gather layouts for SpMM.

Round-1 finding: the segment-path SpMM is gather-rate-bound at ~36M
edges/s and bf16 features do not help. Hypothesis: gathering a (1, 602)
f32 row from an (8,128)-tiled array touches 5 tiles (20 KB) for 2.4 KB of
useful data (~12% efficiency). Storing X as (N, 5, 128) (F padded to 640)
makes each gather index read exactly one padded tile -> ~5x better gather
efficiency in plain XLA.

Variants measured per hop at synthetic-Reddit scale:
  seg602      current spmm_segment on (N, 602) f32           [baseline]
  tiled_f32   gather from (N, 5, 128) f32
  tiled_bf16  gather from (N, 5, 128) bf16, f32 accumulate
  gather_f32  gather only (no multiply/segment) on (N,5,128)  [cost split]
  seg_only    segment_sum of a precomputed (E,5,128) array    [cost split]
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
from sgc_tpu.utils.profiling import sync  # noqa: E402

SCALE = float(os.environ.get("SGC_BENCH_SCALE", "1.0"))
REPS = 3


def timed(name, fn, *args):
    out = fn(*args)          # warm / compile
    sync(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:12s} {best*1e3:8.1f} ms/hop   (all: "
          + ", ".join(f"{t*1e3:.1f}" for t in ts) + ")", flush=True)
    return best, out


def main():
    print("backend:", jax.default_backend(), flush=True)
    graph, features, labels, idx_train = synthetic_reddit(SCALE)
    n, f = features.shape
    e = graph.n_edges_padded
    print(f"n={n} e_pad={e} f={f}", flush=True)

    x = jnp.asarray(features)

    # --- baseline
    seg = jax.jit(lambda g, x: spmm_segment(g, x))
    t_base, out_base = timed("seg602", seg, graph, x)

    # --- tiled layouts: pad F 602 -> 640 = 5*128, view as (N, 5, 128)
    f_pad = ((f + 127) // 128) * 128
    lanes = f_pad // 128
    x_t = jnp.pad(x, ((0, 0), (0, f_pad - f))).reshape(n, lanes, 128)
    x_tb = x_t.astype(jnp.bfloat16)

    def spmm_tiled(g, xt):
        gathered = jnp.take(xt, g.cols, axis=0)
        weighted = gathered.astype(jnp.float32) * g.vals[:, None, None]
        return jax.ops.segment_sum(
            weighted, g.rows, num_segments=g.n_rows, indices_are_sorted=True)

    tiled = jax.jit(spmm_tiled)
    t_tiled, out_tiled = timed("tiled_f32", tiled, graph, x_t)
    t_tiledb, _ = timed("tiled_bf16", tiled, graph, x_tb)

    # correctness
    ref = np.asarray(out_base)
    got = np.asarray(out_tiled.reshape(n, f_pad)[:, :f])
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
    print(f"tiled_f32 vs seg602 rel err: {err:.2e}", flush=True)

    # --- cost split
    gat = jax.jit(lambda g, xt: jnp.take(xt, g.cols, axis=0))
    t_g, gathered = timed("gather_f32", gat, graph, x_t)

    segonly = jax.jit(lambda g, w: jax.ops.segment_sum(
        w, g.rows, num_segments=g.n_rows, indices_are_sorted=True))
    timed("seg_only", segonly, graph, gathered)

    gb = e * f_pad * 4 / 1e9
    print(f"gather bytes (f32 tiled, useful+pad): {gb:.1f} GB", flush=True)
    print(f"tiled_f32 eff BW: {gb / t_tiled:.0f} GB/s "
          f"| edges/s: {e / t_tiled / 1e6:.0f}M", flush=True)


if __name__ == "__main__":
    main()
