"""TPU experiment 5: is the fused gather+segment loop gather- or
segment-bound? Compare at E=4M edges (F=602):
  seg      gather+scale+sorted segment_sum (the real op)
  allsum   gather+scale+jnp.sum(axis=0)  — same gathers, NO segments
  seg1k    same but rows>>8 (1024 segments) — cheap segment structure
If allsum ~= seg, the gather dominates; if allsum is much faster, the
segment reduction is the wall and different reduction structures help.
"""
import os
import sys
import time

os.environ.setdefault("SGC_TPU_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["SGC_TPU_COMPILE_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synthetic_reddit  # noqa: E402
from sgc_tpu.utils.profiling import sync  # noqa: E402

E = 4 * 1024 * 1024
REPS = 3


def timed(name, fn, *args):
    try:
        out = fn(*args)
        sync(out)
    except Exception as e:
        print(f"{name:10s} FAILED: {str(e)[:140]}", flush=True)
        return
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:10s} {best*1e3:8.1f} ms  ({E/best/1e6:.0f} M rows/s)",
          flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    graph, features, _, _ = synthetic_reddit(1.0)
    x = jnp.asarray(features)
    n = x.shape[0]
    rows = graph.rows[:E]
    cols = graph.cols[:E]
    vals = graph.vals[:E]

    def seg(x, r, c, v):
        g = jnp.take(x, c, axis=0) * v[:, None]
        return jax.ops.segment_sum(g, r, num_segments=n,
                                   indices_are_sorted=True)

    def allsum(x, c, v):
        g = jnp.take(x, c, axis=0) * v[:, None]
        return jnp.sum(g, axis=0)

    def seg1k(x, r, c, v):
        g = jnp.take(x, c, axis=0) * v[:, None]
        return jax.ops.segment_sum(g, r >> 8, num_segments=1024,
                                   indices_are_sorted=True)

    timed("seg", jax.jit(seg), x, rows, cols, vals)
    timed("allsum", jax.jit(allsum), x, cols, vals)
    timed("seg1k", jax.jit(seg1k), x, rows, cols, vals)


if __name__ == "__main__":
    main()
