"""TPU experiment 4: multi-stream segment SpMM — hide gather latency.

The fused gather+segment loop runs at ~34M rows/s (~29 cycles/row),
which looks like HBM-latency-bound serial row fetches. K independent
edge-shard segment-sums inside one program give XLA K concurrent gather
streams; partial outputs are summed (extra K*(N,F) traffic is ~4ms).
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
    try:
        out = fn(*args)
        sync(out)
    except Exception as e:
        print(f"{name:16s} FAILED: {str(e)[:160]}", flush=True)
        return None, None
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:16s} {best*1e3:8.1f} ms  (all: "
          + ", ".join(f"{t*1e3:.1f}" for t in ts) + ")", flush=True)
    return best, out


def main():
    print("backend:", jax.default_backend(), flush=True)
    graph, features, labels, idx_train = synthetic_reddit(SCALE)
    n, f = features.shape
    e = graph.n_edges_padded
    x = jnp.asarray(features)
    print(f"n={n} e_pad={e} f={f}", flush=True)

    seg = jax.jit(spmm_segment)
    t1, ref = timed("seg_k1", seg, graph, x)

    for K in (2, 4, 8, 16):
        if e % K:
            continue
        ek = e // K
        rows_k = graph.rows.reshape(K, ek)
        cols_k = graph.cols.reshape(K, ek)
        vals_k = graph.vals.reshape(K, ek)

        def multi(x, rows_k=rows_k, cols_k=cols_k, vals_k=vals_k, K=K):
            # unrolled (NOT vmap — the batched form trips the tunnel's
            # remote-compile helper): K independent fused gather+segment
            # loops XLA can overlap, then a tree-sum of partials
            parts = []
            for s in range(K):
                g = jnp.take(x, cols_k[s], axis=0) * vals_k[s][:, None]
                parts.append(jax.ops.segment_sum(
                    g, rows_k[s], num_segments=n, indices_are_sorted=True))
            out = parts[0]
            for p in parts[1:]:
                out = out + p
            return out

        t, out = timed(f"seg_k{K}", jax.jit(multi), x)
        if out is not None and ref is not None:
            err = np.abs(np.asarray(out) - np.asarray(ref)).max() / (
                np.abs(np.asarray(ref)).max() + 1e-9)
            print(f"   rel err {err:.1e}, {e/t/1e6:.0f} M edges/s",
                  flush=True)


if __name__ == "__main__":
    main()
