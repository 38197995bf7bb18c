"""TPU experiment 2: bulk-gather chunked SpMM vs the fused segment loop.

exp_tiled_gather findings: (a) seg602 fused gather+segment loop runs at
~345 ms/hop (29.7 ns/row ~ 28 cycles — a serial per-row loop); (b) the
3-D tiled gather does NOT fuse into segment_sum (XLA tried to materialize
the (E,5,128) 48 GB intermediate). Hypothesis here: a *standalone* bulk
gather kernel over bounded chunks is parallel/vectorized and much faster
than the fused loop; pair it with a sorted scatter-add accumulate.

Variants (per hop, synthetic Reddit scale):
  gatherC_602    raw bulk gather of 1M rows from (N, 602) f32
  gatherC_tiled  raw bulk gather of 1M rows from (N, 5, 128) f32
  gatherC_tb16   raw bulk gather of 1M rows from (N, 5, 128) bf16
  chunked602     scan: gather (C,602) + scatter-add (existing impl)
  chunk_tiled    scan: gather (C,5,128), weight, scatter-add into (N,5,128)
  chunk_tb16     same with bf16 feature storage, f32 accumulate
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
from sgc_tpu.ops.spmm import spmm_chunked, spmm_segment  # noqa: E402
from sgc_tpu.utils.profiling import sync  # noqa: E402

SCALE = float(os.environ.get("SGC_BENCH_SCALE", "1.0"))
REPS = 3
C = 1 << 20   # 1M-edge chunks


def timed(name, fn, *args):
    try:
        out = fn(*args)
        sync(out)
    except Exception as e:
        print(f"{name:14s} FAILED: {str(e)[:200]}", flush=True)
        return None, None
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:14s} {best*1e3:8.1f} ms   (all: "
          + ", ".join(f"{t*1e3:.1f}" for t in ts) + ")", flush=True)
    return best, out


def main():
    print("backend:", jax.default_backend(), flush=True)
    graph, features, labels, idx_train = synthetic_reddit(SCALE)
    n, f = features.shape
    e = graph.n_edges_padded
    print(f"n={n} e_pad={e} f={f} chunk={C}", flush=True)

    x = jnp.asarray(features)
    f_pad = ((f + 127) // 128) * 128
    lanes = f_pad // 128
    x_t = jnp.pad(x, ((0, 0), (0, f_pad - f))).reshape(n, lanes, 128)
    x_tb = x_t.astype(jnp.bfloat16)
    cols_c = graph.cols[:C]

    # --- raw bulk gather rates
    g602 = jax.jit(lambda xx, cc: jnp.take(xx, cc, axis=0))
    t, _ = timed("gatherC_602", g602, x, cols_c)
    if t:
        print(f"   -> {C/t/1e6:.0f} M rows/s, "
              f"{C*f*4/t/1e9:.0f} GB/s useful", flush=True)
    t, _ = timed("gatherC_tiled", g602, x_t, cols_c)
    if t:
        print(f"   -> {C/t/1e6:.0f} M rows/s, "
              f"{C*f_pad*4/t/1e9:.0f} GB/s", flush=True)
    t, _ = timed("gatherC_tb16", g602, x_tb, cols_c)
    if t:
        print(f"   -> {C/t/1e6:.0f} M rows/s, "
              f"{C*f_pad*2/t/1e9:.0f} GB/s", flush=True)

    # --- full-hop chunked scans
    def chunk_scan(xx, rows, cols, vals, out_shape):
        n_chunks = rows.shape[0] // C

        def step(acc, ch):
            r, c_, v = ch
            gathered = jnp.take(xx, c_, axis=0).astype(jnp.float32)
            w = gathered * v.reshape((C,) + (1,) * (gathered.ndim - 1))
            acc = acc.at[r].add(w, indices_are_sorted=True, mode="drop")
            return acc, None

        acc0 = jnp.zeros(out_shape, jnp.float32)
        acc, _ = jax.lax.scan(
            step, acc0,
            (rows.reshape(n_chunks, C), cols.reshape(n_chunks, C),
             vals.reshape(n_chunks, C)))
        return acc

    # pad edge arrays to a C multiple
    e_c = -(-e // C) * C
    pad = e_c - e
    rows_p = jnp.concatenate([graph.rows, jnp.full((pad,), n - 1, jnp.int32)])
    cols_p = jnp.concatenate([graph.cols, jnp.zeros((pad,), jnp.int32)])
    vals_p = jnp.concatenate([graph.vals, jnp.zeros((pad,), jnp.float32)])

    cs = jax.jit(chunk_scan, static_argnums=(4,))
    t602, out602 = timed("chunked602", cs, x, rows_p, cols_p, vals_p, (n, f))
    t_t, out_t = timed("chunk_tiled", cs, x_t, rows_p, cols_p, vals_p,
                       (n, lanes, 128))
    t_b, _ = timed("chunk_tb16", cs, x_tb, rows_p, cols_p, vals_p,
                   (n, lanes, 128))

    # --- correctness vs fused segment
    seg = jax.jit(spmm_segment)
    ref = np.asarray(seg(graph, x))
    if out_t is not None:
        got = np.asarray(out_t.reshape(n, f_pad)[:, :f])
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
        print(f"chunk_tiled vs segment rel err: {err:.2e}", flush=True)
    if out602 is not None:
        err = np.abs(ref - np.asarray(out602)).max() / (
            np.abs(ref).max() + 1e-9)
        print(f"chunked602 vs segment rel err: {err:.2e}", flush=True)
    for name, t in (("chunked602", t602), ("chunk_tiled", t_t),
                    ("chunk_tb16", t_b)):
        if t:
            print(f"{name}: {e/t/1e6:.0f} M edges/s", flush=True)


if __name__ == "__main__":
    main()
