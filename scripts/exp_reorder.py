"""TPU experiment 6: does graph reordering speed the XLA gather path?

VERDICT round-1 #1(a): apply graph/reorder.py orderings to the bench
graph and measure the gather-locality effect on the real headline op.
Theory so far says the fused gather is per-row-cost bound (locality
insensitive); this measures it rather than assuming.
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
from sgc_tpu.graph.sparse import SparseGraph  # noqa: E402
from sgc_tpu.ops.spmm import spmm_segment  # noqa: E402
from sgc_tpu.utils.profiling import sync  # noqa: E402

REPS = 3


def timed(name, fn, *args):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:14s} {min(ts)*1e3:8.1f} ms/hop", flush=True)


def main():
    from sgc_tpu.graph.reorder import apply_order, fetch_ordering

    print("backend:", jax.default_backend(), flush=True)
    graph, features, _, _ = synthetic_reddit(1.0)
    x = jnp.asarray(features)
    seg = jax.jit(spmm_segment)
    timed("original", seg, graph, x)

    adj = graph.to_scipy().tocsr()
    xn = np.asarray(x)
    for name in ("rcm", "degree"):
        t0 = time.perf_counter()
        order = fetch_ordering(name)(adj)
        adj_r, = apply_order(adj, order)
        g_r = SparseGraph.from_scipy(adj_r)
        print(f"{name}: reorder+rebuild {time.perf_counter()-t0:.0f}s",
              flush=True)
        x_r = jnp.asarray(xn[order])
        timed(f"{name}", seg, g_r, x_r)


if __name__ == "__main__":
    main()
