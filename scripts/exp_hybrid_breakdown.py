"""Break the clustered-bench hop time into its parts, on the real chip.

exp_fuse_study measured hops(2) = 310 ms, INSENSITIVE to kernel
precision (bf16 == f32) — so the MXU matmuls are not the wall. Suspects:
the sparse remainder (segment path), per-program dispatch RTT over the
tunnel, or the dense kernel's non-matmul overhead.

Times, each as its own jit program (one sync per call):
  - dispatch floor: a scalar no-op program
  - hop1 dense-only / hop1 rest-only / hop1 full hybrid
  - hop2 (final, train rows) dense-only / rest-only / full
  - hops(2) fused reference point
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGC_TPU_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))


def main():
    import dataclasses

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["SGC_TPU_COMPILE_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from sgc_tpu.data.synthetic import synthetic_reddit_clustered
    from sgc_tpu.graph.locality import LocalityPlan
    from sgc_tpu.ops.spmm_hybrid import (hybrid_bind, hybrid_device_args,
                                         spmm_hybrid_split)
    from sgc_tpu.ops.spmm import spmm_segment
    from sgc_tpu.utils.profiling import bench_timeit

    print("backend:", jax.default_backend(), flush=True)
    scale = float(os.environ.get("SGC_BENCH_SCALE", "1.0"))
    t0 = time.perf_counter()
    data = synthetic_reddit_clustered(scale, shuffle=True, device=False)
    plan = LocalityPlan.build(*data, formulation="onehot")
    print(f"prep {time.perf_counter() - t0:.1f}s stages={plan.prep_seconds} "
          f"dense_frac {plan.dense_fraction:.3f}", flush=True)
    for name, s in (("main", plan.split_main), ("final", plan.split_final)):
        print(f"  split {name}: dense {s.dense_edges} (pad {s.pad:.3f}) "
              f"rest {s.sparse_edges} min_fill {s.min_fill:.4f}", flush=True)

    x = jnp.asarray(plan.features)
    args_main = hybrid_device_args(plan.split_main)
    args_final = hybrid_device_args(plan.split_final)

    def timeit(name, fn, reps=5):
        return bench_timeit(name, fn, reps,
                            emit=lambda s: print(s, flush=True))

    noop = jax.jit(lambda s: s + 1.0)
    timeit("dispatch floor (scalar noop)", lambda: noop(jnp.float32(1.0)),
           reps=7)

    def part_fn(split, dense_only):
        if dense_only:
            s = dataclasses.replace(split, rest=None)
        else:
            s = dataclasses.replace(split, tiled=None)

        def f(xx, a):
            return spmm_hybrid_split(hybrid_bind(s, a), xx, interpret=False)
        return jax.jit(f)

    for name, split, args in (("hop1", plan.split_main, args_main),
                              ("hop2(final)", plan.split_final, args_final)):
        full = jax.jit(lambda xx, a, s=split: spmm_hybrid_split(
            hybrid_bind(s, a), xx, interpret=False))
        timeit(f"{name} full hybrid", lambda: full(x, args))
        if split.tiled is not None:
            dn = part_fn(split, True)
            dense_args = (args[0], None)
            timeit(f"{name} dense-only", lambda: dn(x, dense_args))
        if split.rest is not None:
            rs = part_fn(split, False)
            rest_args = (None, args[1])
            timeit(f"{name} rest-only", lambda: rs(x, rest_args))

    khop, dev_args = plan.khop_traceable(degree=2, interpret=False)
    hops = jax.jit(khop)
    timeit("hops(2) fused", lambda: hops(x, dev_args))


if __name__ == "__main__":
    main()
