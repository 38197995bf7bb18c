"""Fused (hops+LBFGS one program) vs split (hops program + LBFGS program).

The r2 fused bench measured total 0.447s with hops-only 0.306s, implying
~0.14s for an LBFGS whose standalone cost is ~0.06s (exp_lbfgs_cost).
This isolates whether single-program fusion costs more than the tunnel
dispatch it saves. Run on the TPU.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGC_TPU_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["SGC_TPU_COMPILE_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from sgc_tpu.data.synthetic import synthetic_reddit_clustered
    from sgc_tpu.graph.locality import LocalityPlan
    from sgc_tpu.models.sgc import init_sgc
    from sgc_tpu.train.loops import _lbfgs_linear_fit
    from sgc_tpu.utils.profiling import bench_timeit

    print("backend:", jax.default_backend(), flush=True)
    scale = float(os.environ.get("SGC_BENCH_SCALE", "1.0"))
    data = synthetic_reddit_clustered(scale, shuffle=True, device=False)
    plan = LocalityPlan.build(*data)
    print("prep done", flush=True)

    x = jnp.asarray(plan.features)
    labels_train = jnp.asarray(plan.labels[plan.idx_train])
    n_classes = int(plan.labels.max()) + 1
    p0 = init_sgc(jax.random.PRNGKey(42), x.shape[1], n_classes, bias=True)
    wd = jnp.asarray(0.0, jnp.float32)
    cw = jnp.ones((n_classes,), jnp.float32)

    khop, dev_args = plan.khop_traceable(degree=2, interpret=False)
    hops = jax.jit(khop)

    @jax.jit
    def fused(xx, args, pp, yy, wd_, cw_):
        tr = khop(xx, args)
        params, _ = _lbfgs_linear_fit(pp, tr, yy, wd_, cw_, 2, False, False,
                                      1.0)
        return params

    def timeit(name, fn, reps=5):
        return bench_timeit(name, fn, reps,
                            emit=lambda s: print(s, flush=True))

    tr = timeit("hops (one program)", lambda: hops(x, dev_args))

    timeit("lbfgs standalone (warm tr)",
           lambda: _lbfgs_linear_fit(p0, tr, labels_train, wd, cw, 2,
                                     False, False, 1.0)[0])

    def split_pipeline():
        t = hops(x, dev_args)
        return _lbfgs_linear_fit(p0, t, labels_train, wd, cw, 2,
                                 False, False, 1.0)[0]

    timeit("split: hops prog + lbfgs", split_pipeline)
    timeit("fused one program",
           lambda: fused(x, dev_args, p0, labels_train, wd, cw))

    # bf16 MXU kernel for the dense part (DESIGN §2c: ~3x the f32 kernel,
    # identical rel-err because the MXU rounds f32 operands to bf16 anyway)
    khop16, _ = plan.khop_traceable(degree=2, interpret=False,
                                    precision="bf16")
    hops16 = jax.jit(khop16)
    tr16 = timeit("hops bf16 (one program)", lambda: hops16(x, dev_args))
    a = np.asarray(tr)
    b = np.asarray(tr16)
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30)
    print(f"bf16 vs f32 hops rel-err: {rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
