"""LBFGS fit cost vs feature-storage dtype, Reddit train-row shape.

The fit reads the feature matrix twice per iteration (forward logits +
backward X^T r); at 152410x602 f32 that is ~29 GB over the 40 iterations
of the 2-epoch reference protocol — HBM-bandwidth-bound. The TPU MXU
rounds f32 matmul operands to bf16 regardless (jax default precision),
so storing the PROPAGATED features in bf16 halves the bytes without
changing the MXU arithmetic. VERDICT round-1 item 1(c) asked for exactly
this evaluation.
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

    from sgc_tpu.models.sgc import init_sgc
    from sgc_tpu.train.loops import _lbfgs_linear_fit
    from sgc_tpu.utils.profiling import bench_timeit

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    n, f, c = 152410, 602, 41
    tr = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    p0 = init_sgc(jax.random.PRNGKey(42), f, c, bias=True)
    wd = jnp.asarray(0.0, jnp.float32)
    cw = jnp.ones((c,), jnp.float32)

    def timeit(name, fn, reps=5):
        return bench_timeit(name, fn, reps,
                            emit=lambda s: print(s, flush=True))

    pf = timeit("lbfgs f32 features", lambda: _lbfgs_linear_fit(
        p0, tr, y, wd, cw, 2, False, False, 1.0)[0])

    tr16 = tr.astype(jnp.bfloat16)
    pb = timeit("lbfgs bf16 features", lambda: _lbfgs_linear_fit(
        p0, tr16, y, wd, cw, 2, False, False, 1.0)[0])

    dw = float(jnp.max(jnp.abs(pf.w - pb.w)))
    sw = float(jnp.max(jnp.abs(pf.w)))
    print(f"final-W divergence: {dw:.3e} (scale {sw:.3e})", flush=True)


if __name__ == "__main__":
    main()
