"""LBFGS term: bf16 train-feature storage experiment (round 3).

The fused headline's train part (~105-128 ms of ~276 ms) is floor-bound
by streaming the 367 MB f32 train-feature matrix from HBM twice per
sequential iteration (DESIGN §2b audit). The MXU rounds matmul operands
to bf16 regardless, so storing the PROPAGATED train features in bf16
halves that stream with minimal numeric change — this measures the
speed and the loss/param drift at the Reddit train shape.

Usage: python scripts/exp_lbfgs_bf16.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGC_TPU_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["SGC_TPU_COMPILE_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from sgc_tpu.models.sgc import init_sgc
    from sgc_tpu.train.loops import _lbfgs_linear_fit
    from sgc_tpu.utils.profiling import sync

    log(f"backend: {jax.default_backend()}")
    n_train, F, C = 152_410, 602, 41
    rng = np.random.default_rng(0)
    tr = rng.normal(size=(n_train, F)).astype(np.float32)
    y = jnp.asarray(rng.integers(0, C, n_train).astype(np.int32))
    params0 = init_sgc(jax.random.PRNGKey(42), F, C, bias=True)
    wd = jnp.asarray(0.0, jnp.float32)
    cw = jnp.ones((C,), jnp.float32)

    fit = jax.jit(lambda x, p0: _lbfgs_linear_fit(
        p0, x, y, wd, cw, 2, False, False, 1.0))

    results = {}
    for dtype in ("f32", "bf16"):
        x = jnp.asarray(tr, jnp.bfloat16 if dtype == "bf16" else
                        jnp.float32)
        p, loss = fit(x, params0)
        sync(p)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            p, loss = fit(x, params0)
            sync(p)
            best = min(best, time.perf_counter() - t0)
        results[dtype] = (best, np.asarray(p.w), float(np.asarray(loss)[-1])
                          if np.ndim(loss) else float(loss))
        log(f"{dtype}: 2 LBFGS epochs {best*1e3:.1f} ms "
            f"final-loss {results[dtype][2]:.6f}")

    werr = np.abs(results["bf16"][1] - results["f32"][1]).max()
    scale = np.abs(results["f32"][1]).max()
    log(f"bf16 vs f32: {results['f32'][0]/results['bf16'][0]:.2f}x, "
        f"w rel-err {werr/scale:.2e}, "
        f"loss delta {abs(results['bf16'][2]-results['f32'][2]):.2e}")


if __name__ == "__main__":
    main()
