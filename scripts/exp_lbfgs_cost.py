"""TPU experiment 7: where do the bench's ~95ms of LBFGS training go?

Times _lbfgs_linear_fit at Reddit-train shape with different history
sizes. If m=1 ~= m=40, the two-loop recursion is not the cost (it's the
40 sequential value_and_grad steps) and a compact-representation rewrite
would buy nothing.
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

from sgc_tpu.models.sgc import init_sgc  # noqa: E402
from sgc_tpu.train.optim import lbfgs_minimize  # noqa: E402
from sgc_tpu.utils.profiling import sync  # noqa: E402
from jax.flatten_util import ravel_pytree  # noqa: E402

N_TRAIN, F, C = 152_410, 602, 41
REPS = 3


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N_TRAIN, F)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, C, N_TRAIN).astype(np.int32))
    params = init_sgc(jax.random.PRNGKey(0), F, C, bias=True)
    flat0, unravel = ravel_pytree(params)

    import optax

    # x/y must be jit ARGUMENTS: closing over them bakes a 367 MB constant
    # into the HLO, which the tunnel's remote-compile endpoint rejects
    # (HTTP 413 length limit).
    for m in (1, 5, 40):
        def run(f0, xx, yy, m=m):
            def flat_loss(flat):
                p = unravel(flat)
                logits = xx @ p.w + p.b
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, yy).mean()
            return lbfgs_minimize(
                flat_loss, f0, max_iter=40, lr=1.0, history_size=m)[0]

        fn = jax.jit(run)
        out = fn(flat0, x, y)
        sync(out)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(flat0, x, y)
            sync(out)
            ts.append(time.perf_counter() - t0)
        print(f"m={m:3d}: {min(ts)*1e3:7.1f} ms for 40 iters "
              f"({min(ts)/40*1e3:.2f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
