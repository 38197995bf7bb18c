"""Probe: does compiled (non-interpret) Pallas work on this backend this round?

Round-1 finding: even trivial compiled pallas_call hangs over the axon
tunnel. Re-test each round; if it works, the spmm_pallas kernel becomes
benchmarkable. Run under `timeout` — a hang is the expected failure mode.
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


def main():
    print("backend:", jax.default_backend(), flush=True)
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    t0 = time.perf_counter()
    y = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
    )(x)
    y.block_until_ready()
    got = float(y[0, 1])
    print(f"compiled pallas OK in {time.perf_counter()-t0:.1f}s, y[0,1]={got}",
          flush=True)
    assert got == 2.0


if __name__ == "__main__":
    main()
