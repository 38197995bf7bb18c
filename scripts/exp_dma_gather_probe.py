"""Probe: in-kernel dynamic-offset DMA gather (the gather-wall escape).

The segment remainder is pinned at ~34M edges/s by XLA's per-row gather
(DESIGN §2b/§2f). The only kernel-level escape is issuing many
overlapping row DMAs with runtime offsets: HBM random-read latency can
be hidden with enough outstanding copies. That needs
`pltpu.make_async_copy(x_hbm.at[pl.ds(col, 1)], ...)` with ``col`` read
from a scalar-prefetch ref INSIDE the kernel.

Round-2 status: every scalar->address construct failed remote compile.
Round-3 status (2026-08-19): index-map-level scalar prefetch HEALED
(the block-dense kernel compiles and runs), but this in-kernel variant
STILL crashes the compile helper with a bare exit-1. Re-run this probe
whenever the backend changes; if it ever prints COMPILED, build the
flat gather kernel and retire the 34M edges/s wall.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGC_TPU_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["SGC_TPU_COMPILE_CACHE"])
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, f, e = 1024, 256, 64

    def kernel(cols_ref, x_hbm, out_ref, buf, sem):
        def body(i, _):
            c = cols_ref[i]
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(c, 1)], buf.at[pl.ds(i % 8, 1)], sem)
            cp.start()
            cp.wait()
            out_ref[pl.ds(i, 1), :] = buf[pl.ds(i % 8, 1), :]
            return 0
        jax.lax.fori_loop(0, e, body, 0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    cols = jnp.asarray(rng.integers(0, n, e), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((e, f), lambda i, c: (0, 0)),
        scratch_shapes=[pltpu.VMEM((8, f), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    fn = pl.pallas_call(kernel, grid_spec=grid_spec,
                        out_shape=jax.ShapeDtypeStruct((e, f), jnp.float32))
    try:
        got = np.asarray(jax.jit(fn)(cols, x))
        want = np.asarray(x)[np.asarray(cols)]
        print("DMA gather probe: COMPILED, correct =",
              bool(np.allclose(got, want)))
    except Exception as exc:
        print(f"DMA gather probe FAILED: {type(exc).__name__}: "
              f"{str(exc)[:200]}")


if __name__ == "__main__":
    main()
