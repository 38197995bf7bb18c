"""Probe: does scalar->address dataflow compile on this backend now?

Round-2 minimal failing case (probe8-f): a BlockSpec index_map driven by a
scalar-prefetch array. If this compiles, the flat-schedule sparse kernel
(sgc_tpu/ops/spmm_pallas.py::spmm_pallas_flat) can run compiled -> run
`python -m sgc_tpu.cli.pallas_bench --flat` next.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    print("backend:", jax.default_backend())

    NB, B, F = 8, 8, 128  # 8 blocks of 8 rows
    x = jnp.arange(NB * B * F, dtype=jnp.float32).reshape(NB * B, F) * 1e-3
    # scalar-prefetch array selecting which row-block each grid step reads
    sel = jnp.array(np.random.RandomState(0).permutation(NB), dtype=jnp.int32)

    def kernel(sel_ref, x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[pl.BlockSpec((B, F), lambda i, sel: (sel[i], 0))],
        out_specs=pl.BlockSpec((B, F), lambda i, sel: (i, 0)),
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB * B, F), jnp.float32),
    )
    t0 = time.time()
    try:
        y = jax.jit(fn)(sel, x)
        y.block_until_ready()
        dt = time.time() - t0
        xs = np.asarray(x).reshape(NB, B, F)
        expect = (xs[np.asarray(sel)] * 2.0).reshape(NB * B, F)
        ok = np.allclose(np.asarray(y), expect)
        print(f"scalar-prefetch index_map COMPILED in {dt:.1f}s, correct={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"scalar-prefetch index_map FAILED after {time.time()-t0:.1f}s: {type(e).__name__}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
