"""Probe: vectorized row gather inside a Pallas TPU kernel.

scripts/exp_gather_probe.py measured per-edge scalar loops at ~1-3 us
per iteration (Mosaic does not pipeline dynamic VMEM row ops), so the
only viable in-kernel gather is a single VECTORIZED op: does

    jnp.take(x_block, idx_vector, axis=0)        # (W,F) -> (C,F)

compile in a Pallas TPU kernel, and at what rate? If this lowers to a
hardware sublane gather, the SpMM kernel becomes
  gather rows (VPU) -> * vals -> one-hot scatter matmul (MXU, 2*R*F/edge)
which would roughly double the kernel's edge rate by dropping the
gather-side one-hot matmul (2*W*F/edge).

Forms tried, each reported independently:
  A  jnp.take(x, idx, axis=0)
  B  x[idx, :] advanced indexing
  C  jnp.take_along_axis(x, idx[:, None], axis=0) broadcast
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wcols", type=int, default=2048)
    p.add_argument("--f", type=int, default=768)
    p.add_argument("--chunk", type=int, default=1024)
    p.add_argument("--chunks", type=int, default=64)
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), flush=True)

    W, F, C, K = args.wcols, args.f, args.chunk, args.chunks
    rng = np.random.RandomState(0)
    idx = rng.randint(0, W, size=(K * C,)).astype(np.int32)
    x = rng.rand(W, F).astype(np.float32)

    def make(form):
        def kernel(idx_ref, x_ref, o_ref):
            ii = idx_ref[...]
            xs = x_ref[...]
            if form == "A":
                o_ref[...] = jnp.take(xs, ii, axis=0)
            elif form == "B":
                o_ref[...] = xs[ii, :]
            elif form == "C":
                # Mosaic's actual contract (lowering.py:2483): 2-D only,
                # indices.shape == operand.shape (+1 trailing), i.e. a
                # per-lane-column independent sublane gather. Requires
                # W == C.
                full = jnp.broadcast_to(ii[:, None], xs.shape)
                o_ref[...] = jnp.take_along_axis(xs, full, axis=0)

        return pl.pallas_call(
            kernel,
            grid=(K,),
            in_specs=[
                pl.BlockSpec((C,), lambda k: (k,)),
                pl.BlockSpec((W, F), lambda k: (0, 0)),
            ],
            out_specs=pl.BlockSpec((C, F), lambda k: (k, 0)),
            out_shape=jax.ShapeDtypeStruct((K * C, F), jnp.float32),
        )

    idx_d = jnp.asarray(idx)
    x_d = jnp.asarray(x)
    expect = x[idx]
    from sgc_tpu.utils.profiling import sync

    for form in ("A", "B", "C"):
        fn = jax.jit(make(form))
        t0 = time.time()
        try:
            y = fn(idx_d, x_d)
            y.block_until_ready()
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " ")[:300]
            print(f"{form} FAILED {time.time()-t0:.1f}s: "
                  f"{type(e).__name__}: {msg}", flush=True)
            continue
        err = float(np.max(np.abs(np.asarray(y) - expect)))
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            y = fn(idx_d, x_d)
        y.block_until_ready()
        sync(y)
        dt = (time.perf_counter() - t0) / args.repeats
        e = K * C
        print(f"{form} ok err={err:.1e}  {dt*1e3:.2f} ms "
              f"-> {dt/e*1e9:.1f} ns/row ({e/dt/1e6:.1f}M rows/s)",
              flush=True)


if __name__ == "__main__":
    main()
