"""Probe: per-edge dynamic-indexed gather-accumulate inside a Pallas kernel.

The one-hot MXU SpMM formulation costs 2*(W+R)*F flops per padded edge
(~7 Mflop/edge at the best full-scale tiling — caps at ~20M edges/s,
below the XLA segment path's 34M edges/s; scripts/exp_pad_study.py).
The alternative is a VPU formulation: keep the flat chunk schedule, hold
the x stripe + out block in VMEM, and for each edge do

    out[r, :] += v * x[c, :]

with r, c, v read per-edge from SMEM-resident chunk blocks. Per-edge
cost is then ~6 vector ops on (1, F) rows + addressing — potentially
50-100M edges/s, and NO chunk padding flops (padded edges can be
masked with v=0 slots cheaply).

This probe answers, on the real chip:
  P1  does an SMEM-block-specced int32 edge array + in-kernel fori_loop
      with dynamic VMEM row read/accumulate COMPILE?
  P2  is it CORRECT vs a numpy oracle (duplicate rows must accumulate)?
  P3  what is the sustained ns/edge (-> edges/s)?

Usage: python scripts/exp_gather_probe.py [--chunks 64] [--f 768]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=2048, help="out block rows")
    p.add_argument("--wcols", type=int, default=2048, help="x stripe rows")
    p.add_argument("--f", type=int, default=768)
    p.add_argument("--chunk", type=int, default=1024)
    p.add_argument("--chunks", type=int, default=64)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--mode", default="rmw",
                   choices=["rmw", "store", "fixed_out", "fixed_in",
                            "noop"],
                   help="isolate which per-edge op is slow: full "
                        "read-modify-write, plain store, fixed out row, "
                        "fixed in row, or loop overhead only")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("backend:", jax.default_backend(), flush=True)

    R, W, F, C, K = args.rows, args.wcols, args.f, args.chunk, args.chunks
    rng = np.random.RandomState(0)
    rows = rng.randint(0, R, size=(K * C,)).astype(np.int32)
    cols = rng.randint(0, W, size=(K * C,)).astype(np.int32)
    vals = rng.rand(K * C).astype(np.float32)
    x = rng.rand(W, F).astype(np.float32)

    def kernel(rows_ref, cols_ref, vals_ref, x_ref, o_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        mode = args.mode

        def body(i, _):
            r = rows_ref[i]
            c = cols_ref[i]
            v = vals_ref[i]
            if mode == "rmw":
                o_ref[pl.ds(r, 1), :] += v * x_ref[pl.ds(c, 1), :]
            elif mode == "store":
                o_ref[pl.ds(r, 1), :] = v * x_ref[pl.ds(c, 1), :]
            elif mode == "fixed_out":
                o_ref[pl.ds(0, 1), :] += v * x_ref[pl.ds(c, 1), :]
            elif mode == "fixed_in":
                o_ref[pl.ds(r, 1), :] += v * x_ref[pl.ds(0, 1), :]
            elif mode == "noop":
                o_ref[pl.ds(0, 1), :] += v * x_ref[pl.ds(0, 1), :]
            return _

        jax.lax.fori_loop(0, C, body, None)

    fn = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((C,), lambda k: (k,), memory_space=pltpu.SMEM),
            pl.BlockSpec((C,), lambda k: (k,), memory_space=pltpu.SMEM),
            pl.BlockSpec((C,), lambda k: (k,), memory_space=pltpu.SMEM),
            pl.BlockSpec((W, F), lambda k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((R, F), lambda k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
    )

    def run(rr, cc, vv, xx):
        return fn(rr, cc, vv, xx)

    jr = jax.jit(run)
    # device-resident inputs: numpy args would re-upload ~MBs over the
    # tunnel on every call and swamp the kernel time
    rows_d, cols_d, vals_d, x_d = map(jnp.asarray, (rows, cols, vals, x))
    t0 = time.time()
    try:
        y = jr(rows_d, cols_d, vals_d, x_d)
        y.block_until_ready()
    except Exception as e:  # noqa: BLE001
        print(f"P1 COMPILE FAILED after {time.time()-t0:.1f}s: "
              f"{type(e).__name__}: {str(e)[:600]}", flush=True)
        return
    print(f"P1 compiled+ran in {time.time()-t0:.1f}s", flush=True)

    # P2 correctness: scatter-add oracle
    expect = np.zeros((R, F), np.float32)
    np.add.at(expect, rows, vals[:, None] * x[cols])
    got = np.asarray(y)
    err = np.max(np.abs(got - expect)) / max(1e-9, np.max(np.abs(expect)))
    print(f"P2 rel_err={err:.2e}", flush=True)

    # P3 throughput
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        y = jr(rows_d, cols_d, vals_d, x_d)
    y.block_until_ready()
    from sgc_tpu.utils.profiling import sync
    sync(y)
    dt = (time.perf_counter() - t0) / args.repeats
    e = K * C
    print(f"P3 {dt*1e3:.2f} ms for {e} edges -> {dt/e*1e9:.1f} ns/edge "
          f"({e/dt/1e6:.1f}M edges/s)", flush=True)


if __name__ == "__main__":
    main()
