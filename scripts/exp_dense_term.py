"""Dense-term optimization experiments on the real chip (round 3).

The roofline (ops/roofline.py) attributes the hops time between the
dense cell term and the segment remainder. This script attacks the
dense term:

  1. feature_tile sweep {256, 512, 768} for the Pallas block-dense
     kernel — n_ft multiplies CELL re-reads, so one 768-wide tile cuts
     cell traffic 3x vs 256 (VMEM at (512,768): cell 512KB + stripe
     768KB + out 1.5MB per block — far under 128 MB).
  2. bf16 x stripes (now default for precision="bf16") vs f32 — halves
     stripe traffic, numerically identical (MXU rounds operands).
  3. int8 cells with per-cell scale (VERDICT round-2 #8): halves cell
     HBM again; measures speed + max rel err vs the bf16 path.

Each timing is sync-closed, min of 3, dispatch floor printed alongside.
Usage: python scripts/exp_dense_term.py [--scale 1.0]
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["SGC_TPU_COMPILE_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sgc_tpu.data.synthetic import synthetic_reddit_clustered
    from sgc_tpu.graph.locality import LocalityPlan
    from sgc_tpu.ops.spmm_blockdense import spmm_blockdense_pallas
    from sgc_tpu.utils.profiling import sync

    log(f"backend: {jax.default_backend()}")
    data = synthetic_reddit_clustered(args.scale, shuffle=True, device=False)
    graph, features, labels, idx_train = data
    plan = LocalityPlan.build(graph, features, labels, idx_train,
                              formulation="blockdense_pallas",
                              calibrate=True)
    split = plan.split_main
    import dataclasses as dc

    dense_split = dc.replace(split, rest=None, sparse_edges=0)
    log(f"cells {split.n_cells} ({split.cell_bytes/1e9:.2f} GB bf16), "
        f"dense_frac {plan.dense_fraction:.3f}")

    x = jnp.asarray(plan.features)
    dense_args = (jnp.asarray(split.cells), jnp.asarray(split.rb_ids),
                  jnp.asarray(split.st_ids))

    def timed(fn, *a, reps=3):
        sync(fn(*a))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    # dispatch floor
    triv = jax.jit(lambda v: v * 2.0)
    disp = timed(triv, jnp.ones((8, 128), jnp.float32))
    log(f"dispatch floor {disp*1e3:.1f} ms")

    # 1+2: feature-tile sweep (bf16 stripes are the kernel default now).
    # Cells/ids ride as JIT ARGUMENTS — closing over them bakes 2.8 GB
    # of HLO constants into the lowering (~45 min of host CPU, measured
    # the hard way; the same trap hybrid_device_args documents).
    ref_row_sum = None
    for ft in (256, 512, 768):
        fn = jax.jit(lambda xx, a, ft=ft: spmm_blockdense_pallas(
            dense_split, xx, args=(a, None), feature_tile=ft,
            interpret=False))
        try:
            t = timed(fn, x, dense_args)
        except Exception as exc:
            log(f"feature_tile {ft}: FAILED {type(exc).__name__}")
            continue
        # compare a cheap on-device checksum, not a 700 MB pull
        row_sum = np.asarray(jnp.sum(fn(x, dense_args), axis=1))
        if ref_row_sum is None:
            ref_row_sum = row_sum
        err = (np.abs(row_sum - ref_row_sum).max()
               / max(np.abs(ref_row_sum).max(), 1e-9))
        log(f"feature_tile {ft}: {t*1e3:.1f} ms (net {1e3*(t-disp):.1f}) "
            f"rowsum_rel_err_vs_ft256 {err:.1e}")

    # 3: int8 cells + per-cell scale (chunked quantization: one 5.6 GB
    # f32 temporary would pay the fault wall, DESIGN §2e)
    k = int(split.cells.shape[0])
    R, W = split.row_block, split.stripe
    cells_i8 = np.empty((k, R, W), np.int8)
    scales = np.empty(k, np.float32)
    step = 256
    for i in range(0, k, step):
        cf = np.asarray(split.cells[i:i + step]).astype(np.float32)
        sc = np.maximum(np.abs(cf).max(axis=(1, 2)), 1e-30) / 127.0
        scales[i:i + step] = sc
        cells_i8[i:i + step] = np.clip(
            np.rint(cf / sc[:, None, None]), -127, 127).astype(np.int8)
    n_rb, n_st = split.n_row_blocks, split.n_stripes
    for ft in (256, 768):
        f_pad = (-x.shape[1]) % ft
        xp = jnp.pad(x, ((0, n_st * W - x.shape[0]), (0, f_pad))
                     ).astype(jnp.bfloat16)
        n_ft = xp.shape[1] // ft

        def kernel_i8(rb_ref, st_ref, sc_ref, a_ref, xs_ref, out_ref):
            kk = pl.program_id(1)

            @pl.when((kk == 0) | (rb_ref[kk] != rb_ref[jnp.maximum(kk - 1,
                                                                   0)]))
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            a = (a_ref[0].astype(jnp.float32) * sc_ref[kk]).astype(
                jnp.bfloat16)
            out_ref[...] += jnp.dot(a, xs_ref[...],
                                    preferred_element_type=jnp.float32)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_ft, k),
            in_specs=[
                pl.BlockSpec((1, R, W), lambda f, c, rb, st, sc: (c, 0, 0)),
                pl.BlockSpec((W, ft), lambda f, c, rb, st, sc: (st[c], f)),
            ],
            out_specs=pl.BlockSpec(
                (R, ft), lambda f, c, rb, st, sc: (rb[c], f),
                memory_space=pltpu.VMEM),
        )
        call = pl.pallas_call(
            kernel_i8, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rb * R, xp.shape[1]),
                                           jnp.float32))
        rb = jnp.asarray(split.rb_ids[:k])
        st = jnp.asarray(split.st_ids[:k])
        sc = jnp.asarray(scales.astype(np.float32))
        a8 = jnp.asarray(cells_i8)
        # all operands as jit arguments (constants-capture trap above)
        fn8 = jax.jit(lambda rb_, st_, sc_, a8_, xpp:
                      call(rb_, st_, sc_, a8_, xpp))
        try:
            t8 = timed(fn8, rb, st, sc, a8, xp)
        except Exception as exc:
            log(f"int8 ft{ft}: FAILED {type(exc).__name__}: {exc}")
            continue
        row8 = np.asarray(
            jnp.sum(fn8(rb, st, sc, a8, xp)[: split.n_rows, : x.shape[1]],
                    axis=1))
        err8 = (np.abs(row8 - ref_row_sum[: split.n_rows]).max()
                / max(np.abs(ref_row_sum).max(), 1e-9))
        log(f"int8 cells ft{ft}: {t8*1e3:.1f} ms (net {1e3*(t8-disp):.1f}) "
            f"rowsum_rel_err_vs_bf16 {err8:.1e}")


if __name__ == "__main__":
    main()
