"""Block-dense SpMM hypothesis test on the clustered graph, real chip.

At ~2400 edges per (512,512) cell, the one-hot formulation costs
2*(R+W)*F per EDGE while a materialized dense-cell matmul costs
2*R*W*F per CELL — crossover at R*W/(R+W) = 256 edges/cell, so our
dense cells are ~9x cheaper as real matmuls. A_cells for hop1 is
~4100 cells x 512KB(bf16) = ~2GB HBM. The MXU rounds f32 operands to
bf16 regardless (measured, DESIGN §2d), so bf16 A storage changes
nothing numerically vs the one-hot kernel.

Measures, vs the current hybrid hop1 (dense one-hot + XLA rest):
  - block-dense einsum hop1 dense part (XLA: gather stripes ->
    batched matmul -> segment-sum over row blocks)
  - max |err| vs the XLA segment oracle on the same dense edge set
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
    from sgc_tpu.ops.spmm import spmm_segment
    from sgc_tpu.utils.profiling import bench_timeit

    print("backend:", jax.default_backend(), flush=True)
    scale = float(os.environ.get("SGC_BENCH_SCALE", "1.0"))
    data = synthetic_reddit_clustered(scale, shuffle=True, device=False)
    plan = LocalityPlan.build(*data, formulation="onehot")
    split = plan.split_main
    dense = split.tiled  # TiledGraph of the admitted cells
    print(f"dense edges {split.dense_edges} cells grid "
          f"{dense.cell_nchunks.shape} nonempty "
          f"{(dense.cell_nchunks > 0).sum()}", flush=True)

    R, W = dense.row_block, dense.stripe
    n_rb, n_st = dense.cell_nchunks.shape
    nonempty = np.argwhere(np.asarray(dense.cell_nchunks) > 0)
    n_cells = len(nonempty)
    rb_ids = nonempty[:, 0].astype(np.int32)
    st_ids = nonempty[:, 1].astype(np.int32)

    # host-side A materialization (counting scatter over the tiled arrays
    # whose padding vals are 0 — they land in A as zeros, harmless)
    t0 = time.perf_counter()
    A = np.zeros((n_cells, R, W), np.float32)
    r = np.asarray(dense.rows).astype(np.int64)
    c = np.asarray(dense.cols).astype(np.int64)
    v = np.asarray(dense.vals)
    ci = r // R * n_st + c // W
    # map grid cell id -> compact id
    compact = np.full(n_rb * n_st, -1, np.int64)
    compact[rb_ids.astype(np.int64) * n_st + st_ids] = np.arange(n_cells)
    k = compact[ci]
    # padding edges have val 0 and in-cell coords; += accumulates dups
    np.add.at(A, (k, r % R, c % W), v)
    t_mat = time.perf_counter() - t0
    print(f"A materialized: {A.nbytes/1e9:.2f} GB f32, {t_mat:.1f}s host",
          flush=True)

    x = jnp.asarray(plan.features)
    n_rows = split.n_rows
    x_pad = jnp.pad(x, ((0, n_st * W - x.shape[0]), (0, 0)))
    A16 = jnp.asarray(A.astype(np.dtype("bfloat16")))
    st_d = jnp.asarray(st_ids)
    rb_d = jnp.asarray(rb_ids)

    @jax.jit
    def block_dense(xx, a, st, rb):
        # gather stripes in bf16 (the MXU rounds operands to bf16 anyway;
        # halves the materialized gather)
        xb = xx.astype(jnp.bfloat16).reshape(n_st, W, -1)
        xg = jnp.take(xb, st, axis=0)               # [n_cells, W, F] bf16
        out = jnp.einsum(
            "crw,cwf->crf", a, xg,
            preferred_element_type=jnp.float32)
        blocks = jax.ops.segment_sum(out, rb, num_segments=n_rb)
        return blocks.reshape(n_rb * R, -1)[:n_rows]

    y16 = bench_timeit("block-dense hop1 (bf16 A)",
                       lambda: block_dense(x_pad, A16, st_d, rb_d))

    # oracle: XLA segment over the same dense edge set
    from sgc_tpu.graph.sparse import SparseGraph

    real = v != 0
    gsub = SparseGraph.from_coo(r[real], c[real], v[real],
                                n_rows=split.n_rows, n_cols=split.n_cols)
    oracle_fn = jax.jit(lambda xx: spmm_segment(gsub, xx))
    yo = bench_timeit("xla segment (same edges)", lambda: oracle_fn(x))

    a = np.asarray(y16)
    b = np.asarray(yo)
    rel = np.abs(a - b).max() / max(1e-9, np.abs(b).max())
    print(f"rel err bf16-A vs segment f32: {rel:.3e}", flush=True)

    # NOTE: an f32-A variant was tried here and OOM'd the 16 GB chip
    # (5.3 GB A + gather + out blocks -> ResourceExhausted), and the
    # killed client wedged the tunnel for hours. bf16 A is the design
    # point (same MXU rounding, half the bytes) — do not re-add.


if __name__ == "__main__":
    main()
