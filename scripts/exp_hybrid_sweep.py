"""(row_block, stripe, feature_tile) sweep of the hybrid hop on the
CLUSTERED graph — the headline bench's operating point.

exp_hybrid_breakdown measured hop1 dense at ~134 Tflop/s effective
(68% MXU peak at 512/512/ft256). Two levers:
  * smaller cells cut the one-hot cost 2*(R+W)*F_eff per edge linearly,
    traded against chunk padding (every cell pads to a 1024 multiple);
  * feature_tile=256 pads F=602 -> 768 columns (3 tiles); ft in
    {128, 320, 640} divides the 640 f32-pad exactly (17% less work).

Times hop1 (full hybrid program: MXU dense + XLA rest) per config; the
split is rebuilt per (rb, w) since the cost-model threshold moves.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGC_TPU_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

CONFIGS = [
    # (row_block, stripe, feature_tile). ft must be a 128-multiple
    # (lane width); ft=128 pads 602 -> 640 columns (exact 5 tiles) where
    # ft=256 pads to 768 (3 tiles, 17% more MXU work; extra edge
    # re-reads at ~819GB/s are ~1ms — noise).
    (512, 512, 256),    # current bench operating point (baseline)
    (512, 512, 128),    # exact-divisor feature tile
    (256, 256, 128),    # smaller cells: half the flops/edge, more pad
    (256, 512, 128),
    (512, 256, 128),
    (1024, 1024, 128),  # larger cells: more flops/edge, less pad
]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["SGC_TPU_COMPILE_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from sgc_tpu.data.synthetic import synthetic_reddit_clustered
    from sgc_tpu.graph.reorder import lpa_order, apply_order
    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.ops.spmm_hybrid import (hybrid_bind, hybrid_device_args,
                                         split_dense_cells,
                                         spmm_hybrid_split)
    from sgc_tpu.utils.profiling import sync
    import scipy.sparse as sp

    print("backend:", jax.default_backend(), flush=True)
    scale = float(os.environ.get("SGC_BENCH_SCALE", "1.0"))
    graph, feats, labels, idx_train = synthetic_reddit_clustered(
        scale, shuffle=True, device=False)
    nnz = graph.nnz
    adj = sp.coo_matrix(
        (np.asarray(graph.vals)[:nnz],
         (np.asarray(graph.rows)[:nnz], np.asarray(graph.cols)[:nnz])),
        shape=graph.shape).tocsr()
    order = lpa_order(adj)
    adj_p, feats_p = apply_order(adj, order, feats)
    graph_p = SparseGraph.from_scipy(adj_p.tocoo(), device=False)
    x = jnp.asarray(feats_p)
    nf = feats_p.shape[1]
    print(f"graph ready: {graph_p.nnz} edges, F={nf}", flush=True)

    results = []
    for rb, w, ft in CONFIGS:
        t0 = time.perf_counter()
        split = split_dense_cells(graph_p, nf, rb, w)
        split_s = time.perf_counter() - t0
        args = hybrid_device_args(split)
        fn = jax.jit(lambda xx, a, s=split, f=ft: spmm_hybrid_split(
            hybrid_bind(s, a), xx, feature_tile=f, interpret=False))
        row = {"rb": rb, "w": w, "ft": ft,
               "dense_frac": round(split.dense_edges / graph_p.nnz, 3),
               "pad": round(split.pad, 3),
               "min_fill": round(split.min_fill, 4),
               "split_s": round(split_s, 1)}
        try:
            y = fn(x, args)
            sync(y)
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                y = fn(x, args)
                sync(y)
                ts.append(time.perf_counter() - t0)
            row["hop_s"] = round(min(ts), 4)
            row["edges_per_s_M"] = round(graph_p.nnz / min(ts) / 1e6, 1)
        except Exception as ex:
            row["error"] = str(ex).splitlines()[0][:140]
        print(json.dumps(row), flush=True)
        results.append(row)

    good = [r for r in results if "hop_s" in r]
    if good:
        print("BEST:", json.dumps(min(good, key=lambda r: r["hop_s"])),
              flush=True)


if __name__ == "__main__":
    main()
