"""End-to-end bench candidate: clustered Reddit, LPA reorder, hybrid SpMM.

Pipeline (mirrors what bench.py would do on a community-structured graph,
which is real Reddit's topology — posts co-commented by shared users
cluster by subreddit; Cluster-GCN partitions real Reddit with a tiny cut):

  host prep (untimed, like the reference's scipy normalization):
    synthetic_reddit_clustered(shuffle=True)  — arbitrary node ids
    lpa_order          — community discovery (graph/reorder.py)
    row_subgraph       — exact dead-row elimination for hop 2
    split_dense_cells  — cost-model MXU/XLA split (ops/spmm_hybrid.py)
  timed (same contract as bench.py: 2 SpMM hops + 2 LBFGS epochs):
    hop1 hybrid -> hop2 hybrid -> _lbfgs_linear_fit

Run on the TPU: python scripts/exp_bench_clustered.py [--scale 1.0]
[--intra 0.85] [--precision bf16,f32] [--repeats 3]
Emits one JSON line per (precision) with timings + split diagnostics.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGC_TPU_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--intra", type=float, default=0.85)
    p.add_argument("--precision", default="bf16,f32")
    p.add_argument("--row-block", type=int, default=512)
    p.add_argument("--stripe", type=int, default=512)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--xla-baseline", action="store_true",
                   help="also time the pure segment path on this graph")
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["SGC_TPU_COMPILE_CACHE"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import scipy.sparse as sp

    from sgc_tpu.data.synthetic import synthetic_reddit_clustered
    from sgc_tpu.graph.normalize import aug_normalized_adjacency  # noqa: F401
    from sgc_tpu.graph.reorder import apply_order, lpa_order, remap_indices
    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.models.sgc import init_sgc
    from sgc_tpu.ops.spmm import spmm_segment
    from sgc_tpu.ops.spmm_hybrid import split_dense_cells, spmm_hybrid_split
    from sgc_tpu.train.loops import _lbfgs_linear_fit
    from sgc_tpu.utils.profiling import sync

    print("backend:", jax.default_backend(), flush=True)

    # ---- host prep (untimed) ----
    t0 = time.time()
    graph, features, labels, idx_train = synthetic_reddit_clustered(
        args.scale, intra=args.intra, shuffle=True)
    gen_s = time.time() - t0

    rows = np.asarray(graph.rows)[: graph.nnz]
    cols = np.asarray(graph.cols)[: graph.nnz]
    vals = np.asarray(graph.vals)[: graph.nnz]
    adj = sp.coo_matrix((vals, (rows, cols)),
                        shape=(graph.n_rows, graph.n_cols)).tocsr()

    t0 = time.time()
    order = lpa_order(adj)
    lpa_s = time.time() - t0
    t0 = time.time()
    adj_p, features, labels = apply_order(adj, order, features, labels)
    idx_train = np.sort(remap_indices(order, idx_train))
    graph = SparseGraph.from_scipy(adj_p.tocoo())
    apply_s = time.time() - t0

    t0 = time.time()
    graph_hop2 = graph.row_subgraph(idx_train)
    sub_s = time.time() - t0

    t0 = time.time()
    split1 = split_dense_cells(graph, features.shape[1],
                               args.row_block, args.stripe)
    split2 = split_dense_cells(graph_hop2, features.shape[1],
                               args.row_block, args.stripe)
    split_s = time.time() - t0
    print(f"prep: gen {gen_s:.1f}s lpa {lpa_s:.1f}s apply {apply_s:.1f}s "
          f"subgraph {sub_s:.1f}s split {split_s:.1f}s | dense_frac "
          f"hop1 {split1.dense_edges/graph.nnz:.3f} "
          f"hop2 {split2.dense_edges/max(1,graph_hop2.nnz):.3f} "
          f"pad {split1.pad:.3f}/{split2.pad:.3f}", flush=True)

    x = jnp.asarray(features)
    labels_train = jnp.asarray(labels[idx_train])
    n_classes = int(labels.max()) + 1
    params0 = init_sgc(jax.random.PRNGKey(42), features.shape[1],
                       n_classes, bias=True)
    wd = jnp.asarray(0.0, jnp.float32)
    cw = jnp.ones((n_classes,), jnp.float32)

    # XLA f32 oracle for the hop outputs (rel_err accounting)
    seg1 = jax.jit(lambda xx, g=graph: spmm_segment(g, xx))
    seg2 = jax.jit(lambda xx, g=graph_hop2: spmm_segment(g, xx))

    if args.xla_baseline:
        r = seg2(seg1(x)); sync(r)
        t0 = time.perf_counter()
        tr = seg2(seg1(x))
        pxla, _ = _lbfgs_linear_fit(params0, tr, labels_train, wd, cw,
                                    2, False, False, 1.0)
        sync(pxla)
        xla_total = time.perf_counter() - t0
        print(json.dumps({"impl": "xla_segment", "scale": args.scale,
                          "intra": args.intra,
                          "total_s": round(xla_total, 4)}), flush=True)

    ref = None
    for prec in args.precision.split(","):
        h1 = jax.jit(lambda xx, s=split1, pr=prec: spmm_hybrid_split(
            s, xx, interpret=False, precision=pr))
        h2 = jax.jit(lambda xx, s=split2, pr=prec: spmm_hybrid_split(
            s, xx, interpret=False, precision=pr))
        try:
            # warm (compile) once
            tr = h2(h1(x)); sync(tr)
            pw, _ = _lbfgs_linear_fit(params0, tr, labels_train, wd, cw,
                                      2, False, False, 1.0)
            sync(pw)

            if ref is None:
                ref = np.asarray(seg2(seg1(x)))
            err = float(np.max(np.abs(np.asarray(tr) - ref))
                        / max(1e-9, float(np.max(np.abs(ref)))))

            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                tr = h2(h1(x))
                params, _ = _lbfgs_linear_fit(
                    params0, tr, labels_train, wd, cw, 2, False, False, 1.0)
                sync(params)
                ts.append(time.perf_counter() - t0)
            # hop-only sub-timing
            t0 = time.perf_counter()
            tr = h2(h1(x)); sync(tr)
            hop_s = time.perf_counter() - t0
            print(json.dumps({
                "impl": f"hybrid_{prec}", "scale": args.scale,
                "intra": args.intra, "rb": args.row_block,
                "total_s": round(min(ts), 4), "hops_s": round(hop_s, 4),
                "rel_err_vs_xla_f32": float(f"{err:.2e}"),
                "dense_frac": round(split1.dense_edges / graph.nnz, 3),
                "edges": int(graph.nnz + graph_hop2.nnz),
                "edges_per_s": int((graph.nnz + graph_hop2.nnz) / hop_s),
                "prep_s": {"lpa": round(lpa_s, 1),
                           "split": round(split_s, 1)},
                "vs_baseline": round(2.7 / min(ts), 3),
            }), flush=True)
        except Exception as ex:  # noqa: BLE001
            print(json.dumps({"impl": f"hybrid_{prec}",
                              "error": str(ex).splitlines()[0][:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
