"""Can the reorder pipeline recover community locality from shuffled ids?

The clustered synthetic (data/synthetic.py::synthetic_reddit_clustered)
emits community-ordered node ids. Real graphs arrive shuffled; the claim
that the hybrid SpMM's dense-cell dispatch applies to real clustered
graphs therefore rests on the reordering pass (graph/reorder.py)
recovering contiguous communities from arbitrary ids.

This script measures exactly that, host-side (no TPU needed): for each
ordering in {identity-on-shuffled, bfs, rcm, spectral, oracle} it reports
the hybrid split's dense_frac (fraction of edges routed to the MXU) and
pad at the bench tiling. Run: python scripts/exp_cluster_recovery.py
[--scale 0.25] [--intra 0.85]
"""
import argparse
import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")  # host-side study only


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=0.25)
    p.add_argument("--intra", type=float, default=0.85)
    p.add_argument("--orderings", default="shuffled,bfs,rcm,oracle")
    p.add_argument("--row-block", type=int, default=512)
    p.add_argument("--stripe", type=int, default=512)
    args = p.parse_args()

    from sgc_tpu.data.synthetic import synthetic_reddit_clustered
    from sgc_tpu.graph.reorder import fetch_ordering
    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.ops.spmm_hybrid import split_dense_cells

    graph, x, _, _ = synthetic_reddit_clustered(args.scale, intra=args.intra)
    n, f = x.shape
    rows = np.asarray(graph.rows)[: graph.nnz]
    cols = np.asarray(graph.cols)[: graph.nnz]
    vals = np.asarray(graph.vals)[: graph.nnz]

    rng = np.random.default_rng(0)
    shuf = rng.permutation(n)  # shuf[old] = new id

    def build(perm_old_to_new):
        return SparseGraph.from_coo(
            perm_old_to_new[rows], perm_old_to_new[cols], vals,
            n_rows=n, n_cols=n)

    shuffled = build(shuf)
    adj_shuffled = sp.coo_matrix(
        (vals, (shuf[rows], shuf[cols])), shape=(n, n)).tocsr()

    for name in args.orderings.split(","):
        t0 = time.time()
        if name == "oracle":
            g = graph  # the generator's community ordering
        elif name == "shuffled":
            g = shuffled
        else:
            order = fetch_ordering(name)(adj_shuffled)  # order[i] = old id
            inv = np.empty(n, np.int64)
            inv[order] = np.arange(n)
            g = build(inv[shuf])
        t_order = time.time() - t0
        split = split_dense_cells(
            g, f, row_block=args.row_block, stripe=args.stripe)
        print(json.dumps({
            "ordering": name, "scale": args.scale, "intra": args.intra,
            "order_s": round(t_order, 2),
            "dense_frac": round(split.dense_edges / max(1, graph.nnz), 4),
            "pad": round(split.pad, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
