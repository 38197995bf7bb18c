"""COVID S^2 precompute through the locality formulation (real chip).

VERDICT round-2 #6: the COVID doc-word graph (24K nodes / ~10M nnz)
still ran the segment path; measure the block-dense formulation on it.
The graph is bipartite-ish (doc-word TF-IDF blocks B/C spread mass
broadly; the word-word PMI block D is the clusterable part), so this is
the honest stress of the per-cell admission model on a structure the
headline graph doesn't have — a documented negative result is an
acceptable outcome.

Times `text_structural_features` (the hot precompute,
reference downstream/TextSGC/utils.py:131-152) for each impl in
{sparse, blockdense, dense-if-it-fits} on the real backend, and checks
the feature agreement + downstream test accuracy.

Reuses the corpus+graph build cache of run_covid_ref_folds.py
(--run-dir, default /tmp/covid_locality).
"""

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGC_TPU_COMPILE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", default="/tmp/covid_locality")
    ap.add_argument("--impls", nargs="+",
                    default=["sparse", "blockdense"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["SGC_TPU_COMPILE_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend: {jax.default_backend()}")

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__))))
    from run_covid_ref_folds import build_graph

    run_dir = Path(args.run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    data_dir = build_graph(run_dir)

    from sgc_tpu.data.textcorpus import load_corpus
    from sgc_tpu.ops.propagate import text_structural_features

    data = load_corpus("covid_19_production", subset="BCD",
                       data_path=str(data_dir))
    log(f"covid graph: {data.graph.n_rows} nodes, {data.graph.nnz} nnz")

    ref = None
    for impl in args.impls:
        t0 = time.perf_counter()
        try:
            feats, pre_s = text_structural_features(
                data.graph, data.index_dict, degree=2, impl=impl)
        except Exception as exc:
            log(f"{impl}: FAILED {type(exc).__name__}: {exc}")
            continue
        wall = time.perf_counter() - t0
        info = ""
        if impl == "blockdense":
            from sgc_tpu.ops.spmm_blockdense import split_block_dense

            w = max(len(i) for i in data.index_dict.values())
            s = split_block_dense(data.graph, w)
            info = (f"[{s.n_cells} cells, dense_frac "
                    f"{s.dense_edges/(s.dense_edges+s.sparse_edges):.2f}]")
        err = ""
        if ref is None:
            ref = feats
        else:
            m = max(float(np.abs(np.asarray(ref["train"])).max()), 1e-9)
            e = float(np.abs(np.asarray(feats["train"])
                             - np.asarray(ref["train"])).max()) / m
            err = f" rel_err_vs_{args.impls[0]} {e:.1e}"
        log(f"{impl}: precompute {pre_s:.3f}s (wall+compile {wall:.0f}s)"
            f" {info}{err}")


if __name__ == "__main__":
    main()
