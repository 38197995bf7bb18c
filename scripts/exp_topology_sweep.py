"""Topology-sensitivity sweep: formulation="auto" must never lose.

VERDICT round-2 #4: the headline graph (85% intra, 50 communities) is
favorable by construction, and nothing showed the auto-selected
formulation never loses on OTHER topologies. This sweep builds a grid of
clustered synthetics — intra fraction x community count x degree-tail
shape — plus the structureless uniform graph, and times on each:

  * the pure XLA segment path (2 hops, final-hop row subset — the
    bench.py uniform-leg program), and
  * the auto-selected LocalityPlan pipeline (calibrated admission).

PASS criterion per config: auto <= segment * (1 + MARGIN) with
MARGIN=0.15 (one extra dispatch + split bookkeeping on structureless
graphs; anything materially slower means the admission model admitted
cells it shouldn't have).

Writes one JSON line per config to stdout and a summary table to stderr
(rows feed the DESIGN.md §2e sensitivity table).

Usage: python scripts/exp_topology_sweep.py [--scale 0.25] [--quick]
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

MARGIN = 0.15


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_segment(graph, graph_final, x, sync):
    import jax

    from sgc_tpu.ops.spmm import spmm

    # place edge arrays ONCE: host-resident numpy jit args re-transfer
    # on every call (measured: 0.94 s/rep at 0.25 scale vs 0.14 s of
    # compute — would unfairly inflate the segment baseline)
    graph = jax.device_put(graph)
    graph_final = jax.device_put(graph_final)

    @jax.jit
    def hops(xx, g1, g2):
        return spmm(g2, spmm(g1, xx, impl="segment"), impl="segment")

    sync(hops(x, graph, graph_final))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        sync(hops(x, graph, graph_final))
        best = min(best, time.perf_counter() - t0)
    return best


def time_auto(plan, x, sync):
    import jax

    khop, dev_args = plan.khop_traceable(degree=2, interpret=False)
    fn = jax.jit(khop)
    sync(fn(x, dev_args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        sync(fn(x, dev_args))
        best = min(best, time.perf_counter() - t0)
    return best


def run_config(name, data, results):
    import jax.numpy as jnp

    from sgc_tpu.graph.locality import LocalityPlan
    from sgc_tpu.utils.profiling import sync

    graph, features, labels, idx_train = data
    x = jnp.asarray(features)

    seg_s = time_segment(graph, graph.row_subgraph(idx_train), x, sync)

    t0 = time.perf_counter()
    plan = LocalityPlan.build(graph, features, labels, idx_train,
                              formulation="auto", calibrate=True)
    plan_s = time.perf_counter() - t0
    auto_s = time_auto(plan, jnp.asarray(plan.features), sync)

    row = {
        "config": name,
        "nnz": graph.nnz,
        "segment_s": round(seg_s, 4),
        "auto_s": round(auto_s, 4),
        "ratio": round(auto_s / seg_s, 3),
        "formulation": plan.formulation,
        "dense_frac": round(plan.dense_fraction, 3),
        "plan_build_s": round(plan_s, 1),
        "pass": auto_s <= seg_s * (1 + MARGIN),
    }
    results.append(row)
    print(json.dumps(row), flush=True)
    log(f"{name:34s} seg {seg_s:.3f}s  auto {auto_s:.3f}s "
        f"({plan.formulation}, dense {plan.dense_fraction:.2f}) "
        f"{'PASS' if row['pass'] else 'FAIL'}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--quick", action="store_true",
                    help="3-config smoke (corners only)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["SGC_TPU_COMPILE_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"backend: {jax.default_backend()}  scale {args.scale}")

    from sgc_tpu.data.synthetic import (
        synthetic_reddit,
        synthetic_reddit_clustered,
    )

    grid = []
    intras = [0.5, 0.65, 0.85]
    comms = [10, 50, 200]
    if args.quick:
        combos = [(0.5, 200, "sq"), (0.85, 50, "sq"), (0.85, 50, "powerlaw")]
    else:
        combos = [(i, c, "sq") for i in intras for c in comms]
        combos += [(0.85, 50, "powerlaw"), (0.5, 200, "powerlaw")]
    for intra, c, tail in combos:
        grid.append((
            f"intra{intra}_comm{c}_{tail}",
            lambda intra=intra, c=c, tail=tail: synthetic_reddit_clustered(
                args.scale, shuffle=True, device=False,
                intra=intra, communities=c, tail=tail),
        ))
    grid.append(("uniform_structureless",
                 lambda: synthetic_reddit(args.scale)))

    results = []
    for name, gen in grid:
        log(f"building {name}...")
        run_config(name, gen(), results)

    n_fail = sum(not r["pass"] for r in results)
    log(f"\n{len(results) - n_fail}/{len(results)} configs pass "
        f"(auto <= segment * {1 + MARGIN})")
    if n_fail:
        log("FAILING: " + ", ".join(
            r["config"] for r in results if not r["pass"]))
        sys.exit(1)


if __name__ == "__main__":
    main()
