"""Profile LocalityPlan.build host prep at full Reddit scale.

bench.py r2 measured 209.5s total around LocalityPlan.build while the
stage dict only accounts for ~104s — find the rest (suspects: the
scipy coo->csr at the top of build, SparseGraph.from_scipy copies,
tile_graph's host sort in split_dense_cells).
"""
import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from sgc_tpu.data.synthetic import synthetic_reddit_clustered  # noqa: E402
from sgc_tpu.graph.locality import LocalityPlan  # noqa: E402


def main():
    scale = float(os.environ.get("SGC_BENCH_SCALE", "1.0"))
    t0 = time.perf_counter()
    data = synthetic_reddit_clustered(scale, shuffle=True)
    print(f"synthetic build: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    prof = cProfile.Profile()
    prof.enable()
    plan = LocalityPlan.build(*data)
    prof.disable()
    print(f"plan build: {time.perf_counter() - t0:.1f}s "
          f"stages={plan.prep_seconds}", flush=True)
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
