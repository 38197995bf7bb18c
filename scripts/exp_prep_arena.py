"""Trace host-prep allocations: which buffers hit the prewarmed arenas?

The round-5 split-stage fix came from this probe: per-stage minor-fault
deltas said ~0.6M fresh 4 KiB faults were landing inside the timed
split DESPITE a prewarmed pool. Tracing every ``zeros_hugepage`` call
(size, pool state, fault delta) showed (a) ``prewarm_pool`` releasing
arenas one-by-one let the next size slice the previous arena (pool one
arena short), and (b) the 0.56 GB reorder feature buffer stealing a
3.2 GB cell arena under unbounded loose reuse. Both are fixed
(utils/alloc.py); this script re-runs the trace end-to-end so a future
prep regression is attributable allocation-by-allocation.

Host-only (no TPU): runs the full-scale clustered synthetic through
``LocalityPlan.build(formulation="blockdense", calibrate=False)``.
Healthy machine: every traced call should show dminflt ~0.00M and
sub-second dt. SGC_PREP_SCALE=0.25 for a quick pass.

Expected output shape (degraded-state capture, after the fixes):

    zh 4.29GB pool=[] dt=29.0s dminflt=1.05M     <- prewarm (untimed)
    zh 3.22GB ... dt=18.2s dminflt=0.79M         <- prewarm
    zh 0.73GB ... dt=4.8s  dminflt=0.18M         <- prewarm
    zh 0.56GB dt=0.1s dminflt=0.00M              <- reorder features HIT
    zh 2.68GB dt=0.6s dminflt=0.00M              <- main cells HIT
    zh 1.74GB dt=0.4s dminflt=0.00M              <- final cells HIT
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SGC_TPU_ALLOC_POOL_GB", "10")


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import sgc_tpu.utils.alloc as alloc

    calls = []
    orig = alloc.zeros_hugepage

    def traced(n_elems, dtype):
        nbytes = int(n_elems) * np.dtype(dtype).itemsize
        free = [round(e[1] / 1e9, 2) for e in alloc._POOL
                if e[2]() is None]
        c0 = alloc.mem_counters()
        t0 = time.perf_counter()
        out = orig(n_elems, dtype)
        c1 = alloc.mem_counters()
        row = {"gb": round(nbytes / 1e9, 2),
               "free_arenas_gb": free,
               "dt_s": round(time.perf_counter() - t0, 2),
               "dminflt_m": round(c1["minflt_m"] - c0["minflt_m"], 2)}
        calls.append(row)
        log(f"zh {row['gb']}GB pool={free} dt={row['dt_s']}s "
            f"dminflt={row['dminflt_m']}M")
        return out

    alloc.zeros_hugepage = traced
    # the call sites import the symbol lazily from the module, so the
    # module-attribute patch above covers them

    from sgc_tpu.data.synthetic import synthetic_reddit_clustered
    from sgc_tpu.graph.locality import LocalityPlan

    scale = float(os.environ.get("SGC_PREP_SCALE", "1.0"))
    log(f"building clustered synthetic (scale {scale})...")
    graph, features, labels, idx_train = synthetic_reddit_clustered(
        scale, shuffle=True, device=False)

    t = alloc.prewarm_pool(
        [int(b * min(scale, 1.0))
         for b in ((4 << 30), (3 << 30), (700 << 20))])
    n_prewarm = len(calls)
    log(f"prewarm {t:.1f}s")

    t0 = time.perf_counter()
    plan = LocalityPlan.build(graph, features, labels, idx_train,
                              formulation="blockdense", calibrate=False)
    build_s = time.perf_counter() - t0

    timed = calls[n_prewarm:]
    print(json.dumps({
        "build_s": round(build_s, 1),
        "prep_seconds": {k: (round(v, 2) if isinstance(v, float) else v)
                         for k, v in plan.prep_seconds.items()},
        "prewarm_s": round(t, 1),
        "prewarm_calls": calls[:n_prewarm],
        "timed_calls": timed,
        # the pass/fail summary: buffers inside the timed region must
        # not pay fresh faults once the arenas exist
        "timed_fault_m_total": round(
            sum(c["dminflt_m"] for c in timed), 2),
        "all_timed_hit_arena": all(c["dminflt_m"] < 0.05 for c in timed),
    }))


if __name__ == "__main__":
    main()
