"""Is the serving dispatch floor overlappable over this backend?

VERDICT round-4 #5 asked for a double-buffered dispatch queue in the
serving engine (issue batch k+1 before fetching batch k) and a v5e
measurement — with an explicitly acceptable negative result if the
tunnel's round-trip floor turns out not to overlap. This script is that
experiment: one Reddit-scale f32 engine, fixed batch, blocking pass vs
``predict_logits_stream`` at depths 1/2/4/8, plus a raw-dispatch probe
(submit K programs back-to-back, then fetch all) that bounds what ANY
queueing scheme could achieve on this backend.

Run on the real TPU:  python scripts/exp_serve_pipeline.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("SGC_SERVE_BATCH", "1024"))
REPS = int(os.environ.get("SGC_SERVE_REPS", "40"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax

    from sgc_tpu.models.sgc import init_sgc
    from sgc_tpu.serve import EngineConfig, InferenceEngine
    from sgc_tpu.serve.engine import Stats

    n, f, c = 232_965, 602, 41
    log(f"backend {jax.default_backend()}; store {n}x{f} f32")
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    params = init_sgc(jax.random.PRNGKey(0), f, c, bias=True)
    eng = InferenceEngine(
        params, features=feats,
        config=EngineConfig(max_batch=BATCH, warmup=False))
    ids_list = [rng.integers(0, n, size=BATCH) for _ in range(REPS)]
    eng.predict_logits(ids_list[0])          # warm the bucket program

    out = {"batch": BATCH, "reps": REPS,
           "backend": jax.default_backend(), "rows_per_s": {}}

    eng.stats = Stats()
    t0 = time.perf_counter()
    for ids in ids_list:
        eng.predict_logits(ids)
    wall = time.perf_counter() - t0
    out["rows_per_s"]["blocking"] = int(BATCH * REPS / wall)
    log(f"blocking: {out['rows_per_s']['blocking']} rows/s "
        f"(p50 {eng.stats.percentile_ms(50):.1f}ms)")

    for depth in (1, 2, 4, 8):
        eng.stats = Stats()
        t0 = time.perf_counter()
        for _ in eng.predict_logits_stream(ids_list, depth=depth):
            pass
        wall = time.perf_counter() - t0
        key = f"stream_depth_{depth}"
        out["rows_per_s"][key] = int(BATCH * REPS / wall)
        log(f"{key}: {out['rows_per_s'][key]} rows/s "
            f"(p50 {eng.stats.percentile_ms(50):.1f}ms)")

    # upper bound for ANY queueing scheme: submit everything, fetch once.
    # If this does not beat blocking, the backend serializes round-trips
    # below the client and no engine-side pipelining can win.
    import jax.numpy as jnp

    padded = [eng._prep_ids(ids)[1] for ids in ids_list]
    t0 = time.perf_counter()
    futs = [eng._call(jnp.asarray(p)) for p in padded]
    for fut in futs:
        np.asarray(fut)
    wall = time.perf_counter() - t0
    out["rows_per_s"]["submit_all_then_fetch"] = int(BATCH * REPS / wall)
    log(f"submit_all_then_fetch: {out['rows_per_s']['submit_all_then_fetch']}"
        " rows/s")

    base = out["rows_per_s"]["blocking"]
    best = max(v for k, v in out["rows_per_s"].items() if k != "blocking")
    out["best_speedup"] = round(best / base, 3)
    out["overlappable"] = bool(best >= 1.3 * base)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
