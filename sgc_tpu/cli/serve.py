"""Serving CLI: load a trained head + features, expose the HTTP endpoint.

    # train and export artifacts first, e.g.:
    #   save_params("model.npz", params); np.save("feats.npy", feats)
    python -m sgc_tpu.cli.serve --params model.npz --features feats.npy \
        --port 8787

POST /predict {"node_ids": [..]} returns argmax classes; /healthz reports
latency stats (p50/p99). See sgc_tpu/serve/ for the engine details.

``--bench`` measures the engine on the current backend instead of
serving: a Reddit-scale transductive store (232,965 x 602 — the shape
the reference's eval path serves, reference citation.py:60-70 /
reddit.py:66-72), random-id batches swept over the bucket sizes, one
JSON line with p50/p99 latency and rows/s per (variant, batch):

    python -m sgc_tpu.cli.serve --bench                # f32 + int8
    python -m sgc_tpu.cli.serve --bench --variants f32,int8,shard,inductive

On a tunneled backend every request pays the tunnel round-trip; the
reported ``dispatch_floor_ms`` (a trivial device program's round-trip)
is the latency floor the engine numbers must be read against.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _bench_variant(name: str, engine, batches, reps: int,
                   pipeline_depth: int = 2) -> list[dict]:
    rng = np.random.default_rng(0)
    n_nodes = engine._n_nodes          # true rows (excludes shard pads)
    out = []
    for b in batches:
        # fresh stats window per (variant, batch)
        from sgc_tpu.serve.engine import Stats

        engine.stats = Stats()
        ids_list = [rng.integers(0, n_nodes, size=b) for _ in range(reps)]
        first = engine.predict_logits(ids_list[0])  # warm bucket program
        engine.stats = Stats()
        t0 = time.perf_counter()
        for ids in ids_list:
            engine.predict_logits(ids)
        wall = time.perf_counter() - t0
        s = engine.stats
        row = {
            "variant": name,
            "batch": int(b),
            "requests": s.requests,
            "p50_ms": round(s.percentile_ms(50), 2),
            "p99_ms": round(s.percentile_ms(99), 2),
            "mean_ms": round(s.mean_latency_ms, 2),
            "rows_per_s": int(s.rows / wall),
        }

        # pipelined pass over the SAME batches (VERDICT round-4 #5):
        # depth in-flight dispatches overlap the per-round-trip floor;
        # outputs must match the blocking path bitwise (same programs,
        # same inputs — only the scheduling differs). Inductive mode is
        # excluded from the equality check (its PRNG key advances per
        # call, so replaying the ids is a different sample by design).
        engine.stats = Stats()
        t0 = time.perf_counter()
        outs = list(engine.predict_logits_stream(
            ids_list, depth=pipeline_depth))
        pwall = time.perf_counter() - t0
        ps = engine.stats
        row.update({
            "pipeline_depth": pipeline_depth,
            "rows_per_s_pipelined": int(ps.rows / pwall),
            "p50_ms_pipelined": round(ps.percentile_ms(50), 2),
            "p99_ms_pipelined": round(ps.percentile_ms(99), 2),
        })
        if engine._mode == "transductive":
            row["pipelined_bitwise_equal"] = bool(
                np.array_equal(outs[0], first))
        log(f"  {name} batch={b}: p50 {row['p50_ms']}ms "
            f"p99 {row['p99_ms']}ms  {row['rows_per_s']} rows/s | "
            f"pipelined {row['rows_per_s_pipelined']} rows/s "
            f"(p50 {row['p50_ms_pipelined']}ms)")
        out.append(row)
    return out


def run_bench(a) -> None:
    import jax

    from sgc_tpu.models.sgc import init_sgc
    from sgc_tpu.serve import EngineConfig, InferenceEngine
    from sgc_tpu.utils.profiling import sync

    n, f, c = a.bench_nodes, 602, 41
    log(f"jax backend: {jax.default_backend()}, devices: {jax.devices()}")
    log(f"store: {n} x {f} f32 ({n * f * 4 / 1e9:.2f} GB), {c} classes")
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((n, f)).astype(np.float32)
    params = init_sgc(jax.random.PRNGKey(0), f, c, bias=True)

    # the per-program round-trip floor of this backend (DESIGN §2d): on a
    # tunneled TPU it is ~30 ms and dominates small-batch latency.
    # device_put the operand ONCE — a host numpy jit arg re-transfers
    # every call over the tunnel and would inflate the floor
    fn = jax.jit(lambda v: v * 2.0 + 1.0)
    v = jax.device_put(np.ones((8, 128), np.float32))
    sync(fn(v))
    floor = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn(v))
        floor = min(floor, time.perf_counter() - t0)

    batches = [1, 8, 64, 512, a.max_batch]
    batches = sorted({b for b in batches if b <= a.max_batch})
    variants = a.variants.split(",")
    known = {"f32", "int8", "shard", "inductive"}
    bad = [v for v in variants if v not in known]
    if bad:
        raise SystemExit(
            f"unknown --variants {bad}: expected a subset of {sorted(known)}"
        )
    results = []
    for name in variants:
        if name == "inductive":
            # unseen-node serving: fixed-fanout sampled propagation over
            # the graph per request (the serving analog of reference
            # reddit.py's inductive eval) — needs the graph on device
            from sgc_tpu.data.synthetic import synthetic_reddit

            log("variant inductive: building graph (device transfer)...")
            graph, raw, _, _ = synthetic_reddit(n / 232_965)
            import jax.numpy as jnp

            graph = jax.tree_util.tree_map(jnp.asarray, graph)
            cfg = EngineConfig(max_batch=a.max_batch, warmup=False,
                               fanouts=(25, 10))
            engine = InferenceEngine(
                params, graph=graph, raw_features=np.asarray(raw),
                config=cfg)
        else:
            cfg = EngineConfig(
                max_batch=a.max_batch,
                quantize_int8=(name == "int8"),
                shard_store=(name == "shard"),
                warmup=False,        # per-bucket warm happens in the sweep
            )
            log(f"variant {name}: building engine...")
            engine = InferenceEngine(params, features=feats, config=cfg)
        results.extend(_bench_variant(name, engine, batches, a.reps,
                                      pipeline_depth=a.pipeline_depth))
        del engine

    big = max(r["rows_per_s"] for r in results
              if r["batch"] == max(batches))
    big_p = max(r.get("rows_per_s_pipelined", 0) for r in results
                if r["batch"] == max(batches))
    print(json.dumps({
        "metric": "serve_rows_per_s_max_batch",
        "value": big,
        "value_pipelined": big_p,
        "unit": "rows/s",
        "backend": jax.default_backend(),
        "dispatch_floor_ms": round(floor * 1e3, 2),
        "pipeline_depth": a.pipeline_depth,
        "store": {"nodes": n, "features": f, "classes": c},
        "results": results,
    }))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--params", help="save_params artifact (.npz + .treedef)")
    p.add_argument("--features", help=".npy of precomputed S^K X features")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--max_batch", type=int, default=1024)
    p.add_argument("--bench", action="store_true",
                   help="measure the engine on this backend (no server)")
    p.add_argument("--bench_nodes", type=int, default=232_965,
                   help="--bench store rows (default: Reddit scale)")
    p.add_argument("--variants", default="f32,int8",
                   help="--bench engine variants (f32,int8,shard,inductive)")
    p.add_argument("--reps", type=int, default=30,
                   help="--bench requests per (variant, batch)")
    p.add_argument("--pipeline_depth", type=int, default=2,
                   help="--bench in-flight dispatches for the pipelined "
                        "pass (predict_logits_stream)")
    a = p.parse_args()

    if a.bench:
        run_bench(a)
        return

    if not a.params or not a.features:
        p.error("--params and --features are required (or use --bench)")

    from sgc_tpu.serve import EngineConfig, InferenceEngine
    from sgc_tpu.serve.http import serve
    from sgc_tpu.utils.checkpoint import load_params

    params = load_params(a.params)
    feats = np.load(a.features)
    engine = InferenceEngine(
        params, features=feats, config=EngineConfig(max_batch=a.max_batch)
    )
    server = serve(engine, host=a.host, port=a.port)
    host, port = server.server_address[:2]
    print(f"serving {feats.shape[0]} nodes on http://{host}:{port} "
          f"(mode={engine._mode})", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
