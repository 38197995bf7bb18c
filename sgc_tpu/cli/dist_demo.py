"""Multi-process distributed training: launcher, worker, parity check.

The reference is single-process (SURVEY.md §2.5 — no NCCL/MPI anywhere);
this CLI exercises sgc_tpu's true multi-host (DCN) regime end to end
without pod hardware: it spawns N local worker processes, each a real
``jax.distributed`` process owning D virtual CPU devices, forms the
global N*D-device ("nodes","feat") mesh, and runs :func:`fit_sharded`
on a deterministic synthetic graph. It then runs the SAME fit on a
single-process mesh of the same global shape and reports the loss /
parameter deviation as JSON — multi-process collectives must reproduce
the single-process numbers.

    python -m sgc_tpu.cli.dist_demo --procs 2 --devices-per-proc 4

On a real multi-host pod, run one worker per host instead:

    python -m sgc_tpu.cli.dist_demo --worker --process-id <k> \
        --procs <H> --coordinator <host0>:<port> --out <file>

(or rely on pod env autodetection; parallel/scaling.py init_distributed.)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile


def _build_problem(seed: int, nodes: int, edges: int, features: int,
                   n_parts: int):
    """Deterministic clustered graph + features; identical in every process."""
    import numpy as np
    import scipy.sparse as sp

    from sgc_tpu.graph.normalize import aug_normalized_adjacency
    from sgc_tpu.graph.sparse import SparseGraph

    rng = np.random.default_rng(seed)
    n, e = nodes, edges
    block_size = -(-n // n_parts)
    src = rng.integers(0, n, e)
    same = rng.random(e) < 0.9
    local = (src // block_size) * block_size + (
        rng.integers(0, block_size, e)
    ) % np.maximum(
        np.minimum((src // block_size + 1) * block_size, n)
        - (src // block_size) * block_size,
        1,
    )
    dst = np.where(same, local, rng.integers(0, n, e))
    adj = sp.coo_matrix((np.ones(e, np.float32), (src, dst)), shape=(n, n))
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj + adj.T))
    x = rng.standard_normal((n, features)).astype(np.float32)
    y = rng.integers(0, 7, n).astype(np.int32)
    idx_train = np.arange(n // 2)
    return graph, x, y, idx_train


def _run_fit(a) -> dict:
    """Build the global mesh over all (possibly cross-process) devices,
    fit, and return a JSON-able result summary."""
    import numpy as np
    import jax

    from sgc_tpu.parallel.fit import fit_sharded
    from sgc_tpu.parallel.mesh import make_mesh

    n_total = len(jax.devices())
    n_feat = 2 if n_total % 2 == 0 and n_total >= 4 else 1
    mesh = make_mesh(n_total // n_feat, n_feat, jax.devices())
    graph, x, y, idx_train = _build_problem(
        a.seed, a.nodes, a.edges, a.features, n_total // n_feat
    )
    params, report = fit_sharded(
        graph, x, y, idx_train, n_classes=7, mesh=mesh,
        epochs=a.epochs, use_halo=a.use_halo,
    )
    return {
        "process_count": jax.process_count(),
        "n_devices": n_total,
        "losses": report.loss_history,
        "train_accuracy": report.train_accuracy,
        "halo_fraction": report.halo_fraction,
        "w_sum": float(np.abs(np.asarray(params.w)).sum()),
        "w_head": np.asarray(params.w)[0, :4].tolist(),
        "b": np.asarray(params.b).tolist(),
    }


def _worker(a) -> None:
    # sitecustomize may re-pin JAX_PLATFORMS at interpreter start; the
    # programmatic override below wins (same pattern as tests/conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={a.devices_per_proc}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sgc_tpu.parallel.distributed import scrub_single_host_tpu_env
    from sgc_tpu.parallel.scaling import init_distributed

    if a.procs > 1:
        scrub_single_host_tpu_env()
        init_distributed(
            coordinator_address=a.coordinator,
            num_processes=a.procs,
            process_id=a.process_id,
        )

    result = _run_fit(a)
    # every process participates in the collectives above; only one
    # writes (all have identical fully-replicated results)
    if jax.process_index() == 0 and a.out:
        with open(a.out, "w") as f:
            json.dump(result, f)
    if a.procs > 1:
        jax.distributed.shutdown()


def _launch(a) -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    for k in ("TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID", "TPU_ACCELERATOR_TYPE"):
        env.pop(k, None)

    tmp = tempfile.mkdtemp(prefix="sgc_dist_")
    base = [sys.executable, "-m", "sgc_tpu.cli.dist_demo", "--worker",
            "--procs", str(a.procs),
            "--devices-per-proc", str(a.devices_per_proc),
            "--coordinator", coordinator,
            "--nodes", str(a.nodes), "--edges", str(a.edges),
            "--features", str(a.features), "--epochs", str(a.epochs),
            "--seed", str(a.seed)]
    if a.halo:
        base.append("--halo")

    dist_out = os.path.join(tmp, "dist.json")
    procs = []
    for i in range(a.procs):
        flags = env.get("XLA_FLAGS", "")
        penv = dict(env)
        penv["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
                    f"{a.devices_per_proc}"
        ).strip()
        cmd = list(base) + ["--process-id", str(i)]
        if i == 0:
            cmd += ["--out", dist_out]
        procs.append(subprocess.Popen(cmd, env=penv))
    codes = [p.wait(timeout=a.timeout) for p in procs]
    if any(codes):
        print(json.dumps({"ok": False, "exit_codes": codes}))
        return 1

    # single-process run over the same global device count for parity
    ref_out = os.path.join(tmp, "single.json")
    penv = dict(env)
    penv["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count="
          f"{a.procs * a.devices_per_proc}"
    ).strip()
    cmd = [sys.executable, "-m", "sgc_tpu.cli.dist_demo", "--worker",
           "--procs", "1", "--process-id", "0",
           "--devices-per-proc", str(a.procs * a.devices_per_proc),
           "--nodes", str(a.nodes), "--edges", str(a.edges),
           "--features", str(a.features), "--epochs", str(a.epochs),
           "--seed", str(a.seed), "--out", ref_out]
    if a.halo:
        cmd.append("--halo")
    subprocess.run(cmd, env=penv, check=True, timeout=a.timeout)

    with open(dist_out) as f:
        dist = json.load(f)
    with open(ref_out) as f:
        single = json.load(f)

    import numpy as np

    loss_dev = float(np.max(np.abs(
        np.asarray(dist["losses"]) - np.asarray(single["losses"])
    )))
    b_dev = float(np.max(np.abs(
        np.asarray(dist["b"]) - np.asarray(single["b"])
    )))
    w_head_dev = float(np.max(np.abs(
        np.asarray(dist["w_head"]) - np.asarray(single["w_head"])
    )))
    ok = loss_dev < 1e-4 and b_dev < 1e-4 and w_head_dev < 1e-4
    print(json.dumps({
        "ok": bool(ok),
        "procs": a.procs,
        "devices_per_proc": a.devices_per_proc,
        "global_devices": dist["n_devices"],
        "process_count_seen": dist["process_count"],
        "halo_fraction": dist["halo_fraction"],
        "final_loss": dist["losses"][-1],
        "train_accuracy": dist["train_accuracy"],
        "max_loss_deviation_vs_single_process": loss_dev,
        "max_param_deviation_vs_single_process": max(b_dev, w_head_dev),
    }))
    return 0 if ok else 2


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--procs", type=int, default=2)
    p.add_argument("--devices-per-proc", type=int, default=4)
    p.add_argument("--nodes", type=int, default=4096)
    p.add_argument("--edges", type=int, default=40_000)
    p.add_argument("--features", type=int, default=64)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--halo", action="store_true",
                   help="force the halo-exchange path (default: auto)")
    p.add_argument("--timeout", type=float, default=600.0)
    p.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--process-id", type=int, default=0,
                   help=argparse.SUPPRESS)
    p.add_argument("--coordinator", default=None, help=argparse.SUPPRESS)
    p.add_argument("--out", default=None, help=argparse.SUPPRESS)
    a = p.parse_args()
    a.use_halo = True if a.halo else None

    if a.worker:
        _worker(a)
    else:
        sys.exit(_launch(a))


if __name__ == "__main__":
    main()
