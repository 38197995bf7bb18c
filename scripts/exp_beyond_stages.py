"""Per-stage RSS attribution for the beyond-one-device path (dev probe).

Replays fit_sharded's stages inline (staging, halo build, hop1, hop2,
head epochs) and logs current VmRSS after each, so the peak in
exp_beyond_device.py can be attributed and attacked.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cur_rss():
    with open("/proc/self/statm") as fh:
        return int(fh.read().split()[1]) * 4096 / 2**30


def main(scale=0.25):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from exp_beyond_device import build_graph, class_signal_features
    from sgc_tpu.parallel.halo import build_halo
    from sgc_tpu.parallel.mesh import make_mesh
    from sgc_tpu.parallel.partition import partition_graph
    from sgc_tpu.parallel.spmm import spmm_sharded
    from sgc_tpu.parallel.staging import stage_rows

    def log(stage):
        print(f"{stage:28s} rss {cur_rss():6.2f} GiB  "
              f"t+{time.perf_counter()-t0:5.0f}s", flush=True)

    n = max(int(2_400_000 * scale), 4096)
    f = 2048 if scale >= 1.0 else max(int(2048 * scale), 64)
    t0 = time.perf_counter()
    log("start")
    graph = build_graph(n, 4, 8)
    log(f"graph ({graph.nnz} edges)")
    mesh = make_mesh(8, 1)
    pg = partition_graph(graph, 8)
    log("partition")
    halo = build_halo(pg, overlap=True)
    log("halo build")
    prov = class_signal_features(n, f, 16)
    x = stage_rows(mesh, prov, n_rows_padded=pg.n_rows_padded)
    jax.block_until_ready(x)
    log(f"staged x {x.shape}")
    h1 = spmm_sharded(mesh, pg, x, halo=halo)
    jax.block_until_ready(h1)
    log("hop1")
    h2 = spmm_sharded(mesh, pg, h1, halo=halo)
    jax.block_until_ready(h2)
    log("hop2")
    del h1
    from sgc_tpu.parallel.train import (
        init_sharded_state,
        make_sharded_train_step,
        place_node_targets,
    )

    labels = prov.labels(0, n)
    idx_train = np.arange(0, n, 10)
    y, m = place_node_targets(mesh, pg.n_rows_padded, labels, idx_train)
    state = init_sharded_state(mesh, jax.random.PRNGKey(0), int(h2.shape[1]),
                               16, lr=0.2, weight_decay=0.0)
    step = make_sharded_train_step(mesh, pg, degree=0, lr=0.2,
                                   weight_decay=0.0)
    for i in range(5):
        state, loss = step(state, h2, y, m)
    jax.block_until_ready(state.params.w)
    log("5 head epochs")

    from sgc_tpu.parallel.distributed import fetch_global

    w = fetch_global(state.params.w)
    b = fetch_global(state.params.b)
    log("fetch params")

    @jax.jit
    def logits_fn(x, w, b):
        return jnp.dot(x, w, preferred_element_type=jnp.float32) + b

    logits = fetch_global(logits_fn(h2, jnp.asarray(w), jnp.asarray(b)))
    log(f"final logits {logits.shape}")


if __name__ == "__main__":
    main(float(os.environ.get("SGC_BEYOND_SCALE", "0.25")))
