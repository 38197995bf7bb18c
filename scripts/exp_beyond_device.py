"""Beyond-one-device capability demo (VERDICT r3 #6).

Builds a synthetic clustered graph whose propagation working set — the
f32 feature matrix alone — exceeds one TPU v5e's HBM (16 GiB), then
trains the SGC head with ``fit_sharded`` on the 8-device mesh using
per-shard host staging (``parallel/staging.py``): the full matrix never
exists in any single buffer, host or device. This is the first artifact
showing the framework doing something one chip cannot: the reference
(utils.py:104-131, reddit.py:43-47) loads the full feature matrix into
one GPU and is hard-capped by its memory.

Run (virtual 8-device CPU mesh; ~60 GB host RAM, several minutes):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/exp_beyond_device.py

Scale down for a smoke run: SGC_BEYOND_SCALE=0.05.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# defaults chosen so features alone (N * F * 4 bytes) > 16 GiB
N_NODES = 2_400_000
N_FEATURES = 2_048
N_CLASSES = 16
AVG_DEGREE = 4


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def rss_gib():
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def start_rss_tracer(t_start):
    """Log current VmRSS whenever it climbs >0.5 GiB above the last
    report — attributes the peak to a timeline stage via stderr."""
    import threading

    def cur():
        with open("/proc/self/statm") as fh:
            return int(fh.read().split()[1]) * 4096 / 2**30

    def run():
        last = 0.0
        while True:
            c = cur()
            if c > last + 0.5:
                log(f"[rss +{time.perf_counter()-t_start:.0f}s] "
                    f"{c:.1f} GiB")
                last = c
            time.sleep(0.25)

    threading.Thread(target=run, daemon=True).start()


class class_signal_features:
    """Synthetic provider + planted class signal: node i's class is its
    contiguous id block; columns [class*8, class*8+8) get a +0.75 boost
    so the propagated linear head has something real to learn."""

    def __init__(self, n_rows, n_cols, n_classes, seed=0):
        from sgc_tpu.parallel.staging import synthetic_features

        self._base = synthetic_features(n_rows, n_cols, seed=seed)
        self.shape = self._base.shape
        self.dtype = self._base.dtype
        self.n_classes = n_classes

    def labels(self, start, stop):
        return ((np.arange(start, stop, dtype=np.int64) * self.n_classes)
                // self.shape[0]).astype(np.int32)

    def __call__(self, start, stop):
        x = self._base(start, stop)
        y = self.labels(start, stop)
        cols = (y[:, None] * 8 + np.arange(8)[None, :]) % self.shape[1]
        np.put_along_axis(
            x, cols, np.take_along_axis(x, cols, axis=1) + 0.75, axis=1)
        return x


def build_graph(n, avg_degree, n_parts, seed=0):
    """Block-clustered graph: 97% of edges inside contiguous row blocks
    aligned with the partition (the regime the halo exchange exists for),
    3% crossing — Reddit-like community structure at 10x the node count."""
    import scipy.sparse as sp

    from sgc_tpu.graph.normalize import aug_normalized_adjacency
    from sgc_tpu.graph.sparse import SparseGraph

    rng = np.random.default_rng(seed)
    m = n * avg_degree // 2
    block = n // n_parts
    src = rng.integers(0, n, size=m, dtype=np.int64)
    intra = rng.random(m) < 0.97
    off = rng.integers(1, block, size=m, dtype=np.int64)
    dst = np.where(
        intra,
        (src // block) * block + (src % block + off) % block,
        rng.integers(0, n, size=m, dtype=np.int64),
    )
    keep = src != dst
    src, dst = src[keep], dst[keep]
    adj = sp.coo_matrix(
        (np.ones(len(src), np.float32), (src, dst)), shape=(n, n))
    adj = adj + adj.T
    return SparseGraph.from_scipy(aug_normalized_adjacency(adj))


def main(scale=1.0, epochs=5):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sgc_tpu.parallel.fit import fit_sharded
    from sgc_tpu.parallel.mesh import make_mesh
    from sgc_tpu.parallel.staging import V5E_HBM_BYTES

    n = max(int(N_NODES * scale), 4096)
    f = N_FEATURES if scale >= 1.0 else max(int(N_FEATURES * scale), 64)
    mesh = make_mesh(8, 1)

    prov = class_signal_features(n, f, N_CLASSES)
    labels = prov.labels(0, n)
    rng = np.random.default_rng(1)
    idx_train = np.sort(rng.choice(n, max(n // 10, N_CLASSES * 4),
                                   replace=False))

    feat_bytes = n * f * 4
    log(f"graph: {n} nodes, features {n}x{f} f32 = "
        f"{feat_bytes/2**30:.1f} GiB (v5e HBM = "
        f"{V5E_HBM_BYTES/2**30:.0f} GiB, exceeds: "
        f"{feat_bytes > V5E_HBM_BYTES})")

    t0 = time.perf_counter()
    graph = build_graph(n, AVG_DEGREE, 8)
    t_graph = time.perf_counter() - t0
    log(f"graph built: {graph.nnz} edges ({t_graph:.0f}s), "
        f"peak rss {rss_gib():.1f} GiB")

    t0 = time.perf_counter()
    if os.environ.get("SGC_BEYOND_TRACE_RSS"):
        start_rss_tracer(t0)
    # memory controls (round-5 additions measured in DESIGN §3b):
    # col_chunk runs each hop in feature-column panels (bounds the
    # ~4x-features hop transient at panel fraction), and fit_sharded's
    # consume form frees the staged store as soon as hop 1 completes.
    # Panels narrower than 128 lanes fall off the fast gather path
    # (measured 6x slower at width 64), hence the floor. With panels
    # this narrow the edge chunk can be LARGE (per-step transient is
    # chunk x panel, not chunk x F) — fewer scan steps, faster wall.
    col_chunk = max(f // 8, 128)
    edge_chunk = 262_144
    params, report = fit_sharded(
        graph, prov, labels, idx_train, N_CLASSES,
        mesh=mesh, degree=2, epochs=epochs, lr=0.2, weight_decay=0.0,
        formulation="segment", use_halo=True, edge_chunk=edge_chunk,
        col_chunk=col_chunk,
    )
    t_fit = time.perf_counter() - t0

    import resource

    peak_rss_gib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    out = {
        "peak_host_rss_gib": round(peak_rss_gib, 1),
        "n_nodes": n,
        "n_features": f,
        "n_edges": int(graph.nnz),
        "feature_gb": round(feat_bytes / 1e9, 2),
        "feature_gib": round(feat_bytes / 2**30, 2),
        "exceeds_v5e_hbm": bool(feat_bytes > V5E_HBM_BYTES),
        "per_device_gib": round(feat_bytes / 8 / 2**30, 3),
        "working_set_gib_2hop": round(2 * feat_bytes / 2**30, 2),
        "n_devices": report.n_devices,
        "halo_fraction": round(report.halo_fraction, 4),
        "train_accuracy": round(report.train_accuracy, 4),
        "epochs": epochs,
        "fit_s": round(t_fit, 1),
        "graph_build_s": round(t_graph, 1),
        "col_chunk": col_chunk,
        "edge_chunk": edge_chunk,
        "peak_over_features": round(peak_rss_gib / (feat_bytes / 2**30), 2),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(scale=float(os.environ.get("SGC_BEYOND_SCALE", "1.0")),
         epochs=int(os.environ.get("SGC_BEYOND_EPOCHS", "5")))
