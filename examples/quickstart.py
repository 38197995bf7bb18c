"""sgc_tpu quickstart — runs end-to-end on synthetic data, no downloads.

    python examples/quickstart.py

Builds a two-cluster graph, propagates features (SGC and APPNP), trains
the linear head, evaluates, shards the same training across all visible
devices, and serves predictions through the inference engine.
"""

import os
import sys

# runnable from anywhere: sys.path, not PYTHONPATH (a PYTHONPATH entry
# breaks the axon TPU plugin discovery on this environment)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


def make_toy_graph(n=400, seed=0):
    """Two communities; labels = community; features = noisy labels."""
    rng = np.random.default_rng(seed)
    half = n // 2
    labels = np.repeat([0, 1], half).astype(np.int32)
    r, c = np.triu_indices(n, 1)
    same = (r < half) == (c < half)
    keep = rng.random(len(r)) < np.where(same, 0.05, 0.002)
    adj = sp.coo_matrix(
        (np.ones(keep.sum(), np.float32), (r[keep], c[keep])), shape=(n, n)
    )
    adj = (adj + adj.T).tocsr()
    x = rng.standard_normal((n, 16)).astype(np.float32)
    x[:, 0] += labels * 1.5
    idx = rng.permutation(n)
    return adj, x, labels, np.sort(idx[: n // 2]), np.sort(idx[n // 2:])


def main():
    from sgc_tpu.graph.normalize import aug_normalized_adjacency
    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.models.sgc import init_sgc, sgc_apply
    from sgc_tpu.ops.propagate import propagate_appnp, sgc_precompute
    from sgc_tpu.train.loops import train_regression
    from sgc_tpu.train.metrics import accuracy

    print(f"backend: {jax.default_backend()}, devices: {len(jax.devices())}")

    adj, x, y, idx_train, idx_test = make_toy_graph()
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj))
    x = jnp.asarray(x)

    # --- 1. SGC: propagate once, train the linear head -------------------
    feats, t_pre = sgc_precompute(x, graph, degree=2)
    params = init_sgc(jax.random.PRNGKey(0), feats.shape[1], 2)
    params, t_train = train_regression(
        params, feats[idx_train], jnp.asarray(y[idx_train]),
        epochs=100, lr=0.2, weight_decay=1e-5,
    )
    acc = accuracy(sgc_apply(params, feats[idx_test]), y[idx_test])
    print(f"SGC   K=2 : test acc {acc:.3f} "
          f"(precompute {t_pre:.3f}s, train {t_train:.3f}s)")

    # --- 2. APPNP: deep propagation without oversmoothing ----------------
    feats16 = propagate_appnp(x, graph, 16, alpha=0.1)
    p2 = init_sgc(jax.random.PRNGKey(0), feats16.shape[1], 2)
    p2, _ = train_regression(
        p2, feats16[idx_train], jnp.asarray(y[idx_train]), epochs=100
    )
    acc16 = accuracy(sgc_apply(p2, feats16[idx_test]), y[idx_test])
    print(f"APPNP K=16: test acc {acc16:.3f}")

    # --- 3. distributed: same fit over every visible device --------------
    if len(jax.devices()) > 1:
        from sgc_tpu.parallel.fit import fit_sharded

        _, report = fit_sharded(
            graph, np.asarray(x), y, idx_train, 2, degree=2, epochs=60
        )
        print(f"sharded: {report.n_parts} parts, "
              f"halo {report.halo_fraction:.1%}, "
              f"train acc {report.train_accuracy:.3f}")

    # --- 3c. locality pipeline: discover communities, matmul the dense --
    from sgc_tpu.graph.locality import LocalityPlan

    # shuffle node ids so LPA has to FIND the two communities
    rng = np.random.default_rng(1)
    perm = rng.permutation(adj.shape[0])        # perm[old] = new id
    inv = np.argsort(perm)                      # inv[new] = old id
    adj_s = adj[inv][:, inv]                    # row new <- old inv[new]
    g_s = SparseGraph.from_scipy(aug_normalized_adjacency(adj_s),
                                 device=False)
    plan = LocalityPlan.build(
        g_s, np.asarray(x)[inv], y[inv], np.sort(perm[idx_train]),
        row_block=128, stripe=128)
    print(f"locality: {plan.split_main.n_cells} dense cells discovered "
          f"from shuffled ids (dense frac {plan.dense_fraction:.0%})")

    # --- 3b. precompute-once, many heads: a wd grid in ONE program -------
    from sgc_tpu.train.loops import train_regression_many

    wds = np.logspace(-8, -3, 8)
    many, _, dt = train_regression_many(
        init_sgc(jax.random.PRNGKey(0), feats.shape[1], 2),
        feats[idx_train], jnp.asarray(y[idx_train]), wds,
        epochs=60,
    )
    accs = [
        accuracy(sgc_apply(jax.tree.map(lambda a, i=i: a[i], many),
                           feats[idx_test]), y[idx_test])
        for i in range(len(wds))
    ]
    print(f"wd grid (8 heads, one batched program, {dt:.2f}s): "
          f"best test acc {max(accs):.3f}")

    # --- 4. serving -------------------------------------------------------
    from sgc_tpu.serve import EngineConfig, InferenceEngine

    engine = InferenceEngine(
        params, features=np.asarray(feats),
        config=EngineConfig(min_batch=8, max_batch=64),
    )
    preds = engine.predict(list(idx_test[:10]))
    print(f"served predictions for 10 nodes: {preds.tolist()} "
          f"(mean latency {engine.stats.mean_latency_ms:.2f} ms)")


if __name__ == "__main__":
    main()
