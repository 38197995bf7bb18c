"""Inductive dual-adjacency flow on a synthetic graph (Reddit stand-in).

The real npz files are not bundled; this exercises the pipeline shape:
full-graph propagation for eval features, train-sub-adjacency propagation
for training features, LBFGS head fit, micro-F1 eval — and checks the
model actually learns a linearly-separable-after-propagation signal.
"""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from sgc_tpu.graph.normalize import aug_normalized_adjacency, standardize_features
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.models.sgc import init_sgc, sgc_apply
from sgc_tpu.ops.propagate import sgc_precompute
from sgc_tpu.train.loops import train_linear
from sgc_tpu.train.metrics import f1
import jax


def _two_cluster_graph(n=200, seed=0):
    """Two dense clusters; labels = cluster id; features = noisy label."""
    rng = np.random.default_rng(seed)
    half = n // 2
    labels = np.concatenate([np.zeros(half), np.ones(half)]).astype(np.int32)
    # intra-cluster edges dominate
    edges = []
    for _ in range(n * 10):
        c = rng.integers(0, 2)
        i = rng.integers(0, half) + c * half
        j = rng.integers(0, half) + c * half
        edges.append((i, j))
    for _ in range(n // 4):  # few cross edges
        edges.append((rng.integers(0, half), half + rng.integers(0, half)))
    r, c = np.array(edges).T
    adj = sp.coo_matrix((np.ones(len(edges), np.float32), (r, c)), shape=(n, n))
    adj = adj + adj.T
    feats = labels[:, None] + rng.normal(0, 2.0, size=(n, 8))
    return adj.tocsr(), feats.astype(np.float32), labels


def test_inductive_flow_learns():
    adj, feats, labels = _two_cluster_graph()
    n = adj.shape[0]
    rng = np.random.default_rng(1)
    perm = rng.permutation(n)
    idx_train, idx_test = perm[: n // 2], perm[n // 2 :]

    train_adj = adj[idx_train, :][:, idx_train]
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj))
    train_graph = SparseGraph.from_scipy(aug_normalized_adjacency(train_adj))
    x = standardize_features(jnp.asarray(feats))

    feats_eval, _ = sgc_precompute(x, graph, 2)
    feats_train, _ = sgc_precompute(x[jnp.asarray(idx_train)], train_graph, 2)

    params = init_sgc(jax.random.PRNGKey(42), x.shape[1], 2)
    params, _ = train_linear(
        params, feats_train, jnp.asarray(labels[idx_train]), epochs=2, lr=1.0
    )
    logits = sgc_apply(params, feats_eval[jnp.asarray(idx_test)])
    micro, macro = f1(logits, jnp.asarray(labels[idx_test]))
    assert micro > 0.9, f"inductive pipeline failed to learn: micro-F1 {micro}"


def test_reddit_cli_sharded_flag(monkeypatch):
    """--sharded path: dual-partitioned propagation over the CPU mesh,
    wired through the reddit CLI's run()."""
    from sgc_tpu.cli import reddit as reddit_cli
    from sgc_tpu.data.reddit import RedditData

    adj, feats, labels = _two_cluster_graph(seed=3)
    n = adj.shape[0]
    rng = np.random.default_rng(4)
    idx = rng.permutation(n)
    idx_train = np.sort(idx[: n // 2])
    idx_val = np.sort(idx[n // 2 : 3 * n // 4])
    idx_test = np.sort(idx[3 * n // 4 :])
    feats_std = standardize_features(feats)
    data = RedditData(
        graph=SparseGraph.from_scipy(aug_normalized_adjacency(adj)),
        train_graph=SparseGraph.from_scipy(
            aug_normalized_adjacency(adj[idx_train][:, idx_train])
        ),
        features=jnp.asarray(feats_std),
        labels=jnp.asarray(labels),
        idx_train=idx_train,
        idx_val=idx_val,
        idx_test=idx_test,
        n_classes=2,
    )
    monkeypatch.setattr(
        reddit_cli, "load_reddit", lambda *a, **k: data
    )
    res_sharded = reddit_cli.run(
        inductive=True, test=True, epochs=2, sharded=True
    )
    res_single = reddit_cli.run(
        inductive=True, test=True, epochs=2, sharded=False
    )
    assert res_sharded["f1_micro"] > 0.9
    # sharded and single-device propagation feed the same optimization:
    # scores agree closely
    assert abs(res_sharded["f1_micro"] - res_single["f1_micro"]) < 0.05
