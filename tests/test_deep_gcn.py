"""Deep GCN: scan+remat correctness, gradients, staging hook."""

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from sgc_tpu.graph.normalize import aug_normalized_adjacency
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.models.deep_gcn import (
    deep_gcn_apply,
    init_deep_gcn,
    stage_layers,
)
from sgc_tpu.ops.spmm import spmm


def _setup(n=96, e=700, f=12, seed=0):
    rng = np.random.default_rng(seed)
    adj = sp.coo_matrix(
        (np.ones(e, np.float32),
         (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n),
    )
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj + adj.T))
    x = jnp.asarray(rng.standard_normal((n, f), dtype=np.float32))
    return graph, x


def _reference_forward(params, x, graph, residual):
    """Unrolled python-loop oracle for the scanned forward."""
    h = jax.nn.relu(spmm(graph, x @ params.w_in + params.b_in))
    for i in range(params.w_hidden.shape[0]):
        out = jax.nn.relu(
            spmm(graph, h @ params.w_hidden[i] + params.b_hidden[i])
        )
        h = out + h if residual else out
    return spmm(graph, h @ params.w_out + params.b_out)


def test_scan_matches_unrolled():
    graph, x = _setup()
    params = init_deep_gcn(jax.random.PRNGKey(0), 12, 16, 4, n_layers=6)
    for residual in (True, False):
        ours = deep_gcn_apply(params, x, graph, residual=residual)
        ref = _reference_forward(params, x, graph, residual)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_remat_same_values_and_grads():
    graph, x = _setup(seed=1)
    params = init_deep_gcn(jax.random.PRNGKey(1), 12, 8, 3, n_layers=5)

    def loss(p, remat):
        return jnp.sum(deep_gcn_apply(p, x, graph, remat=remat) ** 2)

    v1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    v2, g2 = jax.value_and_grad(lambda p: loss(p, False))(params)
    assert np.allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_two_layer_edge_case():
    graph, x = _setup(seed=2)
    params = init_deep_gcn(jax.random.PRNGKey(2), 12, 8, 3, n_layers=2)
    out = deep_gcn_apply(params, x, graph)
    assert out.shape == (96, 3)
    assert params.n_layers == 2


def test_stage_layers_partitioning():
    params = init_deep_gcn(jax.random.PRNGKey(3), 12, 8, 3, n_layers=9)
    stages = stage_layers(params, 3)          # 7 hidden -> ceil(7/3)=3 per
    assert len(stages) == 3
    assert sum(s[0].shape[0] for s in stages) == 7
    # concatenating stages reproduces the original stack
    w = np.concatenate([np.asarray(s[0]) for s in stages])
    np.testing.assert_array_equal(w, np.asarray(params.w_hidden))


def test_deep_stack_trains():
    """8-layer residual GCN fits a 2-cluster toy task."""
    import optax

    rng = np.random.default_rng(4)
    n = 80
    blocks = np.repeat([0, 1], n // 2)
    r, c = np.triu_indices(n, 1)
    keep = rng.random(len(r)) < np.where(blocks[r] == blocks[c], 0.2, 0.01)
    adj = sp.coo_matrix(
        (np.ones(keep.sum(), np.float32), (r[keep], c[keep])), shape=(n, n)
    )
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj + adj.T))
    x = jnp.asarray(rng.standard_normal((n, 8), dtype=np.float32))
    y = jnp.asarray(blocks, jnp.int32)

    params = init_deep_gcn(jax.random.PRNGKey(4), 8, 16, 2, n_layers=8)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss(p):
            logits = deep_gcn_apply(p, x, graph)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        l, g = jax.value_and_grad(loss)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for _ in range(60):
        params, opt, l = step(params, opt)
    preds = np.argmax(np.asarray(deep_gcn_apply(params, x, graph)), axis=1)
    assert (preds == blocks).mean() > 0.9
