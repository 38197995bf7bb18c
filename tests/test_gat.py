"""GAT attention layer: softmax correctness, masking, learning."""

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.models.gat import (
    gat_layer_apply,
    init_gat_layer,
    init_multi_head,
    multi_head_gat,
    segment_softmax,
)


def _graph(n=48, e=300, seed=0):
    rng = np.random.default_rng(seed)
    adj = sp.coo_matrix(
        (np.ones(e, np.float32),
         (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n),
    ).tocsr()
    adj.sum_duplicates()
    adj.setdiag(1.0)  # every row has >= 1 edge
    return SparseGraph.from_scipy(adj.tocsr())


def test_segment_softmax_sums_to_one():
    g = _graph()
    rng = np.random.default_rng(1)
    logits = jnp.asarray(
        rng.standard_normal(g.rows.shape[0]).astype(np.float32)
    )
    live = g.vals != 0
    alpha = segment_softmax(logits, g.rows, g.n_rows, live)
    sums = jax.ops.segment_sum(
        alpha, g.rows, num_segments=g.n_rows, indices_are_sorted=True
    )
    np.testing.assert_allclose(np.asarray(sums), 1.0, atol=1e-5)
    # padding edges carry zero attention
    assert np.all(np.asarray(alpha)[~np.asarray(live)] == 0.0)


def test_segment_softmax_matches_dense_oracle():
    g = _graph(n=16, e=60, seed=2)
    rng = np.random.default_rng(3)
    logits_np = rng.standard_normal(g.rows.shape[0]).astype(np.float32)
    live = np.asarray(g.vals != 0)
    alpha = np.asarray(segment_softmax(
        jnp.asarray(logits_np), g.rows, g.n_rows, jnp.asarray(live)
    ))
    rows = np.asarray(g.rows)
    for r in range(16):
        sel = (rows == r) & live
        if not sel.any():
            continue
        ref = np.exp(logits_np[sel] - logits_np[sel].max())
        ref /= ref.sum()
        np.testing.assert_allclose(np.sort(alpha[sel]), np.sort(ref),
                                   rtol=1e-5)


def test_gat_layer_shapes_and_rowsum_property():
    """With identity-ish activation, each output row is a convex combo of
    transformed inputs: constant input vector stays constant."""
    g = _graph(seed=4)
    params = init_gat_layer(jax.random.PRNGKey(0), 8, 8)
    x = jnp.ones((48, 8), jnp.float32)
    out = gat_layer_apply(params, x, g, activation=None)
    h = np.ones((1, 8), np.float32) @ np.asarray(params.w)
    expect = h + np.asarray(params.bias)
    np.testing.assert_allclose(
        np.asarray(out), np.tile(expect, (48, 1)), rtol=1e-4, atol=1e-5
    )


def test_multi_head_concat_and_mean():
    g = _graph(seed=5)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((48, 8), dtype=np.float32))
    stack = init_multi_head(jax.random.PRNGKey(1), 4, 8, 6)
    cat = multi_head_gat(stack, x, g, concat=True)
    avg = multi_head_gat(stack, x, g, concat=False)
    assert cat.shape == (48, 24)
    assert avg.shape == (48, 6)


def test_gat_learns_two_clusters():
    import optax

    rng = np.random.default_rng(7)
    n = 64
    blocks = np.repeat([0, 1], n // 2)
    r, c = np.triu_indices(n, 1)
    keep = rng.random(len(r)) < np.where(blocks[r] == blocks[c], 0.25, 0.01)
    adj = sp.coo_matrix(
        (np.ones(keep.sum(), np.float32), (r[keep], c[keep])), shape=(n, n)
    )
    adj = (adj + adj.T).tocsr()
    adj.setdiag(1.0)
    g = SparseGraph.from_scipy(adj.tocsr())
    x = jnp.asarray(rng.standard_normal((n, 8), dtype=np.float32))
    y = jnp.asarray(blocks, jnp.int32)

    p1 = init_gat_layer(jax.random.PRNGKey(2), 8, 16)
    p2 = init_gat_layer(jax.random.PRNGKey(3), 16, 2)
    params = (p1, p2)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss(ps):
            h = gat_layer_apply(ps[0], x, g)
            logits = gat_layer_apply(ps[1], h, g, activation=None)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        l, grads = jax.value_and_grad(loss)(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, l

    for _ in range(80):
        params, opt, l = step(params, opt)
    h = gat_layer_apply(params[0], x, g)
    preds = np.argmax(
        np.asarray(gat_layer_apply(params[1], h, g, activation=None)), axis=1
    )
    assert (preds == blocks).mean() > 0.9
