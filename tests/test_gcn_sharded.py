"""Sharded GCN (the DataParallel-done-right path) vs single-device GCN."""

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from sgc_tpu.graph.normalize import aug_normalized_adjacency
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.models.gcn import gcn_apply, init_gcn
from sgc_tpu.parallel.gcn import fit_gcn_sharded
from sgc_tpu.parallel.mesh import make_mesh
from sgc_tpu.train.metrics import accuracy
from sgc_tpu.train.optim import torch_adam


def _task(n=96, seed=0):
    rng = np.random.default_rng(seed)
    c = 3
    blocks = np.repeat(np.arange(c), n // c)
    r, co = np.triu_indices(n, 1)
    keep = rng.random(len(r)) < np.where(blocks[r] == blocks[co], 0.25, 0.02)
    adj = sp.coo_matrix(
        (np.ones(keep.sum(), np.float32), (r[keep], co[keep])), shape=(n, n))
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj + adj.T))
    x = rng.standard_normal((n, 12)).astype(np.float32)
    x[np.arange(n), blocks] += 1.2
    idx_train = np.sort(rng.choice(n, n // 2, replace=False))
    return graph, x, blocks.astype(np.int32), idx_train, c


def _single_device_gcn(graph, x, y, idx_train, c, n_hidden, epochs, lr, wd,
                       seed):
    import optax

    params = init_gcn(jax.random.PRNGKey(seed), x.shape[1], n_hidden, c)
    tx = torch_adam(lr, wd)
    opt = tx.init(params)
    xj = jnp.asarray(x)
    yj = jnp.asarray(y)
    idx = jnp.asarray(idx_train)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = gcn_apply(p, xj, graph)[idx]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yj[idx]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    losses = []
    for _ in range(epochs):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    return params, losses


def test_fit_gcn_sharded_matches_single_device():
    """Per-epoch losses and final params of the 4-way sharded GCN fit
    must match the single-device run (replicated weights + row-sharded
    activations: identical math, f32 collective tolerance)."""
    graph, x, y, idx_train, c = _task()
    mesh = make_mesh(4, 1)
    epochs, lr, wd, nh = 30, 0.01, 5e-4, 16

    params_s, losses_s = fit_gcn_sharded(
        graph, x, y, idx_train, c, mesh=mesh, n_hidden=nh, epochs=epochs,
        lr=lr, weight_decay=wd, seed=7)
    params_1, losses_1 = _single_device_gcn(
        graph, x, y, idx_train, c, nh, epochs, lr, wd, seed=7)

    np.testing.assert_allclose(losses_s, losses_1, rtol=1e-4, atol=1e-5)
    scale = max(np.abs(np.asarray(params_1.w1)).max(), 1e-8)
    assert np.abs(np.asarray(params_s.w1)
                  - np.asarray(params_1.w1)).max() / scale < 5e-3
    assert losses_s[-1] < losses_s[0]

    # and the trained model classifies (quality floor)
    logits = gcn_apply(params_s, jnp.asarray(x), graph)
    acc = float(accuracy(logits[jnp.asarray(idx_train)], y[idx_train]))
    assert acc > 0.9


def test_sharded_gcn_step_differentiates_through_blockdense():
    """GCN trains THROUGH the sharded block-dense SpMM (cell scan +
    all_to_all inside value_and_grad): losses must decrease and match
    the segment-formulation step to bf16 tolerance."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sgc_tpu.parallel.blockdense import build_sharded_blockdense
    from sgc_tpu.parallel.gcn import init_sharded_gcn, make_sharded_gcn_step
    from sgc_tpu.parallel.halo import build_halo
    from sgc_tpu.parallel.mesh import NODES_AXIS
    from sgc_tpu.parallel.partition import pad_node_rows, partition_graph
    from sgc_tpu.parallel.spmm import shard_features

    graph, x, y, idx_train, c = _task(seed=3)
    mesh = make_mesh(4, 1)
    pg = partition_graph(graph, 4)
    halo = build_halo(pg)
    bd = build_sharded_blockdense(pg, halo, 12, row_block=16, stripe=16,
                                  min_edges=0)

    xp = shard_features(mesh, pad_node_rows(jnp.asarray(x),
                                            pg.n_rows_padded))
    yy = np.zeros(pg.n_rows_padded, np.int32)
    yy[: len(y)] = y
    mm = np.zeros(pg.n_rows_padded, np.float32)
    mm[idx_train] = 1.0
    yy = jax.device_put(jnp.asarray(yy), NamedSharding(mesh, P(NODES_AXIS)))
    mm = jax.device_put(jnp.asarray(mm), NamedSharding(mesh, P(NODES_AXIS)))

    losses = {}
    for name, kw in (("segment", dict(halo=halo)),
                     ("blockdense", dict(blockdense=bd))):
        state = init_sharded_gcn(mesh, jax.random.PRNGKey(1), 12, 16, c,
                                 lr=0.01, weight_decay=5e-4)
        step = make_sharded_gcn_step(mesh, pg, lr=0.01, weight_decay=5e-4,
                                     **kw)
        ls = []
        for _ in range(10):
            state, loss = step(state, xp, yy, mm)
            ls.append(float(loss))
        losses[name] = ls
        assert ls[-1] < ls[0]
    np.testing.assert_allclose(losses["blockdense"], losses["segment"],
                               rtol=2e-2, atol=1e-3)


def test_citation_cli_sharded_smoke():
    """--sharded on the citation CLI: both model families train over the
    virtual mesh and reach sane cora accuracy."""
    import pytest

    from tests.conftest import requires_cora  # noqa: F401 (marker import)

    from sgc_tpu.cli.citation import run
    from sgc_tpu.utils.config import CitationConfig

    try:
        res = run(CitationConfig(dataset="cora", tuned=True), sharded=True)
    except FileNotFoundError:
        pytest.skip("cora data unavailable")
    assert res["test_accuracy"] > 0.77
    assert res["formulation"] in ("blockdense", "segment")

    res = run(CitationConfig(dataset="cora", model="GCN", epochs=60,
                             lr=0.01, weight_decay=5e-4), sharded=True)
    assert res["test_accuracy"] > 0.75


def test_citation_cli_sharded_newton_reaches_golden():
    """--sharded --trainer newton: the distributed Newton head reaches
    the cora tuned golden (0.810 single-device reference)."""
    import pytest

    from sgc_tpu.cli.citation import run
    from sgc_tpu.utils.config import CitationConfig

    try:
        res = run(CitationConfig(dataset="cora", tuned=True),
                  sharded=True, trainer="newton")
    except FileNotFoundError:
        pytest.skip("cora data unavailable")
    assert res["test_accuracy"] >= 0.79
