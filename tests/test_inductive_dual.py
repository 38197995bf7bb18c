"""Sharded inductive dual-adjacency flow parity vs single-device reference."""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from sgc_tpu.graph.normalize import aug_normalized_adjacency
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.ops.propagate import propagate
from sgc_tpu.parallel.inductive import (
    build_dual_partition,
    inductive_dual_propagate,
)
from sgc_tpu.parallel.mesh import make_mesh


def _reddit_like(n=128, e=900, train_frac=0.6, seed=0):
    """Full adjacency + train-only sub-adjacency, reference utils.py:116-124."""
    rng = np.random.default_rng(seed)
    adj = sp.coo_matrix(
        (np.ones(e, np.float32),
         (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n),
    )
    adj = (adj + adj.T).tocsr()
    idx_train = np.sort(
        rng.choice(n, int(train_frac * n), replace=False)
    )
    train_adj = adj[idx_train][:, idx_train]
    full = SparseGraph.from_scipy(aug_normalized_adjacency(adj))
    train = SparseGraph.from_scipy(aug_normalized_adjacency(train_adj))
    x = rng.standard_normal((n, 24)).astype(np.float32)
    return full, train, idx_train, x


def test_dual_propagate_matches_single_device():
    full, train, idx_train, x = _reddit_like()
    mesh = make_mesh(4, 1)
    dual = build_dual_partition(full, train, idx_train, 4)
    eval_s, train_s = inductive_dual_propagate(
        mesh, dual, jnp.asarray(x), degree=2
    )

    eval_ref = np.asarray(propagate(jnp.asarray(x), full, 2))
    train_ref = np.asarray(
        propagate(jnp.asarray(x[idx_train]), train, 2)
    )

    n, t = full.n_rows, train.n_rows
    np.testing.assert_allclose(
        np.asarray(eval_s)[:n], eval_ref, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(train_s)[:t], train_ref, rtol=1e-5, atol=1e-5
    )
    # padded rows stay zero (no leakage from padding)
    assert np.all(np.asarray(train_s)[t:] == 0.0)


def test_dual_partition_descriptors_are_independent():
    full, train, idx_train, x = _reddit_like(seed=1)
    dual = build_dual_partition(full, train, idx_train, 4)
    assert dual.full.n_rows_padded >= full.n_rows
    assert dual.train.n_rows_padded >= train.n_rows
    assert dual.full.rows_per_part != dual.train.rows_per_part or (
        full.n_rows == train.n_rows
    )


def test_dual_propagate_blockdense_matches_segment():
    """The blockdense dual flow (cli/reddit --sharded default) matches
    the segment dual flow to bf16 cell tolerance on both feature sets."""
    full, train, idx_train, x = _reddit_like(seed=3)
    mesh = make_mesh(4, 1)
    seg = build_dual_partition(full, train, idx_train, 4)
    bd = build_dual_partition(full, train, idx_train, 4,
                              formulation="blockdense", n_features=24,
                              row_block=32, stripe=32)
    assert bd.full_bd is not None and bd.train_bd is not None

    ev_s, tr_s = inductive_dual_propagate(mesh, seg, jnp.asarray(x), 2)
    ev_b, tr_b = inductive_dual_propagate(mesh, bd, jnp.asarray(x), 2)
    for a, b in ((ev_s, ev_b), (tr_s, tr_b)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-9)
        assert np.abs(a - b).max() / scale < 2e-2
