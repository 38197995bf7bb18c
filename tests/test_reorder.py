"""Graph reordering: permutation correctness + halo-fraction improvement."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from sgc_tpu.graph.normalize import aug_normalized_adjacency
from sgc_tpu.graph.reorder import (
    apply_order,
    bfs_order,
    degree_order,
    fetch_ordering,
    rcm_order,
    remap_indices,
)
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.ops.propagate import propagate
from sgc_tpu.parallel.halo import build_halo, halo_fraction
from sgc_tpu.parallel.partition import partition_graph


def _clustered_graph(n_clusters=4, per=64, p_in=0.2, p_out=0.01, seed=0):
    """Stochastic block model, then node ids shuffled (worst case for
    block partitioning)."""
    rng = np.random.default_rng(seed)
    n = n_clusters * per
    blocks = np.repeat(np.arange(n_clusters), per)
    r, c = np.triu_indices(n, 1)
    same = blocks[r] == blocks[c]
    keep = rng.random(len(r)) < np.where(same, p_in, p_out)
    rows, cols = r[keep], c[keep]
    adj = sp.coo_matrix(
        (np.ones(len(rows), np.float32), (rows, cols)), shape=(n, n)
    )
    adj = (adj + adj.T).tocsr()
    shuffle = rng.permutation(n)
    return adj[shuffle][:, shuffle]


@pytest.mark.parametrize("name", ["rcm", "bfs", "degree", "lpa", "none"])
def test_orders_are_permutations(name):
    adj = _clustered_graph()
    order = fetch_ordering(name)(adj)
    assert sorted(order.tolist()) == list(range(adj.shape[0]))


def test_apply_order_preserves_propagation():
    """Propagation commutes with reordering: P S P^T (P x) == P (S x)."""
    adj = _clustered_graph(seed=1)
    norm = aug_normalized_adjacency(adj)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((adj.shape[0], 8)).astype(np.float32)

    base = np.asarray(
        propagate(jnp.asarray(x), SparseGraph.from_scipy(norm.tocsr()), 2)
    )

    order = rcm_order(adj)
    padj, px = apply_order(adj, order, x)
    pnorm = aug_normalized_adjacency(padj)
    pout = np.asarray(
        propagate(jnp.asarray(px), SparseGraph.from_scipy(pnorm.tocsr()), 2)
    )
    np.testing.assert_allclose(pout, base[order], rtol=1e-4, atol=1e-5)


def test_remap_indices_roundtrip():
    order = np.array([3, 1, 0, 2])
    idx = np.array([0, 2])
    new = remap_indices(order, idx)
    # node 0 now sits at position 2; node 2 at position 3
    np.testing.assert_array_equal(new, [2, 3])


def test_spectral_reduces_halo_fraction_on_clustered_graph():
    from sgc_tpu.graph.reorder import spectral_order

    adj = _clustered_graph(n_clusters=4, per=128, p_in=0.15, p_out=0.002,
                           seed=3)

    def frac(a):
        g = SparseGraph.from_scipy(aug_normalized_adjacency(a).tocsr())
        pg = partition_graph(g, 4)
        return halo_fraction(build_halo(pg), pg)

    frac_shuffled = frac(adj)
    padj, = apply_order(adj, spectral_order(adj))
    frac_ordered = frac(padj)
    # shuffled ids saturate the exchange (1.0); spectral ordering makes
    # row-block partitioning behave like a min-cut partitioner
    assert frac_ordered < 0.5 * frac_shuffled, (
        f"spectral {frac_ordered:.3f} !< half of shuffled "
        f"{frac_shuffled:.3f}"
    )


def test_lpa_recovers_planted_communities():
    """On an SBM with shuffled ids, label propagation must place each
    planted block contiguously (up to block order): every ground-truth
    community maps to one run of consecutive new positions."""
    from sgc_tpu.graph.reorder import lpa_order

    # same construction as _clustered_graph but keeping the block labels
    n_clusters, per = 4, 64
    n = n_clusters * per
    rng = np.random.default_rng(7)
    blocks = np.repeat(np.arange(n_clusters), per)
    r, c = np.triu_indices(n, 1)
    same = blocks[r] == blocks[c]
    keep = np.random.default_rng(0).random(len(r)) < np.where(same, 0.2, 0.01)
    adj = sp.coo_matrix(
        (np.ones(int(keep.sum()), np.float32), (r[keep], c[keep])),
        shape=(n, n))
    shuffle = rng.permutation(n)
    # adj[shuffle][:, shuffle] puts old node shuffle[i] at new index i
    adj = (adj + adj.T).tocsr()[shuffle][:, shuffle]
    label_of_new = blocks[shuffle]

    order = lpa_order(adj)  # order[pos] = new id
    seq = label_of_new[order]
    # count label runs: should equal the number of planted communities
    runs = 1 + int(np.count_nonzero(np.diff(seq)))
    assert runs == n_clusters, f"{runs} label runs (expected {n_clusters})"


def test_lpa_order_deterministic():
    from sgc_tpu.graph.reorder import lpa_order

    adj = _clustered_graph(seed=9)
    np.testing.assert_array_equal(lpa_order(adj, seed=5),
                                  lpa_order(adj, seed=5))


def test_degree_order_descending():
    adj = _clustered_graph(seed=4)
    order = degree_order(adj)
    deg = np.diff(adj.tocsr().indptr)
    assert deg[order[0]] == deg.max()
    assert np.all(np.diff(deg[order]) <= 0)


def test_reorder_graph_arrays_fast_path_matches_scipy_path(monkeypatch):
    """The scipy-free lpa fast path (native coalesce + row_ptr + direct
    COO permute) must reproduce the scipy coo->csr->fancy-index path
    EXACTLY — order, edges, values (duplicates summed), features,
    labels, idx."""
    import numpy as np

    import sgc_tpu.graph.reorder as ro
    import sgc_tpu.native as nat
    from sgc_tpu.graph.sparse import SparseGraph

    if not nat.available():
        import pytest
        pytest.skip("native library not built")

    rng = np.random.default_rng(4)
    n, e = 300, 4000
    r = rng.integers(0, n, e)
    c = rng.integers(0, n, e)
    # duplicates: tocsr SUMS them; the fast path must coalesce too
    r[100:150] = r[0]
    c[100:150] = c[0]
    v = rng.standard_normal(e).astype(np.float32)
    g = SparseGraph.from_coo(r, c, v, n, n, device=False)
    feats = rng.standard_normal((n, 8)).astype(np.float32)
    y = rng.integers(0, 4, n).astype(np.int32)
    idx = np.sort(rng.choice(n, 40, replace=False))

    fast = ro.reorder_graph_arrays(g, "lpa", feats, y, idx)

    # force the scipy path by hiding the native library from the gate
    # (reorder_graph_arrays imports sgc_tpu.native inside the function)
    monkeypatch.setattr(nat, "available", lambda: False)
    # ... but lpa_order's own impl="auto" would then warn and use the
    # sync solver (different fixpoint); pin the native label solver so
    # both paths use identical labels
    real_fetch = ro.fetch_ordering
    monkeypatch.setattr(
        ro, "fetch_ordering",
        lambda name: (lambda adj: ro.lpa_order(adj, impl="native"))
        if name == "lpa" else real_fetch(name))
    slow = ro.reorder_graph_arrays(g, "lpa", feats, y, idx)

    gf, ff, yf, idxf, of = fast
    gs, fs, ys, idxs, os_ = slow
    np.testing.assert_array_equal(of, os_)
    assert gf.nnz == gs.nnz
    np.testing.assert_array_equal(
        np.asarray(gf.rows)[:gf.nnz], np.asarray(gs.rows)[:gs.nnz])
    np.testing.assert_array_equal(
        np.asarray(gf.cols)[:gf.nnz], np.asarray(gs.cols)[:gs.nnz])
    np.testing.assert_allclose(
        np.asarray(gf.vals)[:gf.nnz], np.asarray(gs.vals)[:gs.nnz],
        rtol=1e-6)
    np.testing.assert_array_equal(ff, fs)
    np.testing.assert_array_equal(yf, ys)
    np.testing.assert_array_equal(idxf, idxs)
