"""Per-hop parity vs a torch reference pipeline (SURVEY.md §4c).

The reference's propagation is ``torch.spmm`` hops over the aug-normalized
adjacency (reference utils.py:92-97). These tests rebuild that pipeline
independently with torch (CPU) — sparse tensor, spmm loop — and require
our jitted propagation to match per hop to float32 tolerance, on both a
synthetic graph and real cora.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from sgc_tpu.graph.normalize import aug_normalized_adjacency, row_normalize
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.ops.propagate import propagate

torch = pytest.importorskip("torch")

from tests.conftest import requires_cora  # noqa: E402


def _torch_spmm_hops(norm_adj: sp.spmatrix, x: np.ndarray, k: int):
    """Independent torch implementation of sgc_precompute's hop loop."""
    coo = norm_adj.tocoo()
    idx = torch.from_numpy(np.vstack([coo.row, coo.col])).long()
    val = torch.from_numpy(coo.data.astype(np.float32))
    adj_t = torch.sparse_coo_tensor(idx, val, coo.shape).coalesce()
    xt = torch.from_numpy(x.astype(np.float32))
    hops = []
    for _ in range(k):
        xt = torch.spmm(adj_t, xt)
        hops.append(xt.numpy().copy())
    return hops


def _jax_hops(norm_adj: sp.spmatrix, x: np.ndarray, k: int):
    graph = SparseGraph.from_scipy(norm_adj.tocsr())
    _, per_hop = propagate(
        jnp.asarray(x.astype(np.float32)), graph, k, collect_hops=True
    )
    return [np.asarray(h) for h in per_hop]


def _compare_hops(norm_adj, x, k, atol):
    ours = _jax_hops(norm_adj, x, k)
    ref = _torch_spmm_hops(norm_adj, x, k)
    assert len(ours) == len(ref) == k
    for hop, (a, b) in enumerate(zip(ours, ref)):
        err = np.abs(a - b).max()
        scale = np.abs(b).max() + 1e-12
        assert err / scale < atol, f"hop {hop}: rel err {err / scale:.2e}"


def test_synthetic_per_hop_parity():
    rng = np.random.default_rng(0)
    n, e = 500, 4000
    adj = sp.coo_matrix(
        (np.ones(e, np.float32),
         (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n),
    )
    adj = adj + adj.T
    norm = aug_normalized_adjacency(adj)
    x = rng.standard_normal((n, 64)).astype(np.float32)
    _compare_hops(norm, x, k=4, atol=1e-5)


@requires_cora
def test_cora_per_hop_parity_vs_torch():
    from sgc_tpu.data.planetoid import load_citation

    data = load_citation("cora")
    # the loader's graph is the already-normalized S; round-trip to scipy
    # feeds the identical operator to the independent torch pipeline
    norm = data.graph.to_scipy()
    x = np.asarray(data.features, np.float32)
    _compare_hops(norm, x, k=2, atol=1e-5)


def test_normalization_matches_torch_dense_formula():
    """D̃^-1/2 (A+I) D̃^-1/2 recomputed densely in torch."""
    rng = np.random.default_rng(1)
    n = 64
    a = (rng.random((n, n)) < 0.1).astype(np.float32)
    a = np.maximum(a, a.T)
    ours = aug_normalized_adjacency(sp.csr_matrix(a)).toarray()

    at = torch.from_numpy(a) + torch.eye(n)
    d = at.sum(1)
    dinv = torch.diag(d.pow(-0.5))
    ref = (dinv @ at @ dinv).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_gcn_per_layer_parity_vs_torch():
    """2-layer GCN forward (W then spmm, ReLU between — reference
    models.py:20-57 with the missing-return bug fixed) recomputed with
    torch sparse ops layer by layer."""
    import jax

    from sgc_tpu.models.gcn import gcn_apply, init_gcn

    rng = np.random.default_rng(2)
    n, e, f, h, c = 200, 1500, 32, 16, 5
    adj = sp.coo_matrix(
        (np.ones(e, np.float32),
         (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n),
    )
    norm = aug_normalized_adjacency(adj + adj.T)
    graph = SparseGraph.from_scipy(norm.tocsr())
    x = rng.standard_normal((n, f)).astype(np.float32)

    params = init_gcn(jax.random.PRNGKey(0), f, h, c)
    ours = np.asarray(
        gcn_apply(params, jnp.asarray(x), graph, use_relu=True)
    )

    coo = norm.tocoo()
    idx = torch.from_numpy(np.vstack([coo.row, coo.col])).long()
    val = torch.from_numpy(coo.data.astype(np.float32))
    adj_t = torch.sparse_coo_tensor(idx, val, coo.shape).coalesce()
    xt = torch.from_numpy(x)
    w1 = torch.from_numpy(np.asarray(params.w1))
    b1 = torch.from_numpy(np.asarray(params.b1))
    w2 = torch.from_numpy(np.asarray(params.w2))
    b2 = torch.from_numpy(np.asarray(params.b2))
    hid = torch.relu(torch.spmm(adj_t, xt @ w1 + b1))
    ref = torch.spmm(adj_t, hid @ w2 + b2).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_sk_sweep_parity():
    """S^K X for K = 1..4 vs scipy matrix power (the K-hop sweep config,
    BASELINE.json configs[4])."""
    rng = np.random.default_rng(3)
    n, e = 150, 1000
    adj = sp.coo_matrix(
        (np.ones(e, np.float32),
         (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n),
    )
    norm = aug_normalized_adjacency(adj + adj.T).tocsr()
    graph = SparseGraph.from_scipy(norm)
    x = rng.standard_normal((n, 12)).astype(np.float32)

    for k in range(1, 5):
        ours = np.asarray(propagate(jnp.asarray(x), graph, k))
        ref = x.copy()
        for _ in range(k):
            ref = norm @ ref
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)
