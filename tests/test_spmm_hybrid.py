"""Hybrid SpMM (dense cells -> MXU kernel, remainder -> XLA segment).

Oracles: scipy dense product and the segment-sum path (which is itself
torch.spmm-parity-tested in test_torch_parity.py). Kernel runs through
the Pallas interpreter on CPU — same logic, no TPU needed.
"""
import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.ops.spmm import spmm, spmm_segment
from sgc_tpu.ops.spmm_hybrid import (
    HybridSplit,
    min_fill_for,
    split_dense_cells,
    spmm_hybrid,
    spmm_hybrid_split,
)

RB = W = 64
CHUNK = 32  # interpret mode has no 1024 floor


def planted_graph(seed=0, n=256, dense_cells=((0, 0), (2, 1)),
                  dense_per_cell=900, sparse_edges=400):
    """Uniform sparse background + a few near-full cells."""
    rng = np.random.RandomState(seed)
    rs, cs = [], []
    for (ci, cj) in dense_cells:
        rs.append(ci * RB + rng.randint(0, RB, dense_per_cell))
        cs.append(cj * W + rng.randint(0, W, dense_per_cell))
    rs.append(rng.randint(0, n, sparse_edges))
    cs.append(rng.randint(0, n, sparse_edges))
    rows = np.concatenate(rs)
    cols = np.concatenate(cs)
    coo = sp.coo_matrix(
        (rng.rand(len(rows)).astype(np.float32), (rows, cols)),
        shape=(n, n),
    ).tocsr().tocoo()  # csr roundtrip sums duplicates
    return SparseGraph.from_coo(coo.row, coo.col,
                                coo.data.astype(np.float32), n, n), coo


def split_planted(**kw):
    graph, coo = planted_graph(**kw)
    split = split_dense_cells(graph, n_features=96, row_block=RB, stripe=W,
                              chunk=CHUNK, min_fill=0.5)
    return graph, coo, split


def test_split_routes_dense_and_sparse():
    graph, coo, split = split_planted()
    # the planted cells are ~900/4096-per-cell dense vs ~400 edges over
    # the whole matrix background: both branches must be populated
    assert split.tiled is not None and split.rest is not None
    assert split.dense_edges > split.sparse_edges
    assert split.dense_edges + split.sparse_edges == graph.nnz
    # dense cells fill their chunks at least to the threshold
    assert split.pad <= 1 / 0.5 + 1e-6


def test_hybrid_matches_dense_oracle():
    graph, coo, split = split_planted()
    x = np.random.RandomState(1).rand(graph.n_cols, 96).astype(np.float32)
    got = np.asarray(spmm_hybrid_split(split, jnp.asarray(x)))
    expect = coo.tocsr() @ x
    np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)


def test_hybrid_matches_segment_path():
    graph, coo, split = split_planted(seed=3)
    x = np.random.RandomState(2).rand(graph.n_cols, 33).astype(np.float32)
    got = np.asarray(spmm_hybrid_split(split, jnp.asarray(x)))
    seg = np.asarray(spmm_segment(graph, jnp.asarray(x)))
    np.testing.assert_allclose(got, seg, rtol=2e-5, atol=2e-5)


def test_hybrid_deterministic():
    graph, coo, split = split_planted(seed=4)
    x = jnp.asarray(
        np.random.RandomState(5).rand(graph.n_cols, 40).astype(np.float32))
    a = np.asarray(spmm_hybrid_split(split, x))
    b = np.asarray(spmm_hybrid_split(split, x))
    assert np.array_equal(a, b)


def test_all_sparse_graph_degrades_to_pure_segment():
    rng = np.random.RandomState(7)
    n, e = 512, 300  # nothing can fill a chunk
    graph = SparseGraph.from_coo(
        rng.randint(0, n, e), rng.randint(0, n, e),
        rng.rand(e).astype(np.float32), n, n)
    split = split_dense_cells(graph, n_features=64, row_block=RB, stripe=W,
                              chunk=CHUNK, min_fill=0.9)
    assert split.tiled is None
    assert split.sparse_edges == graph.nnz
    x = jnp.asarray(rng.rand(n, 64).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm_hybrid_split(split, x)),
        np.asarray(spmm_segment(graph, x)), rtol=1e-6, atol=1e-6)


def test_all_dense_graph_has_no_remainder():
    rng = np.random.RandomState(8)
    # one fully dense cell only
    rows = rng.randint(0, RB, 4000)
    cols = rng.randint(0, W, 4000)
    coo = sp.coo_matrix(
        (rng.rand(4000).astype(np.float32), (rows, cols)),
        shape=(RB, W)).tocsr().tocoo()
    graph = SparseGraph.from_coo(coo.row, coo.col,
                                 coo.data.astype(np.float32), RB, W)
    split = split_dense_cells(graph, n_features=64, row_block=RB, stripe=W,
                              chunk=CHUNK, min_fill=0.5)
    assert split.rest is None and split.dense_edges == graph.nnz
    x = jnp.asarray(rng.rand(W, 64).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm_hybrid_split(split, x)),
        np.asarray(coo.tocsr() @ np.asarray(x)), rtol=2e-5, atol=2e-5)


def test_spmm_impl_hybrid_dispatch():
    graph, coo, _ = split_planted(seed=9)
    x = jnp.asarray(
        np.random.RandomState(9).rand(graph.n_cols, 48).astype(np.float32))
    got = np.asarray(spmm(graph, x, impl="hybrid"))
    np.testing.assert_allclose(
        got, np.asarray(spmm_segment(graph, x)), rtol=2e-5, atol=2e-5)


def test_min_fill_threshold_scales_with_tile_and_features():
    # bigger cells cost more flops/edge -> need higher fill to justify
    assert min_fill_for(1024, 1024, 602) > min_fill_for(512, 512, 602)
    # wider features too
    assert min_fill_for(512, 512, 1200) > min_fill_for(512, 512, 300)
    # and the threshold is a fill fraction
    assert 0.0 < min_fill_for(512, 512, 602) <= 1.0


def test_empty_split_returns_zeros():
    split = HybridSplit(tiled=None, rest=None, n_rows=16, n_cols=16,
                        dense_edges=0, sparse_edges=0, pad=1.0,
                        min_fill=0.5)
    out = np.asarray(spmm_hybrid_split(split, jnp.ones((16, 8))))
    assert out.shape == (16, 8) and not out.any()


def test_clustered_synthetic_routes_mostly_dense():
    from sgc_tpu.data.synthetic import synthetic_reddit_clustered

    graph, x, labels, idx_train = synthetic_reddit_clustered(0.02)
    # community structure must concentrate edges into admissible cells
    split = split_dense_cells(graph, n_features=x.shape[1], row_block=256,
                              stripe=256, chunk=CHUNK, min_fill=0.5)
    assert split.dense_edges > 0.5 * graph.nnz
    # and the hybrid output stays correct vs the segment path
    xs = jnp.asarray(x[:, :32])
    np.testing.assert_allclose(
        np.asarray(spmm_hybrid_split(split, xs)),
        np.asarray(spmm_segment(graph, xs)), rtol=3e-5, atol=3e-5)


def test_clustered_shuffle_is_exact_relabeling():
    """shuffle=True must be the SAME graph under a node permutation —
    recover the permutation from the (unique, iid-normal) feature rows
    and check adjacency, labels and train ids map through it exactly."""
    import scipy.sparse as sp

    from sgc_tpu.data.synthetic import synthetic_reddit_clustered

    gu, xu, lu, tu = synthetic_reddit_clustered(0.01, shuffle=False)
    gs, xs, ls, ts = synthetic_reddit_clustered(0.01, shuffle=True)
    n = gu.n_rows
    pos_s = {row.tobytes(): i for i, row in enumerate(xs)}
    perm = np.array([pos_s[row.tobytes()] for row in xu])  # perm[old]=new
    assert len(set(perm.tolist())) == n

    np.testing.assert_array_equal(ls[perm], lu)
    np.testing.assert_array_equal(np.sort(perm[tu]), ts)
    assert np.all(np.diff(ts) > 0)  # shuffled train ids arrive sorted

    def coo(g):
        return sp.coo_matrix(
            (np.asarray(g.vals)[: g.nnz],
             (np.asarray(g.rows)[: g.nnz], np.asarray(g.cols)[: g.nnz])),
            shape=(g.n_rows, g.n_cols)).tocsr()

    au, ash = coo(gu), coo(gs)
    # same sparsity pattern and (normalized) values under the permutation
    assert (abs(ash[perm][:, perm] - au)).max() < 1e-6


def test_clustered_synthetic_contract_matches_uniform():
    from sgc_tpu.data.synthetic import (synthetic_reddit,
                                        synthetic_reddit_clustered)

    gu, xu, lu, tu = synthetic_reddit(0.01)
    gc, xc, lc, tc = synthetic_reddit_clustered(0.01)
    assert gu.n_rows == gc.n_rows
    assert xu.shape == xc.shape and lu.shape == lc.shape
    assert np.array_equal(tu, tc)
    # normalized adjacency: rows of S sum to ~sqrt-normalized values, and
    # no NaNs from empty communities
    assert np.isfinite(np.asarray(gc.vals)).all()
