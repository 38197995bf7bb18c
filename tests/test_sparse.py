"""SparseGraph container + normalization unit tests vs scipy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sgc_tpu.graph.normalize import (
    aug_normalized_adjacency,
    normalize_adjacency_device,
    row_normalize,
    standardize_features,
    symmetrize_max,
)
from sgc_tpu.graph.sparse import SparseGraph, pad_edges_to


def random_sparse(n_rows, n_cols, density, seed=0):
    rng = np.random.default_rng(seed)
    mat = sp.random(
        n_rows, n_cols, density=density, format="coo", random_state=rng,
        data_rvs=lambda k: rng.standard_normal(k).astype(np.float32),
    )
    return mat


def test_pad_edges_to():
    assert pad_edges_to(0) == 1024
    assert pad_edges_to(1) == 1024
    assert pad_edges_to(1024) == 1024
    assert pad_edges_to(1025) == 2048
    assert pad_edges_to(7, multiple=4) == 8


def test_roundtrip_scipy():
    mat = random_sparse(50, 70, 0.1)
    g = SparseGraph.from_scipy(mat)
    assert g.n_rows == 50 and g.n_cols == 70
    assert g.nnz == mat.nnz
    assert g.n_edges_padded % 1024 == 0
    back = g.to_scipy()
    np.testing.assert_allclose(back.toarray(), mat.toarray(), rtol=1e-6)


def test_rows_sorted_and_padding_zero():
    g = SparseGraph.from_scipy(random_sparse(30, 30, 0.2, seed=1))
    rows = np.asarray(g.rows)
    assert (np.diff(rows) >= 0).all()
    assert (np.asarray(g.vals)[g.nnz:] == 0).all()
    assert (np.asarray(g.rows)[g.nnz:] < g.n_rows).all()


def test_row_ptr_matches_csr():
    mat = random_sparse(40, 40, 0.15, seed=2)
    g = SparseGraph.from_scipy(mat)
    csr = mat.tocsr()
    np.testing.assert_array_equal(np.asarray(g.row_ptr), csr.indptr)


def test_transpose():
    mat = random_sparse(20, 35, 0.2, seed=3)
    g = SparseGraph.from_scipy(mat).transpose()
    np.testing.assert_allclose(
        g.to_scipy().toarray(), mat.T.toarray(), rtol=1e-6
    )


def test_degrees():
    mat = random_sparse(25, 25, 0.3, seed=4)
    g = SparseGraph.from_scipy(mat)
    np.testing.assert_allclose(
        np.asarray(g.degrees()), np.asarray(mat.sum(1)).ravel(), rtol=1e-5
    )


def test_aug_normalized_adjacency_matches_formula():
    rng = np.random.default_rng(5)
    a = (rng.random((30, 30)) < 0.1).astype(np.float32)
    a = np.maximum(a, a.T)
    np.fill_diagonal(a, 0)
    s = aug_normalized_adjacency(sp.coo_matrix(a)).toarray()
    a_tilde = a + np.eye(30)
    d = a_tilde.sum(1)
    expected = a_tilde / np.sqrt(np.outer(d, d))
    np.testing.assert_allclose(s, expected, rtol=1e-6)


def test_device_normalization_matches_host():
    rng = np.random.default_rng(6)
    a = (rng.random((40, 40)) < 0.15).astype(np.float32)
    a = np.maximum(a, a.T)
    np.fill_diagonal(a, 0)
    host = aug_normalized_adjacency(sp.coo_matrix(a)).toarray()

    a_with_loops = sp.coo_matrix(a + np.eye(40, dtype=np.float32))
    g = SparseGraph.from_scipy(a_with_loops)
    dev = normalize_adjacency_device(g)
    np.testing.assert_allclose(dev.to_scipy().toarray(), host, rtol=1e-5)


def test_row_normalize_zero_rows():
    mat = sp.csr_matrix(np.array([[1.0, 3.0], [0.0, 0.0]]))
    out = row_normalize(mat)
    np.testing.assert_allclose(
        np.asarray(out.todense()), [[0.25, 0.75], [0.0, 0.0]]
    )


def test_symmetrize_max():
    a = sp.coo_matrix(np.array([[0, 2.0], [1.0, 0]]))
    out = symmetrize_max(a).toarray()
    np.testing.assert_allclose(out, [[0, 2.0], [2.0, 0]])


def test_standardize_features_unbiased():
    x = jnp.asarray(np.random.default_rng(7).random((100, 5)), dtype=jnp.float32)
    out = np.asarray(standardize_features(x))
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(0, ddof=1), 1.0, atol=1e-4)


def test_graph_save_load_roundtrip(tmp_path):
    from sgc_tpu.graph.sparse import load_graph, save_graph

    rng = np.random.default_rng(0)
    m = sp.random(50, 70, density=0.05, format="csr", dtype=np.float32)
    g = SparseGraph.from_scipy(m)
    save_graph(tmp_path / "g.npz", g)
    back = load_graph(tmp_path / "g.npz")
    assert back.shape == g.shape and back.nnz == g.nnz
    np.testing.assert_allclose(
        back.to_scipy().toarray(), m.toarray(), rtol=1e-6
    )


def test_block_diag_batches_graphs():
    import jax.numpy as jnp

    from sgc_tpu.graph.sparse import block_diag
    from sgc_tpu.ops.spmm import spmm

    rng = np.random.default_rng(1)
    members = []
    for n in (8, 12, 16):
        m = sp.random(n, n, density=0.3, format="csr", dtype=np.float32)
        members.append(SparseGraph.from_scipy(m))
    batched, offsets = block_diag(members)
    assert batched.shape == (36, 36)
    np.testing.assert_array_equal(offsets, [0, 8, 20, 36])

    # one SpMM over the batch == per-member SpMMs
    x = rng.standard_normal((36, 4)).astype(np.float32)
    out = np.asarray(spmm(batched, jnp.asarray(x)))
    for g, lo, hi in zip(members, offsets[:-1], offsets[1:]):
        expect = np.asarray(spmm(g, jnp.asarray(x[lo:hi])))
        np.testing.assert_allclose(out[lo:hi], expect, rtol=1e-5, atol=1e-6)


def test_rwalk_normalization_row_stochastic():
    from sgc_tpu.graph.normalize import rw_normalized_adjacency

    rng = np.random.default_rng(0)
    a = sp.random(40, 40, density=0.1, format="csr", dtype=np.float32)
    a = a + a.T
    s = rw_normalized_adjacency(a)
    sums = np.asarray(s.sum(axis=1)).ravel()
    np.testing.assert_allclose(sums, 1.0, atol=1e-6)   # row-stochastic


def test_sym_normalization_no_selfloops():
    from sgc_tpu.graph.normalize import sym_normalized_adjacency

    a = sp.csr_matrix(np.array([[0, 2.0], [2.0, 0]], np.float32))
    s = sym_normalized_adjacency(a).toarray()
    # D = diag(2,2); D^-1/2 A D^-1/2 = [[0,1],[1,0]]
    np.testing.assert_allclose(s, [[0, 1], [1, 0]], atol=1e-6)
    assert s[0, 0] == 0.0  # no self-loop added


def test_normalization_registry_lists_all():
    from sgc_tpu.graph.normalize import fetch_normalization

    for name in ("AugNormAdj", "TextAugNormAdj", "RWalkAdj", "NormAdj",
                 "NoNorm"):
        assert callable(fetch_normalization(name))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fetch_normalization("Bogus")


def test_row_subgraph_equals_sliced_spmm():
    """spmm(g.row_subgraph(idx), x) == spmm(g, x)[idx] — the dead-row
    elimination used by the bench's final hop."""
    import jax.numpy as jnp

    from sgc_tpu.ops.spmm import spmm

    rng = np.random.default_rng(11)
    n, e, f = 300, 2500, 17
    g = SparseGraph.from_coo(
        rng.integers(0, n, e), rng.integers(0, n, e),
        rng.random(e).astype(np.float32), n, n,
    )
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    idx = np.sort(rng.choice(n, 120, replace=False))

    full = np.asarray(spmm(g, x, impl="segment"))[idx]
    sub = np.asarray(spmm(g.row_subgraph(idx), x, impl="segment"))
    np.testing.assert_allclose(sub, full, rtol=1e-6, atol=1e-6)

    # unsorted (but unique) selections also work — renumber, not mask
    idx2 = np.array([5, 17, 2, 299, 0])
    full2 = np.asarray(spmm(g, x, impl="segment"))[idx2]
    sub2 = np.asarray(spmm(g.row_subgraph(idx2), x, impl="segment"))
    np.testing.assert_allclose(sub2, full2, rtol=1e-6, atol=1e-6)

    import pytest

    with pytest.raises(ValueError):
        g.row_subgraph(np.array([1, 1, 2]))


def test_row_subgraph_bitwise_identical_reduction():
    """bench.py's hop-2 claim is BITWISE identity, not just allclose:
    row_subgraph preserves each row's col-sorted edge sequence, so the
    f32 segment reduction order is unchanged."""
    import jax.numpy as jnp

    from sgc_tpu.ops.spmm import spmm

    rng = np.random.default_rng(12)
    n, e, f = 257, 4001, 19
    g = SparseGraph.from_coo(
        rng.integers(0, n, e), rng.integers(0, n, e),
        (rng.random(e).astype(np.float32) * 7 + 0.01), n, n,
    )
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    idx = np.sort(rng.choice(n, 100, replace=False))

    full = np.asarray(spmm(g, x, impl="segment"))[idx]
    sub = np.asarray(spmm(g.row_subgraph(idx), x, impl="segment"))
    np.testing.assert_array_equal(sub, full)  # exact, not allclose


def test_from_coo_presorted_matches_sorted_build():
    import numpy as np

    from sgc_tpu.graph.sparse import SparseGraph

    rng = np.random.default_rng(4)
    r = np.sort(rng.integers(0, 50, 300))
    # make (row, col) lexicographically sorted
    c = rng.integers(0, 50, 300)
    order = np.lexsort((c, r))
    r, c = r[order], c[order]
    v = rng.standard_normal(300).astype(np.float32)

    a = SparseGraph.from_coo(r, c, v, 50, 50, device=False)
    b = SparseGraph.from_coo(r, c, v, 50, 50, device=False, presorted=True)
    np.testing.assert_array_equal(np.asarray(a.rows), np.asarray(b.rows))
    np.testing.assert_array_equal(np.asarray(a.cols), np.asarray(b.cols))
    np.testing.assert_array_equal(np.asarray(a.vals), np.asarray(b.vals))
    np.testing.assert_array_equal(np.asarray(a.row_ptr),
                                  np.asarray(b.row_ptr))


def test_from_coo_presorted_rejects_unsorted():
    import numpy as np
    import pytest

    from sgc_tpu.graph.sparse import SparseGraph

    with pytest.raises(ValueError, match="presorted"):
        SparseGraph.from_coo(
            np.array([1, 0]), np.array([0, 0]),
            np.ones(2, np.float32), 2, 2, presorted=True)
    # row ties with descending cols must also be caught
    with pytest.raises(ValueError, match="presorted"):
        SparseGraph.from_coo(
            np.array([0, 0]), np.array([1, 0]),
            np.ones(2, np.float32), 2, 2, presorted=True)
