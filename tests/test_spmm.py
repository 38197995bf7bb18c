"""SpMM / SDDMM / propagation correctness vs scipy oracles."""

import jax
import numpy as np
import pytest
import scipy.sparse as sp

from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.ops.propagate import propagate
from sgc_tpu.ops.spmm import sddmm, spmm, spmm_chunked, spmm_segment


def random_problem(n_rows=200, n_cols=150, f=33, density=0.05, seed=0):
    rng = np.random.default_rng(seed)
    mat = sp.random(
        n_rows, n_cols, density=density, format="coo", random_state=rng,
        data_rvs=lambda k: rng.standard_normal(k).astype(np.float32),
    )
    x = rng.standard_normal((n_cols, f)).astype(np.float32)
    return SparseGraph.from_scipy(mat), mat, x


@pytest.mark.parametrize("impl", ["segment", "chunked"])
def test_spmm_matches_scipy(impl):
    g, mat, x = random_problem()
    out = np.asarray(spmm(g, x, impl=impl))
    expected = mat @ x
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_spmm_impls_agree():
    g, _, x = random_problem(seed=1)
    a = np.asarray(spmm_segment(g, x))
    b = np.asarray(spmm_chunked(g, x, chunk=512))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_spmm_empty_rows():
    # Rows with no edges must be exactly zero.
    mat = sp.coo_matrix(
        (np.ones(2, np.float32), ([0, 3], [1, 2])), shape=(5, 4)
    )
    x = np.ones((4, 3), np.float32)
    out = np.asarray(spmm(SparseGraph.from_scipy(mat), x))
    np.testing.assert_array_equal(out[[1, 2, 4]], 0.0)
    np.testing.assert_array_equal(out[[0, 3]], 1.0)


def test_spmm_under_jit_and_grad():
    g, mat, x = random_problem(n_rows=50, n_cols=50, f=8, seed=2)

    @jax.jit
    def f(xx):
        return spmm(g, xx).sum()

    grad = np.asarray(jax.grad(f)(jax.numpy.asarray(x)))
    # d/dX (1^T S X 1) = S^T 1 broadcast over features
    expected = np.repeat(
        np.asarray(mat.sum(0)).ravel()[:, None], x.shape[1], axis=1
    )
    np.testing.assert_allclose(grad, expected, rtol=1e-4, atol=1e-5)


def test_propagate_k_hops():
    g, mat, x = random_problem(n_rows=80, n_cols=80, f=16, seed=3)
    for k in (1, 2, 3):
        out = np.asarray(propagate(jax.numpy.asarray(x), g, k))
        expected = x.copy()
        for _ in range(k):
            expected = mat @ expected
        np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-4)


def test_propagate_collect_hops():
    g, mat, x = random_problem(n_rows=40, n_cols=40, f=4, seed=4)
    out, hops = propagate(jax.numpy.asarray(x), g, 3, collect_hops=True)
    assert len(hops) == 3
    np.testing.assert_allclose(np.asarray(hops[-1]), np.asarray(out))
    expected = mat @ x
    np.testing.assert_allclose(np.asarray(hops[0]), expected, rtol=1e-3, atol=1e-5)


def test_sddmm_matches_dense():
    g, mat, _ = random_problem(n_rows=60, n_cols=45, f=0, seed=5)
    rng = np.random.default_rng(6)
    a = rng.standard_normal((60, 7)).astype(np.float32)
    b = rng.standard_normal((45, 7)).astype(np.float32)
    out = np.asarray(sddmm(g, a, b))
    full = a @ b.T
    rows = np.asarray(g.rows)[: g.nnz]
    cols = np.asarray(g.cols)[: g.nnz]
    np.testing.assert_allclose(out[: g.nnz], full[rows, cols], rtol=1e-4, atol=1e-5)
    # padding slots ([nnz, E_pad)) are exactly 0 (positional mask)
    assert out.shape[0] == g.n_edges_padded
    assert np.all(out[g.nnz:] == 0.0)


def test_spmm_deterministic():
    """Bitwise agreement across runs AND across the two XLA
    implementations (different programs, same fixed edge order) — the
    self-compare alone cannot catch reduction-order drift, since one
    cached executable trivially repeats itself."""
    g, _, x = random_problem(seed=7)
    a = np.asarray(spmm(g, x, impl="segment"))
    b = np.asarray(spmm(g, x, impl="segment"))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(spmm_chunked(g, x))
    np.testing.assert_array_equal(a, c)


class TestPropagationVariants:
    def _setup(self, n=100, e=800, f=8, seed=0):
        import jax.numpy as jnp
        import scipy.sparse as sp

        from sgc_tpu.graph.normalize import aug_normalized_adjacency

        rng = np.random.default_rng(seed)
        adj = sp.coo_matrix(
            (np.ones(e, np.float32),
             (rng.integers(0, n, e), rng.integers(0, n, e))),
            shape=(n, n),
        )
        graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj + adj.T))
        x = jnp.asarray(rng.standard_normal((n, f), dtype=np.float32))
        return graph, x

    def test_appnp_alpha_zero_is_sgc(self):
        from sgc_tpu.ops.propagate import propagate, propagate_appnp

        graph, x = self._setup()
        appnp = propagate_appnp(x, graph, 3, alpha=0.0)
        sgc = propagate(x, graph, 3)
        np.testing.assert_allclose(
            np.asarray(appnp), np.asarray(sgc), rtol=1e-5, atol=1e-6
        )

    def test_appnp_matches_recurrence_oracle(self):
        from sgc_tpu.ops.propagate import propagate_appnp

        graph, x = self._setup(seed=1)
        s = graph.to_scipy()
        xn = np.asarray(x)
        z = xn.copy()
        for _ in range(4):
            z = 0.9 * (s @ z) + 0.1 * xn
        ours = propagate_appnp(x, graph, 4, alpha=0.1)
        np.testing.assert_allclose(np.asarray(ours), z, rtol=1e-4, atol=1e-5)

    def test_ssgc_matches_sum_oracle(self):
        from sgc_tpu.ops.propagate import propagate_ssgc

        graph, x = self._setup(seed=2)
        s = graph.to_scipy()
        xn = np.asarray(x)
        acc, z = np.zeros_like(xn), xn.copy()
        k, a = 3, 0.05
        for _ in range(k):
            z = s @ z
            acc += (1 - a) * z + a * xn
        ours = propagate_ssgc(x, graph, k, alpha=a)
        np.testing.assert_allclose(
            np.asarray(ours), acc / k, rtol=1e-4, atol=1e-5
        )

    def test_registry(self):
        import pytest as _pytest

        from sgc_tpu.ops.propagate import fetch_propagator, propagate

        assert fetch_propagator("sgc") is propagate
        with _pytest.raises(ValueError):
            fetch_propagator("bogus")


def test_sgc_precompute_out_rows_exact():
    """sgc_precompute(out_rows=idx) == full propagation sliced to idx —
    the dead-row-elimination API (bench hop-2 lever, generalized)."""
    import numpy as np

    from sgc_tpu.ops.propagate import sgc_precompute

    rng = np.random.default_rng(21)
    n, e, f = 400, 3000, 24
    g = SparseGraph.from_coo(
        rng.integers(0, n, e), rng.integers(0, n, e),
        rng.random(e).astype(np.float32), n, n,
    )
    x = jax.numpy.asarray(rng.standard_normal((n, f)).astype(np.float32))
    idx = np.sort(rng.choice(n, 150, replace=False))

    for k in (1, 2, 3):
        full, _ = sgc_precompute(x, g, k)
        sub, t = sgc_precompute(x, g, k, out_rows=idx)
        assert sub.shape == (150, f)
        np.testing.assert_allclose(
            np.asarray(sub), np.asarray(full)[idx], rtol=1e-5, atol=1e-6
        )
        assert t >= 0.0


def test_sgc_precompute_out_rows_degree0_and_vals_cache():
    """Round-2 review regressions: (a) degree=0 with out_rows returns the
    row subset of X itself; (b) the cached subset operator must not be
    reused across graphs that share index buffers but differ in vals
    (with_vals)."""
    import numpy as np

    from sgc_tpu.ops.propagate import sgc_precompute

    rng = np.random.default_rng(33)
    n, e, f = 200, 1500, 8
    g = SparseGraph.from_coo(
        rng.integers(0, n, e), rng.integers(0, n, e),
        rng.random(e).astype(np.float32), n, n,
    )
    x = jax.numpy.asarray(rng.standard_normal((n, f)).astype(np.float32))
    idx = np.sort(rng.choice(n, 60, replace=False))

    # (a) degree 0: S^0 X = X
    out0, _ = sgc_precompute(x, g, 0, out_rows=idx)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(x)[idx])

    # (b) same buffers, different vals -> different results
    out1, _ = sgc_precompute(x, g, 1, out_rows=idx)
    g2 = g.with_vals(g.vals * 2.0)
    out2, _ = sgc_precompute(x, g2, 1, out_rows=idx)
    np.testing.assert_allclose(
        np.asarray(out2), 2.0 * np.asarray(out1), rtol=1e-6
    )


def test_sddmm_preserves_zero_weight_true_edges():
    """Padding is positional: a TRUE edge whose current weight is 0 still
    gets its computed <a_row, b_col> value, so with_vals(sddmm(...)) is
    closed under repeated reweighting (round-2 review fix)."""
    rng = np.random.default_rng(40)
    n, e, f = 60, 200, 8
    rows = rng.integers(0, n, e)
    cols = rng.integers(0, n, e)
    vals = rng.random(e).astype(np.float32)
    vals[:20] = 0.0   # genuine zero-weight edges
    g = SparseGraph.from_coo(rows, cols, vals, n, n)
    a = jax.numpy.asarray(rng.standard_normal((n, f)).astype(np.float32))
    b = jax.numpy.asarray(rng.standard_normal((n, f)).astype(np.float32))

    out = np.asarray(sddmm(g, a, b))
    an, bn = np.asarray(a), np.asarray(b)
    r_ = np.asarray(g.rows)[: g.nnz]
    c_ = np.asarray(g.cols)[: g.nnz]
    expect = (an[r_] * bn[c_]).sum(axis=1)
    np.testing.assert_allclose(out[: g.nnz], expect, rtol=1e-5, atol=1e-6)
    assert np.all(out[g.nnz:] == 0.0)   # padding stays exactly 0

    # reweight twice: second pass must equal the first (closure)
    g2 = g.with_vals(jax.numpy.asarray(out))
    out2 = np.asarray(sddmm(g2, a, b))
    np.testing.assert_array_equal(out, out2)


def test_host_build_cache_semantics():
    """HostBuildCache (the shared pin-and-evict memo): identity keying,
    pinning, eviction, and no cross-key aliasing."""
    import numpy as np

    from sgc_tpu.utils.buildcache import HostBuildCache

    c = HostBuildCache(2)
    a = np.arange(4)
    calls = []

    def build(tag):
        calls.append(tag)
        return tag

    assert c.get((a,), (1,), lambda: build("x")) == "x"
    assert c.get((a,), (1,), lambda: build("never")) == "x"  # hit
    assert calls == ["x"]
    # different extra -> different entry
    assert c.get((a,), (2,), lambda: build("y")) == "y"
    # eviction at cap (FIFO): third distinct key drops the first
    b = np.arange(4)
    assert c.get((b,), (1,), lambda: build("z")) == "z"
    assert len(c) == 2
    assert c.get((a,), (1,), lambda: build("x2")) == "x2"  # was evicted
