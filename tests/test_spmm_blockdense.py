"""Block-dense SpMM vs scipy oracles (bf16-storage tolerance)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from sgc_tpu.graph.normalize import aug_normalized_adjacency
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.ops.spmm_blockdense import (
    blockdense_device_args,
    min_edges_for,
    split_block_dense,
    spmm_block_dense,
)

# cells are STORED bf16 (the design point: the MXU rounds operands to
# bf16 regardless; f32 cells OOM at Reddit scale) — oracle comparisons
# carry bf16-rounding tolerance on the dense part.
BF16_RTOL = 2e-2
BF16_ATOL = 2e-3   # ~100-term sums of bf16-rounded products (vals ~0.1)


def _clustered(seed=0, n_clusters=4, per=128, p_in=0.4, p_out=0.01):
    rng = np.random.default_rng(seed)
    n = n_clusters * per
    blocks = np.repeat(np.arange(n_clusters), per)
    r, c = np.triu_indices(n, 1)
    keep = rng.random(len(r)) < np.where(blocks[r] == blocks[c], p_in, p_out)
    adj = sp.coo_matrix(
        (np.ones(int(keep.sum()), np.float32), (r[keep], c[keep])),
        shape=(n, n))
    adj = (adj + adj.T).tocsr()
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj),
                                   device=False)
    x = rng.standard_normal((n, 48)).astype(np.float32)
    return graph, x


def test_blockdense_matches_scipy_oracle():
    graph, x = _clustered()
    split = split_block_dense(graph, x.shape[1], row_block=128, stripe=128,
                              min_edges=64)
    assert split.n_cells >= 4          # the 4 diagonal communities
    assert split.dense_edges > split.sparse_edges

    got = np.asarray(spmm_block_dense(split, jnp.asarray(x)))
    want = graph.to_scipy().tocsr() @ x
    np.testing.assert_allclose(got, want, rtol=BF16_RTOL, atol=BF16_ATOL)


def test_blockdense_no_qualifying_cells_is_pure_segment():
    """Structureless graph + high threshold => exact segment path."""
    rng = np.random.default_rng(1)
    n, e = 300, 2000
    adj = sp.coo_matrix(
        (rng.random(e).astype(np.float32),
         (rng.integers(0, n, e), rng.integers(0, n, e))), shape=(n, n))
    graph = SparseGraph.from_scipy(adj.tocsr(), device=False)
    x = rng.standard_normal((n, 16)).astype(np.float32)

    split = split_block_dense(graph, 16, row_block=128, stripe=128,
                              min_edges=1e9)
    assert split.n_cells == 0 and split.dense_edges == 0
    got = np.asarray(spmm_block_dense(split, jnp.asarray(x)))
    want = graph.to_scipy().tocsr() @ x
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)  # f32 exact


def test_blockdense_byte_budget_admits_densest_first():
    graph, x = _clustered(p_in=0.5)
    full = split_block_dense(graph, x.shape[1], row_block=128, stripe=128,
                             min_edges=64)
    one_cell_bytes = 2 * 128 * 128
    capped = split_block_dense(graph, x.shape[1], row_block=128, stripe=128,
                               min_edges=64,
                               byte_budget=2 * one_cell_bytes)
    assert capped.n_cells == 2 < full.n_cells
    # result stays exact regardless of the cut
    got = np.asarray(spmm_block_dense(capped, jnp.asarray(x)))
    want = graph.to_scipy().tocsr() @ x
    np.testing.assert_allclose(got, want, rtol=BF16_RTOL, atol=BF16_ATOL)


def test_blockdense_sums_duplicate_edges():
    """from_coo does not coalesce; duplicate (row, col) must SUM into
    the materialized cell (the fancy-assignment fast path would
    silently keep only one)."""
    rows = np.array([0, 0, 1], np.int64)
    cols = np.array([1, 1, 0], np.int64)
    vals = np.array([0.5, 0.25, 1.0], np.float32)
    graph = SparseGraph.from_coo(rows, cols, vals, 4, 4, device=False)
    split = split_block_dense(graph, 8, row_block=4, stripe=4, min_edges=0)
    assert split.n_cells == 1
    x = np.eye(4, 8, dtype=np.float32)
    got = np.asarray(spmm_block_dense(split, jnp.asarray(x)))
    assert got[0, 1] == pytest.approx(0.75, rel=1e-2)
    assert got[1, 0] == pytest.approx(1.0, rel=1e-2)


def test_blockdense_missing_args_guards():
    graph, x = _clustered(seed=2)
    split = split_block_dense(graph, x.shape[1], row_block=128, stripe=128,
                              min_edges=64)
    with pytest.raises(ValueError, match="dense cells"):
        spmm_block_dense(split, jnp.asarray(x), args=(None, split.rest))
    if split.rest is not None:
        dense, _ = blockdense_device_args(split)
        with pytest.raises(ValueError, match="remainder"):
            spmm_block_dense(split, jnp.asarray(x), args=(dense, None))


def test_blockdense_deterministic():
    graph, x = _clustered(seed=3)
    split = split_block_dense(graph, x.shape[1], row_block=128, stripe=128,
                              min_edges=64)
    a = np.asarray(spmm_block_dense(split, jnp.asarray(x)))
    b = np.asarray(spmm_block_dense(split, jnp.asarray(x)))
    np.testing.assert_array_equal(a, b)


def test_min_edges_for_is_order_of_cell_flop_crossover():
    # sanity: threshold scales with cell area and features
    small = min_edges_for(128, 128, 64)
    big = min_edges_for(512, 512, 602)
    assert 0 < small < big


def test_blockdense_mixed_duplicates_fix_only_dup_positions():
    """Several duplicate groups interleaved with unique edges: dup
    positions get f32 group sums, unique positions keep their values
    (the fix-up must not disturb the fast-path scatter)."""
    rows = np.array([0, 0, 0, 1, 2, 2, 2, 3], np.int64)
    cols = np.array([1, 2, 2, 3, 0, 0, 1, 3], np.int64)
    vals = np.array([0.5, 0.125, 0.25, 1.0, 0.75, 0.75, 2.0, 3.0],
                    np.float32)
    graph = SparseGraph.from_coo(rows, cols, vals, 4, 4, device=False)
    split = split_block_dense(graph, 8, row_block=4, stripe=4, min_edges=0)
    x = np.eye(4, 8, dtype=np.float32)
    got = np.asarray(spmm_block_dense(split, jnp.asarray(x)))
    want = graph.to_scipy().tocsr().toarray() @ x  # scipy sums dups
    np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=1e-2,
                               atol=1e-3)


def test_blockdense_pallas_matches_scan_path():
    """The Pallas kernel form (streamed blocks, output revisiting) must
    reproduce the scan/einsum path and the scipy oracle — interpret
    mode on CPU."""
    from sgc_tpu.ops.spmm_blockdense import spmm_blockdense_pallas

    graph, x = _clustered(seed=5)
    split = split_block_dense(graph, x.shape[1], row_block=128, stripe=128,
                              min_edges=300)  # cross-community cells stay sparse
    assert split.n_cells > 0 and split.rest is not None

    got = np.asarray(spmm_blockdense_pallas(split, jnp.asarray(x),
                                            interpret=True))
    scan = np.asarray(spmm_block_dense(split, jnp.asarray(x)))
    np.testing.assert_allclose(got, scan, rtol=1e-5, atol=1e-5)
    want = graph.to_scipy().tocsr() @ x
    np.testing.assert_allclose(got, want, rtol=BF16_RTOL, atol=BF16_ATOL)


def test_blockdense_pallas_unvisited_row_blocks_zero():
    """A row range with no dense cell must come out exactly zero from
    the kernel path (its output slots are never visited)."""
    from sgc_tpu.ops.spmm_blockdense import spmm_blockdense_pallas

    rng = np.random.default_rng(6)
    n = 256
    # edges only among the first 64 nodes -> row blocks 1..3 unvisited
    r = rng.integers(0, 64, 800)
    c = rng.integers(0, 64, 800)
    adj = sp.coo_matrix((np.ones(800, np.float32), (r, c)), shape=(n, n))
    graph = SparseGraph.from_scipy(adj.tocsr(), device=False)
    x = rng.standard_normal((n, 16)).astype(np.float32)
    split = split_block_dense(graph, 16, row_block=64, stripe=64,
                              min_edges=1)
    assert split.rest is None  # everything dense
    got = np.asarray(spmm_blockdense_pallas(split, jnp.asarray(x),
                                            interpret=True))
    want = graph.to_scipy().tocsr() @ x
    # unnormalized ones-weights: bf16 x-rounding errors scale with |x|
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
    assert np.all(got[64:] == 0.0)


def test_spmm_dispatcher_blockdense_impl():
    """spmm(impl='blockdense') end-to-end with split caching."""
    from sgc_tpu.ops import spmm_blockdense as mod
    from sgc_tpu.ops.spmm import spmm

    graph, x = _clustered(seed=12)
    before = len(mod._SPLIT_CACHE)
    a = np.asarray(spmm(graph, jnp.asarray(x), impl="blockdense"))
    b = np.asarray(spmm(graph, jnp.asarray(x), impl="blockdense"))
    assert len(mod._SPLIT_CACHE) == before + 1  # second call hit the cache
    np.testing.assert_array_equal(a, b)
    want = graph.to_scipy().tocsr() @ x
    np.testing.assert_allclose(a, want, rtol=BF16_RTOL, atol=BF16_ATOL)


def test_sgc_precompute_blockdense_impl():
    """impl='blockdense' through sgc_precompute (crashed with a tracer
    TypeError before round 4's review fix): must match the segment
    propagation to bf16-cell tolerance, with and without out_rows."""
    import numpy as np

    from sgc_tpu.ops.propagate import sgc_precompute

    graph, x = _clustered(seed=4, n_clusters=2, per=128)
    ref, _ = sgc_precompute(x, graph, 2, impl="segment")
    got, _ = sgc_precompute(x, graph, 2, impl="blockdense")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    rows = np.arange(0, 256, 3)
    ref_r, _ = sgc_precompute(x, graph, 2, impl="segment", out_rows=rows)
    got_r, _ = sgc_precompute(x, graph, 2, impl="blockdense",
                              out_rows=rows)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(ref_r),
                               rtol=2e-2, atol=2e-2)


def test_super_rows_order_and_parity():
    """super_rows cell order (rb//S, st, rb): the Pallas super kernel is
    BITWISE-equal to the classic kernel in interpret mode, the scan form
    accepts the reordered split, and partial admission (remainder +
    unvisited row blocks) stays exact (scripts/exp_super_rows.py is the
    hardware A/B: 46.5 -> 40.3 ms on the full-scale dense term)."""
    import numpy as np

    import jax.numpy as jnp

    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.ops.spmm import spmm_segment
    from sgc_tpu.ops.spmm_blockdense import (
        spmm_block_dense,
        spmm_blockdense_pallas,
        split_block_dense,
    )

    rng = np.random.default_rng(3)
    n, e = 1030, 20000
    g = SparseGraph.from_coo(
        rng.integers(0, n, e), rng.integers(0, n, e),
        rng.standard_normal(e).astype(np.float32), n, n, device=False)
    x = jnp.asarray(rng.standard_normal((n, 37)).astype(np.float32))
    ref = np.asarray(spmm_segment(g, x))

    sp0 = split_block_dense(g, 37, row_block=128, stripe=128, min_edges=0)
    for S in (4, 8):
        spS = split_block_dense(g, 37, row_block=128, stripe=128,
                                min_edges=0, super_rows=S)
        assert spS.n_cells == sp0.n_cells and spS.super_rows == S
        # order contract: (rb//S, st, rb) ascending over real cells
        rb = spS.rb_ids[: spS.n_cells].astype(np.int64)
        st = spS.st_ids[: spS.n_cells].astype(np.int64)
        key = ((rb // S) << 40) | (st << 20) | rb
        assert (np.diff(key) > 0).all()

        out0 = np.asarray(spmm_blockdense_pallas(
            sp0, x, interpret=True, precision="f32"))
        outS = np.asarray(spmm_blockdense_pallas(
            spS, x, interpret=True, precision="f32"))
        np.testing.assert_array_equal(outS, out0)
        scan = np.asarray(spmm_block_dense(spS, x, precision="f32"))
        np.testing.assert_allclose(scan, out0, rtol=1e-5, atol=1e-5)

    # partial admission: remainder + unvisited row blocks stay exact
    spP = split_block_dense(g, 37, row_block=128, stripe=128,
                            min_edges=25, super_rows=4)
    assert spP.sparse_edges > 0
    outP = np.asarray(spmm_blockdense_pallas(
        spP, x, interpret=True, precision="f32"))
    scale = np.abs(ref).max()
    assert np.abs(outP - ref).max() / scale < 1e-2  # bf16 cell storage


def test_group_cells_layout_and_parity():
    """group_cells=G: (panel, stripe) runs padded to G with zero cells;
    the grouped kernel (G matmuls per grid step, one stripe block) is
    bitwise-equal to the classic kernel in interpret mode. Hardware A/B
    measured the grouping NEGATIVE at full scale (padding's extra cell
    reads + zero matmuls outweigh the step savings: S8 42.1 ms vs
    S8G2 43.0 / S8G4 45.0 — scripts/exp_super_rows.py), so it stays
    opt-in; this test keeps the machinery correct."""
    import numpy as np

    import jax.numpy as jnp
    import pytest

    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.ops.spmm_blockdense import (
        spmm_blockdense_pallas,
        split_block_dense,
    )

    rng = np.random.default_rng(11)
    n, e = 900, 15000
    g = SparseGraph.from_coo(
        rng.integers(0, n, e), rng.integers(0, n, e),
        rng.standard_normal(e).astype(np.float32), n, n, device=False)
    x = jnp.asarray(rng.standard_normal((n, 25)).astype(np.float32))
    sp0 = split_block_dense(g, 25, row_block=128, stripe=128, min_edges=0)
    spG = split_block_dense(g, 25, row_block=128, stripe=128, min_edges=0,
                            super_rows=4, group_cells=4)
    # layout: slot count is a G-multiple, real cells preserved, pad
    # slots repeat their run's (rb, st)
    assert spG.cells.shape[0] % 4 == 0
    assert spG.n_cells == sp0.n_cells
    assert spG.cells.shape[0] >= spG.n_cells
    out0 = np.asarray(spmm_blockdense_pallas(
        sp0, x, interpret=True, precision="f32"))
    outG = np.asarray(spmm_blockdense_pallas(
        spG, x, interpret=True, precision="f32"))
    np.testing.assert_array_equal(outG, out0)

    with pytest.raises(ValueError, match="super_rows"):
        split_block_dense(g, 25, row_block=128, stripe=128,
                          group_cells=4)
    with pytest.raises(ValueError, match="CELL_CHUNK"):
        split_block_dense(g, 25, row_block=128, stripe=128,
                          super_rows=4, group_cells=3)
