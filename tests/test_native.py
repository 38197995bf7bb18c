"""Native C++ graphprep vs numpy-fallback parity (SURVEY.md §2.4).

Each exported function must produce identical results through the
compiled library and the pure-numpy twin (SGC_TPU_NO_NATIVE path), since
graph container construction silently prefers the fast path.
"""

import importlib
import os

import numpy as np
import pytest
import scipy.sparse as sp

from sgc_tpu import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="native graphprep library not built"
)


def _edges(e=5000, n=512, seed=0, dups=True):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n, e).astype(np.int64)
    cols = rng.integers(0, n, e).astype(np.int64)
    if dups:  # force duplicates to exercise coalesce
        rows[: e // 10] = rows[0]
        cols[: e // 10] = cols[0]
    vals = rng.random(e).astype(np.float32)
    return rows, cols, vals, n


@requires_native
def test_sort_edges_matches_lexsort():
    rows, cols, vals, n = _edges()
    # (.copy() is belt-and-braces only: sort_edges documents that it
    # never mutates its inputs — it takes private copies internally)
    r, c, v = native.sort_edges(rows.copy(), cols.copy(), vals.copy(), n, n)
    order = np.lexsort((cols, rows))
    np.testing.assert_array_equal(r, rows[order])
    np.testing.assert_array_equal(c, cols[order])
    np.testing.assert_allclose(v, vals[order])


@requires_native
def test_row_ptr_matches_scipy_indptr():
    rows, cols, vals, n = _edges(seed=1, dups=False)
    r, c, v = native.sort_edges(rows.copy(), cols.copy(), vals.copy(), n, n)
    ptr = native.row_ptr_from_sorted(r, n)
    expect = np.concatenate(
        ([0], np.cumsum(np.bincount(rows, minlength=n)))
    )
    np.testing.assert_array_equal(ptr, expect)


@requires_native
def test_coalesce_matches_scipy_sum_duplicates():
    rows, cols, vals, n = _edges(seed=2)
    r, c, v = native.sort_edges(rows.copy(), cols.copy(), vals.copy(), n, n)
    rr, cc, vv = native.coalesce(r, c, v)
    m = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    m.sum_duplicates()
    mc = m.tocoo()
    order = np.lexsort((mc.col, mc.row))
    np.testing.assert_array_equal(rr, mc.row[order])
    np.testing.assert_array_equal(cc, mc.col[order])
    np.testing.assert_allclose(vv, mc.data[order], rtol=1e-6)


@requires_native
def test_sym_normalize_matches_scipy_formula():
    rows, cols, vals, n = _edges(seed=3, dups=False)
    # make symmetric and deduped first
    m = sp.coo_matrix((vals, (rows, cols)), shape=(n, n))
    m = (m + m.T).tocsr()
    m.sum_duplicates()
    mc = m.tocoo()
    r, c, v = native.sort_edges(
        mc.row.astype(np.int64), mc.col.astype(np.int64),
        mc.data.astype(np.float32), n, n,
    )
    r0, c0, v0 = r.copy(), c.copy(), v.copy()
    _, _, nv = native.sym_normalize_edges(r, c, v, n)
    # scipy oracle: D^-1/2 A D^-1/2 over the same edge list (no +I here;
    # the aug variant adds self-loops before calling)
    deg = np.zeros(n)
    np.add.at(deg, r0, v0)
    dinv = np.where(deg > 0, deg**-0.5, 0.0)
    np.testing.assert_allclose(nv, dinv[r0] * v0 * dinv[c0], rtol=1e-5)


@requires_native
def test_partition_edges_covers_all_edges():
    rows, cols, vals, n = _edges(seed=4, dups=False)
    r, c, v = native.sort_edges(rows.copy(), cols.copy(), vals.copy(), n, n)
    n_parts, rpp = 4, (n + 3) // 4
    e_max = int(native.edge_counts(r, n_parts, rpp).max()) + 64
    pr, pc, pv = native.partition_edges(r, c, v, n_parts, rpp, e_max, n)
    assert pr.shape == (n_parts, e_max)
    total = 0
    for p in range(n_parts):
        live = pv[p] != 0
        total += int(live.sum())
        # partition rows are LOCAL to the block: in [0, rpp)
        assert np.all((pr[p][live] >= 0) & (pr[p][live] < rpp))
        # reconstruct global rows; all must belong to part p
        assert np.all((pr[p][live] + p * rpp) // rpp == p)
    # zero-valued real edges don't occur with random.random data
    assert total == len(r)


@requires_native
def test_edge_counts_matches_bincount():
    rows, cols, vals, n = _edges(seed=5, dups=False)
    n_parts, rpp = 4, (n + 3) // 4
    counts = native.edge_counts(rows, n_parts, rpp)
    expect = np.bincount(np.minimum(rows // rpp, n_parts - 1),
                         minlength=n_parts)
    np.testing.assert_array_equal(counts, expect)


def test_numpy_fallback_paths(monkeypatch):
    """SGC_TPU_NO_NATIVE forces numpy twins; results must match scipy."""
    rows, cols, vals, n = _edges(seed=6)
    monkeypatch.setenv("SGC_TPU_NO_NATIVE", "1")
    import sgc_tpu.native as nat

    # call through the public API with the lib intentionally bypassed
    lib = nat._lib
    nat._lib = None
    try:
        monkeypatch.setattr(nat, "_try_load", lambda: None)
        r, c, v = nat.sort_edges(rows, cols, vals, n, n)
        # value-check the whole fallback chain against the INDEPENDENT
        # scipy canonicalization (sort + coalesce in one oracle)
        ptr = nat.row_ptr_from_sorted(r, n)
        rr, cc, vv = nat.coalesce(r, c, v)
        oracle = sp.coo_matrix(
            (vals, (rows, cols)), shape=(n, n)
        ).tocsr().tocoo()
        np.testing.assert_array_equal(rr, oracle.row)
        np.testing.assert_array_equal(cc, oracle.col)
        np.testing.assert_allclose(vv, oracle.data, rtol=1e-6)
        # row_ptr of the SORTED (pre-coalesce) list: counts per row match
        # the oracle's occupancy including duplicates
        np.testing.assert_array_equal(
            np.diff(ptr), np.bincount(rows, minlength=n)
        )
        np.testing.assert_array_equal(ptr[-1], len(r))
    finally:
        nat._lib = lib


def test_sort_edges_benchmark_vs_lexsort():
    """Measured parallel-radix vs np.lexsort at 12M edges (report-only —
    VERDICT round-1 #7: numbers backing the 'Python sort is the host
    bottleneck' rationale; correctness asserted, speed printed)."""
    import time

    from sgc_tpu import native

    if not native.available():
        pytest.skip("native library not built")

    rng = np.random.default_rng(0)
    n, e = 1_000_000, 12_000_000
    rows = rng.integers(0, n, e)
    cols = rng.integers(0, n, e)
    vals = rng.random(e).astype(np.float32)

    t0 = time.perf_counter()
    r_n, c_n, v_n = native.sort_edges(rows, cols, vals, n, n)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    order = np.lexsort((cols, rows))
    t_lex = time.perf_counter() - t0
    r_l, c_l, v_l = rows[order], cols[order], vals[order]

    # both sorts are stable by (row, col): results agree exactly,
    # including the val order of duplicate (row, col) pairs
    np.testing.assert_array_equal(r_n, r_l)
    np.testing.assert_array_equal(c_n, c_l)
    np.testing.assert_array_equal(v_n, v_l)

    print(
        f"\nsort_edges 12M edges: native parallel radix "
        f"{t_native:.2f}s vs np.lexsort(sort only) {t_lex:.2f}s "
        f"({t_lex / t_native:.1f}x)"
    )


@requires_native
def test_lpa_labels_native_matches_python_twin_exactly(monkeypatch):
    """Same sweep order + tie-break => bitwise-equal labels and sweep
    count between the C++ path and the per-node python twin."""
    import sgc_tpu.native as nat

    rng = np.random.default_rng(11)
    n, per = 96, 24
    blocks = np.repeat(np.arange(n // per), per)
    r, c = np.triu_indices(n, 1)
    keep = rng.random(len(r)) < np.where(blocks[r] == blocks[c], 0.3, 0.02)
    adj = sp.coo_matrix(
        (np.ones(int(keep.sum()), np.float32), (r[keep], c[keep])),
        shape=(n, n))
    shuffle = rng.permutation(n)
    csr = (adj + adj.T).tocsr()[shuffle][:, shuffle]

    fast, fast_sweeps = nat.lpa_labels(csr.indptr, csr.indices)

    # genuinely force the python twin: _lib = None alone would make
    # _try_load() RELOAD the .so (native vs itself — vacuous)
    monkeypatch.setattr(nat, "_try_load", lambda: None)
    slow, slow_sweeps = nat.lpa_labels(csr.indptr, csr.indices)
    assert slow_sweeps > 0  # twin actually ran its loop
    np.testing.assert_array_equal(fast, slow)
    assert fast_sweeps == slow_sweeps
    assert fast_sweeps <= 20


@requires_native
def test_lpa_labels_recover_planted_blocks():
    import sgc_tpu.native as nat

    rng = np.random.default_rng(3)
    n, per = 256, 64
    blocks = np.repeat(np.arange(n // per), per)
    r, c = np.triu_indices(n, 1)
    keep = rng.random(len(r)) < np.where(blocks[r] == blocks[c], 0.25, 0.005)
    adj = sp.coo_matrix(
        (np.ones(int(keep.sum()), np.float32), (r[keep], c[keep])),
        shape=(n, n))
    csr = (adj + adj.T).tocsr()
    labels, _ = nat.lpa_labels(csr.indptr, csr.indices)
    # every planted block must collapse to ONE label
    for b in range(n // per):
        assert len(np.unique(labels[blocks == b])) == 1


@requires_native
def test_tile_fill_matches_numpy_twin_bitwise(monkeypatch):
    """Native counting-sort tiler must reproduce the lexsort+scatter
    layout EXACTLY (same within-cell order, same padding slots)."""
    import sgc_tpu.native as nat
    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.ops.spmm_pallas import tile_graph

    rng = np.random.default_rng(17)
    n, e = 700, 6000
    r = rng.integers(0, n, e)
    c = rng.integers(0, n, e)
    v = rng.standard_normal(e).astype(np.float32)
    graph = SparseGraph.from_coo(r, c, v, n, n, device=False)

    fast = tile_graph(graph, 128, 128, 1024)

    # force the numpy twin for real (see lpa twin test: _lib=None alone
    # would just reload the .so)
    monkeypatch.setattr(nat, "_try_load", lambda: None)
    assert nat.tile_fill(r, c, v, r, r, r, 1024, 1, 128, 128, 1) is None
    slow = tile_graph(graph, 128, 128, 1024)
    np.testing.assert_array_equal(fast.rows, slow.rows)
    np.testing.assert_array_equal(fast.cols, slow.cols)
    np.testing.assert_array_equal(fast.vals, slow.vals)
    np.testing.assert_array_equal(fast.cell_start, slow.cell_start)
    np.testing.assert_array_equal(fast.cell_nchunks, slow.cell_nchunks)


def test_cell_scatter_matches_numpy_twin_bitwise(monkeypatch):
    """Native fused cell scatter (flat idx + bf16 round + duplicate
    run-sums) must reproduce the numpy astype+reduceat path EXACTLY —
    same bf16 bits, same dense mask, same sparse remainder."""
    import sgc_tpu.native as nat
    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.ops.spmm_blockdense import split_block_dense

    if not nat.available():
        import pytest
        pytest.skip("native library not built")
    # a stale .so without the symbol would make this test vacuous (fast
    # silently falls back to the numpy twin and compares it with itself)
    assert hasattr(nat._try_load(), "cell_scatter_bf16"), \
        "stale libgraphprep.so: rebuild (missing cell_scatter_bf16)"

    rng = np.random.default_rng(23)
    n, e = 700, 9000
    r = rng.integers(0, n, e)
    c = rng.integers(0, n, e)
    # inject duplicate (row, col) pairs — they must SUM before rounding
    r[500:600] = r[100:200]
    c[500:600] = c[100:200]
    v = rng.standard_normal(e).astype(np.float32)
    graph = SparseGraph.from_coo(r, c, v, n, n, device=False)

    fast = split_block_dense(graph, 64, row_block=128, stripe=128,
                             min_edges=0)
    assert fast.n_cells > 0 and fast.sparse_edges == 0

    monkeypatch.setattr(nat, "_try_load", lambda: None)
    assert not nat.cell_scatter(r, c, v, r, 1, 128, 128,
                                np.zeros(1, np.uint16),
                                np.zeros(1, np.uint8))
    slow = split_block_dense(graph, 64, row_block=128, stripe=128,
                             min_edges=0)
    np.testing.assert_array_equal(fast.cells.view(np.uint16),
                                  slow.cells.view(np.uint16))
    np.testing.assert_array_equal(fast.rb_ids, slow.rb_ids)
    np.testing.assert_array_equal(fast.st_ids, slow.st_ids)
    assert fast.dense_edges == slow.dense_edges
    assert fast.sparse_edges == slow.sparse_edges


def test_cell_scatter_sparse_remainder_parity(monkeypatch):
    """With a real sparse remainder the native mask must route the same
    edges to the same `rest` graph as the numpy twin."""
    import sgc_tpu.native as nat
    from sgc_tpu.ops.spmm_blockdense import split_block_dense
    from sgc_tpu.graph.sparse import SparseGraph

    if not nat.available():
        import pytest
        pytest.skip("native library not built")
    assert hasattr(nat._try_load(), "cell_scatter_bf16"), \
        "stale libgraphprep.so: rebuild (missing cell_scatter_bf16)"

    rng = np.random.default_rng(5)
    n = 512
    # one dense diagonal cell + scattered background
    rd = rng.integers(0, 128, 4000)
    cd = rng.integers(0, 128, 4000)
    rs = rng.integers(0, n, 300)
    cs = rng.integers(0, n, 300)
    r = np.concatenate([rd, rs])
    c = np.concatenate([cd, cs])
    v = rng.standard_normal(len(r)).astype(np.float32)
    graph = SparseGraph.from_coo(r, c, v, n, n, device=False)

    fast = split_block_dense(graph, 64, row_block=128, stripe=128,
                             min_edges=1000)
    assert fast.n_cells >= 1 and fast.sparse_edges > 0

    monkeypatch.setattr(nat, "_try_load", lambda: None)
    slow = split_block_dense(graph, 64, row_block=128, stripe=128,
                             min_edges=1000)
    np.testing.assert_array_equal(fast.cells.view(np.uint16),
                                  slow.cells.view(np.uint16))
    assert fast.sparse_edges == slow.sparse_edges
    np.testing.assert_array_equal(
        np.asarray(fast.rest.rows)[:fast.rest.nnz],
        np.asarray(slow.rest.rows)[:slow.rest.nnz])
    np.testing.assert_array_equal(
        np.asarray(fast.rest.cols)[:fast.rest.nnz],
        np.asarray(slow.rest.cols)[:slow.rest.nnz])
    np.testing.assert_array_equal(
        np.asarray(fast.rest.vals)[:fast.rest.nnz],
        np.asarray(slow.rest.vals)[:slow.rest.nnz])


def test_cell_scatter_negative_zero_bitwise(monkeypatch):
    """A single -0.0f edge must keep its sign bit (bf16 0x8000): the
    native accumulator seeds with the first element, not 0.0f, exactly
    like the numpy twin's astype (ADVICE round-2 finding)."""
    import sgc_tpu.native as nat
    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.ops.spmm_blockdense import split_block_dense

    if not nat.available():
        import pytest
        pytest.skip("native library not built")
    assert hasattr(nat._try_load(), "cell_scatter_bf16"), \
        "stale libgraphprep.so: rebuild (missing cell_scatter_bf16)"

    r = np.array([0, 1, 2], np.int64)
    c = np.array([0, 1, 2], np.int64)
    v = np.array([-0.0, 1.0, -0.0], np.float32)
    graph = SparseGraph.from_coo(r, c, v, 8, 8, device=False)

    fast = split_block_dense(graph, 4, row_block=8, stripe=8, min_edges=0)
    monkeypatch.setattr(nat, "_try_load", lambda: None)
    slow = split_block_dense(graph, 4, row_block=8, stripe=8, min_edges=0)
    np.testing.assert_array_equal(fast.cells.view(np.uint16),
                                  slow.cells.view(np.uint16))
    # and the sign bit is actually there (not just twin==twin)
    assert fast.cells.view(np.uint16).ravel()[0] == 0x8000
