"""Pallas SpMM/SDDMM kernel correctness vs the XLA segment-sum oracle.

Runs through the Pallas interpreter on the CPU test mesh — the same
kernel logic that compiles on TPU (SURVEY.md §4b kernel-test strategy).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from sgc_tpu.graph.normalize import aug_normalized_adjacency
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.ops.spmm import sddmm, spmm
from sgc_tpu.ops.spmm_pallas import (
    sddmm_pallas,
    spmm_pallas,
    spmm_pallas_tiled,
    tile_graph,
)


def _graph(n_rows=300, n_cols=300, e=2000, seed=0, square=True):
    rng = np.random.default_rng(seed)
    r = rng.integers(0, n_rows, e)
    c = rng.integers(0, n_cols, e)
    m = sp.coo_matrix(
        (rng.random(e, dtype=np.float32), (r, c)), shape=(n_rows, n_cols)
    ).tocsr()
    m.sum_duplicates()
    return SparseGraph.from_scipy(m), m


class TestTileGraph:
    def test_tiling_preserves_all_edges(self):
        graph, m = _graph()
        t = tile_graph(graph, row_block=64, stripe=64, chunk=16)
        # reconstruct dense matrix from tiled edges
        dense = np.zeros((graph.n_rows, graph.n_cols), np.float64)
        np.add.at(dense, (t.rows, t.cols), t.vals)
        np.testing.assert_allclose(dense, m.toarray(), rtol=1e-6, atol=1e-7)

    def test_cells_index_their_edges(self):
        graph, m = _graph(seed=3)
        t = tile_graph(graph, row_block=128, stripe=96, chunk=32)
        for i in range(t.n_row_blocks):
            for j in range(t.n_stripes):
                s, n = t.cell_start[i, j], t.cell_nchunks[i, j]
                seg = slice(s * t.chunk, (s + n) * t.chunk)
                rr, cc, vv = t.rows[seg], t.cols[seg], t.vals[seg]
                live = vv != 0
                assert np.all(rr[live] // 128 == i)
                assert np.all(cc[live] // 96 == j)

    def test_empty_cells_zero_chunks(self):
        # diagonal matrix: only diagonal cells populated
        m = sp.eye(256, format="csr", dtype=np.float32)
        graph = SparseGraph.from_scipy(m)
        t = tile_graph(graph, row_block=64, stripe=64, chunk=16)
        off_diag = ~np.eye(4, dtype=bool)
        assert np.all(t.cell_nchunks[off_diag] == 0)
        assert np.all(t.cell_nchunks[np.eye(4, dtype=bool)] > 0)


@pytest.mark.parametrize("shape", [(256, 256, 1500), (200, 300, 900)])
def test_spmm_pallas_matches_oracle(shape):
    n_rows, n_cols, e = shape
    graph, m = _graph(n_rows, n_cols, e, seed=1)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((n_cols, 40), dtype=np.float32))
    out = spmm_pallas(
        graph, x, row_block=64, stripe=64, chunk=32, feature_tile=128,
        interpret=True,
    )
    oracle = m @ np.asarray(x)
    assert out.shape == (n_rows, 40)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=3e-2, atol=3e-2)


def test_spmm_pallas_normalized_adjacency_vs_spmm():
    rng = np.random.default_rng(4)
    n, e = 400, 3000
    adj = sp.coo_matrix(
        (np.ones(e, np.float32),
         (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n),
    )
    adj = adj + adj.T
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj))
    x = jnp.asarray(rng.standard_normal((n, 16), dtype=np.float32))
    ours = spmm_pallas(graph, x, row_block=128, stripe=128, chunk=64,
                       interpret=True)
    ref = spmm(graph, x, impl="segment")
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=3e-2, atol=3e-2
    )


def test_spmm_pallas_deterministic():
    graph, _ = _graph(seed=7)
    x = jnp.asarray(
        np.random.default_rng(8).standard_normal((300, 24), dtype=np.float32)
    )
    a = np.asarray(spmm_pallas(graph, x, row_block=64, stripe=64, chunk=32,
                               interpret=True))
    b = np.asarray(spmm_pallas(graph, x, row_block=64, stripe=64, chunk=32,
                               interpret=True))
    np.testing.assert_array_equal(a, b)


def test_sddmm_pallas_matches_oracle():
    graph, m = _graph(n_rows=128, n_cols=128, e=800, seed=5)
    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.standard_normal((128, 32), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((128, 32), dtype=np.float32))
    ours = sddmm_pallas(graph, a, b, chunk=256, interpret=True)
    oracle = sddmm(graph, a, b)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(oracle), rtol=3e-2, atol=3e-2
    )


def test_spmm_dispatch_pallas_impl():
    """ops.spmm(impl='pallas') routes through the kernel."""
    graph, m = _graph(n_rows=128, n_cols=128, e=600, seed=9)
    x = jnp.asarray(
        np.random.default_rng(10).standard_normal((128, 8), dtype=np.float32)
    )
    out = spmm(graph, x, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(out), m @ np.asarray(x), rtol=3e-2, atol=3e-2
    )


def test_sddmm_pallas_nondividing_chunk():
    """Chunk sizes that don't divide the padded edge count still cover
    every edge (regression: floor division left the tail uninitialized)."""
    graph, m = _graph(n_rows=128, n_cols=128, e=700, seed=11)
    rng = np.random.default_rng(12)
    a = jnp.asarray(rng.standard_normal((128, 16), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((128, 16), dtype=np.float32))
    ours = sddmm_pallas(graph, a, b, chunk=768, interpret=True)
    oracle = sddmm(graph, a, b)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(oracle), rtol=3e-2, atol=3e-2
    )


def test_tile_cache_reused():
    from sgc_tpu.ops import spmm_pallas as mod

    graph, _ = _graph(n_rows=96, n_cols=96, e=400, seed=13)
    x = jnp.asarray(
        np.random.default_rng(14).standard_normal((96, 8), dtype=np.float32)
    )
    mod._TILE_CACHE._store.clear()
    mod.spmm_pallas(graph, x, row_block=32, stripe=32, chunk=16,
                    interpret=True)
    assert len(mod._TILE_CACHE) == 1
    entry = next(iter(mod._TILE_CACHE._store.values()))[1]
    mod.spmm_pallas(graph, x, row_block=32, stripe=32, chunk=16,
                    interpret=True)
    assert len(mod._TILE_CACHE) == 1
    assert next(iter(mod._TILE_CACHE._store.values()))[1] is entry


def test_spmm_pallas_f32_tight_parity():
    """precision='f32' one-hots are exact selections: the kernel matches
    the segment path to float32 rounding, not just 3e-2."""
    graph, m = _graph(n_rows=200, n_cols=200, e=1500, seed=21)
    x = jnp.asarray(
        np.random.default_rng(22).standard_normal((200, 24), dtype=np.float32)
    )
    ours = spmm_pallas(graph, x, row_block=64, stripe=64, chunk=32,
                       interpret=True, precision="f32")
    ref = spmm(graph, x, impl="segment")
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_sddmm_padding_slots_zero():
    """Padding edges return exactly 0 from both SDDMM impls (SparseGraph
    invariant; regression: clamped padding produced <a[last], b[last]>)."""
    graph, m = _graph(n_rows=64, n_cols=64, e=50, seed=23)
    rng = np.random.default_rng(24)
    a = jnp.asarray(rng.standard_normal((64, 8), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((64, 8), dtype=np.float32))
    for vals in (sddmm(graph, a, b), sddmm_pallas(graph, a, b, interpret=True)):
        v = np.asarray(vals)
        assert np.all(v[graph.nnz:] == 0.0)
        # the reweighting flow is now safe
        re = graph.with_vals(jnp.asarray(v))
        out = np.asarray(spmm(re, a))
        assert np.all(np.isfinite(out))


def test_cost_estimate_audit_matches_independent_count():
    """The kernel's declared CostEstimate must equal an independent
    enumeration of its matmuls (VERDICT round-1 #9: the cost model is a
    claim about the kernel — audit it, don't trust it)."""
    import jax.experimental.pallas as pl_mod

    from sgc_tpu.cli.pallas_bench import pallas_cost_model
    from sgc_tpu.ops import spmm_pallas as mod

    rng = np.random.default_rng(0)
    n, e, f = 600, 5000, 70
    graph = SparseGraph.from_coo(
        rng.integers(0, n, e), rng.integers(0, n, e),
        rng.random(e).astype(np.float32), n, n,
    )
    x = jnp.asarray(rng.random((n, f)).astype(np.float32))
    R, W, C, Ft = 256, 256, 64, 128
    tiled = mod.tile_graph(graph, row_block=R, stripe=W, chunk=C)

    captured = {}
    orig = pl_mod.pallas_call

    def capture(*args, **kw):
        if "cost_estimate" in kw and kw["cost_estimate"] is not None:
            captured["cost"] = kw["cost_estimate"]
        return orig(*args, **kw)

    mod.pl.pallas_call = capture
    try:
        out = mod.spmm_pallas_tiled(tiled, x, feature_tile=Ft,
                                    interpret=True)
    finally:
        mod.pl.pallas_call = orig
    assert "cost" in captured, "kernel no longer declares a CostEstimate"

    # independent count: walk the actual grid the kernel executes —
    # every chunk of every nonempty cell does one (C,W)@(W,Ft) and one
    # (R,C)@(C,Ft) matmul, once per feature tile
    f_pad = f + ((-f) % min(Ft, max(f, 128)))
    ft = min(Ft, max(f, 128))
    n_ft = f_pad // ft
    flops = 0
    for i in range(tiled.n_row_blocks):
        for j in range(tiled.n_stripes):
            n_chunks = int(tiled.cell_nchunks[i, j])
            flops += n_chunks * (2 * C * W * ft + 2 * R * C * ft) * n_ft
    assert captured["cost"].flops == flops, (
        f"declared {captured['cost'].flops} != enumerated {flops}"
    )

    # the CLI's cost model agrees with the kernel's declaration,
    # bytes included
    model = pallas_cost_model(tiled, f, feature_tile=Ft)
    assert model["flops"] == flops
    assert model["bytes_accessed"] == captured["cost"].bytes_accessed

    # and the kernel's output is still the correct SpMM
    ref = np.asarray(graph.to_scipy() @ np.asarray(x))
    got = np.asarray(out)[:n, :f]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # --- flat (gen-2) kernel: same matmul enumeration, its own bytes
    # schedule (one x-stripe block per chunk instead of every stripe per
    # row block) — the CLI's flat=True model must match its declaration
    captured.clear()
    mod.pl.pallas_call = capture
    try:
        out_flat = mod.spmm_pallas_flat(tiled, x, feature_tile=Ft,
                                        interpret=True)
    finally:
        mod.pl.pallas_call = orig
    assert "cost" in captured
    assert captured["cost"].flops == flops
    model_flat = pallas_cost_model(tiled, f, feature_tile=Ft, flat=True)
    assert model_flat["flops"] == flops
    assert model_flat["bytes_accessed"] == captured["cost"].bytes_accessed
    # flat skips the empty-cell stripe streams, so it must never model
    # MORE x traffic than the manual-DMA schedule on the same tiling
    assert model_flat["bytes_accessed"] <= model["bytes_accessed"]
    np.testing.assert_allclose(np.asarray(out_flat)[:n, :f], ref,
                               rtol=1e-4, atol=1e-4)


def test_pallas_kernels_zero_edge_graph():
    """nnz=0 (e.g. a row_subgraph of isolated nodes): both generations
    must return zeros instead of crashing on an empty chunk schedule
    (review finding: the flat kernel built a (n_ft, 0) grid)."""
    from sgc_tpu.ops import spmm_pallas as mod

    g = SparseGraph.from_coo(
        np.zeros(0, np.int32), np.zeros(0, np.int32),
        np.zeros(0, np.float32), 300, 300,
    )
    x = jnp.asarray(np.random.default_rng(0).random((300, 40), np.float32))
    tiled = mod.tile_graph(g, row_block=256, stripe=256, chunk=64)
    for fn in (mod.spmm_pallas_tiled, mod.spmm_pallas_flat):
        out = np.asarray(fn(tiled, x, feature_tile=128, interpret=True))
        assert out.shape[0] >= 300
        np.testing.assert_array_equal(out, 0.0)


def test_pallas_bench_cli_runs(monkeypatch, capsys):
    """pallas_bench CLI end-to-end (interpret mode on CPU)."""
    import json
    import sys

    from sgc_tpu.cli import pallas_bench

    monkeypatch.setattr(sys, "argv", [
        "pallas_bench", "--scale", "0.005", "--row_block", "512",
        "--stripe", "512", "--chunk", "128", "--json",
    ])
    pallas_bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pallas_mode"] == "interpret"
    assert out["xla_edges_per_s"] > 0
    assert out["rel_err_vs_xla"] < 1e-4
    assert out["cost_model"]["flops"] > 0


def test_pallas_bench_cli_blockdense(monkeypatch, capsys):
    """--blockdense leg: clustered synthetic, bf16-cell matmul path."""
    import json
    import sys

    from sgc_tpu.cli import pallas_bench

    monkeypatch.setattr(sys, "argv", [
        "pallas_bench", "--scale", "0.005", "--interpret",
        "--blockdense", "--json",
    ])
    pallas_bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["topology"] == "clustered"
    assert out["blockdense_cells"] > 0
    assert out["blockdense_rel_err_vs_xla"] < 2e-2  # bf16 cells


def test_sddmm_pallas_rectangular_graph():
    """Bipartite/rectangular pattern: a has n_rows nodes, b has n_cols —
    the column one-hot must be built against b's count (round-2 review
    fix; previously crashed on n_rows != n_cols)."""
    from sgc_tpu.ops.spmm import sddmm
    from sgc_tpu.ops.spmm_pallas import sddmm_pallas

    rng = np.random.default_rng(41)
    n_r, n_c, e, f = 48, 80, 300, 16
    g = SparseGraph.from_coo(
        rng.integers(0, n_r, e), rng.integers(0, n_c, e),
        rng.random(e).astype(np.float32), n_r, n_c,
    )
    a = jnp.asarray(rng.standard_normal((n_r, f)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((n_c, f)).astype(np.float32))

    got = np.asarray(sddmm_pallas(g, a, b, interpret=True))
    ref = np.asarray(sddmm(g, a, b))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


class TestFlatKernel:
    """Generation-2 flat-schedule kernel (scalar-prefetch index maps +
    output revisiting) vs the XLA segment oracle, interpret mode."""

    def _check(self, n, e, f, R, W, C, seed=0, n_cols=None):
        from sgc_tpu.ops.spmm_pallas import spmm_pallas_flat, tile_graph

        rng = np.random.default_rng(seed)
        n_cols = n_cols or n
        g = SparseGraph.from_coo(
            rng.integers(0, n, e), rng.integers(0, n_cols, e),
            rng.random(e).astype(np.float32), n, n_cols,
        )
        x = jnp.asarray(rng.standard_normal((n_cols, f)).astype(np.float32))
        tiled = tile_graph(g, row_block=R, stripe=W, chunk=C)
        out = np.asarray(spmm_pallas_flat(tiled, x, interpret=True))
        ref = np.asarray(g.to_scipy() @ np.asarray(x))
        np.testing.assert_allclose(
            out[:n, :f], ref, rtol=1e-4, atol=1e-4
        )
        # padded output rows are exactly zero
        assert np.all(out[n:] == 0.0) or out.shape[0] == n

    def test_square_multi_cell(self):
        self._check(n=700, e=5000, f=70, R=256, W=256, C=64)

    def test_multiple_feature_tiles(self):
        self._check(n=300, e=2500, f=300, R=128, W=128, C=64)

    def test_rectangular(self):
        self._check(n=200, e=1800, f=40, R=128, W=128, C=64, n_cols=500)

    def test_empty_row_blocks_zeroed(self):
        # all edges land in the FIRST row block; later blocks are never
        # visited by the grid and must come back exactly zero
        from sgc_tpu.ops.spmm_pallas import spmm_pallas_flat, tile_graph

        rng = np.random.default_rng(5)
        n, e = 600, 900
        g = SparseGraph.from_coo(
            rng.integers(0, 100, e), rng.integers(0, n, e),
            rng.random(e).astype(np.float32), n, n,
        )
        x = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
        tiled = tile_graph(g, row_block=128, stripe=256, chunk=64)
        out = np.asarray(spmm_pallas_flat(tiled, x, interpret=True))
        ref = np.asarray(g.to_scipy() @ np.asarray(x))
        np.testing.assert_allclose(out[:n, :32], ref, rtol=1e-4, atol=1e-4)
        # blocks beyond the first are never visited -> exactly zero
        assert np.all(out[128:, :] == 0.0)
        assert np.all(ref[128:] == 0.0)

    def test_bf16_precision_close(self):
        from sgc_tpu.ops.spmm_pallas import spmm_pallas_flat, tile_graph

        rng = np.random.default_rng(6)
        n, e, f = 400, 3000, 64
        g = SparseGraph.from_coo(
            rng.integers(0, n, e), rng.integers(0, n, e),
            rng.random(e).astype(np.float32), n, n,
        )
        x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        tiled = tile_graph(g, row_block=128, stripe=128, chunk=64)
        out = np.asarray(
            spmm_pallas_flat(tiled, x, interpret=True, precision="bf16")
        )
        ref = np.asarray(g.to_scipy() @ np.asarray(x))
        err = np.abs(out[:n, :f] - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 0.02, err

    def test_flat_matches_gen1_kernel(self):
        """Both kernels over the SAME tiling agree to f32 rounding."""
        from sgc_tpu.ops.spmm_pallas import (
            spmm_pallas_flat,
            spmm_pallas_tiled,
            tile_graph,
        )

        rng = np.random.default_rng(7)
        n, e, f = 500, 4000, 80
        g = SparseGraph.from_coo(
            rng.integers(0, n, e), rng.integers(0, n, e),
            rng.random(e).astype(np.float32), n, n,
        )
        x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
        tiled = tile_graph(g, row_block=256, stripe=256, chunk=64)
        a = np.asarray(spmm_pallas_flat(tiled, x, interpret=True))
        b = np.asarray(spmm_pallas_tiled(tiled, x, interpret=True))
        np.testing.assert_allclose(
            a[:n, :f], b[:n, :f], rtol=1e-5, atol=1e-5
        )
