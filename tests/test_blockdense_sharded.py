"""Sharded block-dense SpMM parity on the virtual 8-device CPU mesh.

The multi-chip path must reproduce scipy exactly (f32 precision) through
the full geometry chain: partition -> halo remap -> per-part cell split
-> interior/boundary separation -> shard_map hop with all_to_all.
VERDICT round-2 #5: the fast formulation on the sharded path.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.parallel import make_mesh, partition_graph
from sgc_tpu.parallel.blockdense import build_sharded_blockdense
from sgc_tpu.parallel.halo import build_halo
from sgc_tpu.parallel.partition import pad_feature_dim, pad_node_rows
from sgc_tpu.parallel.spmm import (
    propagate_sharded,
    shard_features,
    spmm_sharded,
)


def _clustered_graph(n=128, communities=4, seed=0):
    """Block-diagonal-heavy graph: dense cells form on the diagonal after
    contiguous partitioning, plus cross-community edges for the halo."""
    rng = np.random.default_rng(seed)
    per = n // communities
    blocks = [sp.random(per, per, density=0.5,
                        random_state=int(rng.integers(1 << 30)),
                        format="coo") for _ in range(communities)]
    a = sp.block_diag(blocks, format="coo")
    cross = sp.random(n, n, density=0.02,
                      random_state=int(rng.integers(1 << 30)), format="coo")
    a = (a + cross).tocoo()
    return a, SparseGraph.from_scipy(a)


def _bf16_rounded(a):
    """The oracle with cell-storage rounding applied: every edge value
    through bf16 (what split_block_dense materializes), back to f32 —
    value-exact vs the device path when ALL edges are dense."""
    import ml_dtypes

    c = a.tocoo()
    vals = c.data.astype(np.float32).astype(
        ml_dtypes.bfloat16).astype(np.float32)
    return sp.coo_matrix((vals, (c.row, c.col)), shape=a.shape)


def _sharded_blockdense_out(a, g, mesh_shape, min_edges, x,
                            row_block=32, stripe=32, degree=1,
                            precision="f32"):
    n_parts, n_feat_parts = mesh_shape
    mesh = make_mesh(n_parts, n_feat_parts)
    pg = partition_graph(g, n_parts)
    halo = build_halo(pg)
    bd = build_sharded_blockdense(
        pg, halo, x.shape[1], row_block=row_block, stripe=stripe,
        min_edges=min_edges)
    xp = pad_node_rows(
        pad_feature_dim(jnp.asarray(x), 8 * n_feat_parts),
        pg.n_rows_padded)
    xs = shard_features(mesh, xp)
    out = propagate_sharded(mesh, pg, xs, degree, blockdense=bd,
                            precision=precision)
    return np.asarray(out), bd


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 2), (1, 1)])
def test_sharded_blockdense_matches_scipy(mesh_shape):
    rng = np.random.default_rng(3)
    n = 128
    a, g = _clustered_graph(n)
    x = rng.normal(size=(n, 24)).astype(np.float32)
    # min_edges=0: every occupied cell materializes (max dense coverage),
    # so the bf16-rounded oracle is value-exact and only f32 accumulation
    # order differs
    out, bd = _sharded_blockdense_out(a, g, mesh_shape, 0, x)
    assert bd.n_cells > 0 and bd.dense_edges > 0
    np.testing.assert_allclose(
        out[:n, :24], _bf16_rounded(a) @ x, rtol=5e-5, atol=5e-5)
    assert (out[n:] == 0).all()
    assert (out[:, 24:] == 0).all()


def test_sharded_blockdense_mixed_remainder():
    """Default admission: dense diagonal cells + sparse cross-community
    remainder — both dense and sparse terms live, interior and boundary."""
    rng = np.random.default_rng(4)
    n = 128
    a, g = _clustered_graph(n, seed=7)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    out, bd = _sharded_blockdense_out(a, g, (4, 1), 64, x)
    assert bd.n_cells > 0 and bd.sparse_edges > 0
    # interior cells exist (diagonal communities) AND boundary work exists
    assert int(bd.cells_int.shape[1]) > 0
    assert bd.dense_edges + bd.sparse_edges == g.nnz
    # dense edges carry bf16 storage rounding (~0.4% per value), sparse
    # remainder is f32-exact; a routing bug (dropped/double-counted edge)
    # is an O(1) error — far outside this tolerance
    np.testing.assert_allclose(out[:n, :16], a @ x, rtol=1e-2, atol=2e-2)


def test_sharded_blockdense_pure_remainder():
    """min_edges above every cell count: zero cells, pure segment path —
    the graceful-degradation contract."""
    rng = np.random.default_rng(5)
    n = 96
    a = sp.random(n, n, density=0.05, random_state=11, format="coo")
    g = SparseGraph.from_scipy(a)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    out, bd = _sharded_blockdense_out(a, g, (4, 1), 1e9, x)
    assert bd.n_cells == 0 and bd.sparse_edges == g.nnz
    np.testing.assert_allclose(out[:n, :16], a @ x, rtol=1e-5, atol=1e-5)


def test_sharded_blockdense_two_hops():
    rng = np.random.default_rng(6)
    n = 128
    a, g = _clustered_graph(n, seed=9)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    out, _ = _sharded_blockdense_out(a, g, (4, 2), 0, x, degree=2)
    ar = _bf16_rounded(a)
    np.testing.assert_allclose(
        out[:n, :16], ar @ (ar @ x), rtol=1e-4, atol=1e-4)


def test_sharded_blockdense_matches_single_chip_formulation():
    """Sharded bf16 path vs the single-chip block-dense op (same
    formulation, same bf16 cell rounding): agreement must be at f32
    accumulation level, not bf16 level — both paths round cells the
    same way."""
    from sgc_tpu.ops.spmm_blockdense import spmm_blockdense

    rng = np.random.default_rng(8)
    n = 128
    a, g = _clustered_graph(n, seed=13)
    x = rng.normal(size=(n, 16)).astype(np.float32)

    single = np.asarray(
        spmm_blockdense(g, jnp.asarray(x), row_block=32, stripe=32))
    out, bd = _sharded_blockdense_out(a, g, (4, 1), None, x,
                                      precision="bf16")
    # same bf16 storage + operand rounding on both sides; differences
    # are f32 accumulation order only, scaled by bf16 operand magnitude
    np.testing.assert_allclose(out[:n, :16], single, rtol=1e-4, atol=1e-4)


def test_sharded_blockdense_deterministic():
    rng = np.random.default_rng(10)
    n = 128
    a, g = _clustered_graph(n, seed=17)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    out1, _ = _sharded_blockdense_out(a, g, (4, 1), 64, x)
    out2, _ = _sharded_blockdense_out(a, g, (4, 1), 64, x)
    np.testing.assert_array_equal(out1, out2)


def test_sharded_train_step_blockdense_matches_segment():
    """degree=2 sharded train step through the block-dense hop must match
    the segment-hop step on the same mesh (f32 precision, all-dense so
    bf16 storage is the only rounding; compare against the segment step
    run on the bf16-rounded graph => identical math, different kernel)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sgc_tpu.parallel.mesh import NODES_AXIS
    from sgc_tpu.parallel.train import (
        init_sharded_state,
        make_sharded_train_step,
    )

    rng = np.random.default_rng(12)
    n, f, c = 128, 16, 4
    a, g = _clustered_graph(n, seed=21)
    ar = _bf16_rounded(a)
    g_r = SparseGraph.from_scipy(ar)   # segment path on rounded values
    x = rng.normal(size=(n, f)).astype(np.float32)
    labels_np = rng.integers(0, c, n).astype(np.int32)

    mesh = make_mesh(4, 2)
    results = {}
    for mode in ("blockdense", "segment"):
        gg = g if mode == "blockdense" else g_r
        pg = partition_graph(gg, 4)
        halo = build_halo(pg)
        bd = None
        if mode == "blockdense":
            bd = build_sharded_blockdense(pg, halo, f, row_block=32,
                                          stripe=32, min_edges=0)
            assert bd.sparse_edges == 0  # all-dense: bf16 rounding only
        xp = pad_node_rows(pad_feature_dim(jnp.asarray(x), 16),
                           pg.n_rows_padded)
        xs = shard_features(mesh, xp)
        labels = pad_node_rows(jnp.asarray(labels_np), pg.n_rows_padded)
        mask = pad_node_rows(jnp.ones(n, jnp.float32), pg.n_rows_padded)
        labels = jax.device_put(labels, NamedSharding(mesh, P(NODES_AXIS)))
        mask = jax.device_put(mask, NamedSharding(mesh, P(NODES_AXIS)))
        state = init_sharded_state(
            mesh, jax.random.PRNGKey(0), xp.shape[1], c, 0.2, 1e-5)
        step = make_sharded_train_step(
            mesh, pg, degree=2, lr=0.2, weight_decay=1e-5,
            halo=None if bd is not None else halo,
            blockdense=bd, precision="f32")
        losses = []
        for _ in range(3):
            state, loss = step(state, xs, labels, mask)
            losses.append(float(loss))
        results[mode] = (losses, np.asarray(state.params.w),
                         np.asarray(state.params.b))

    lb, wb, bb = results["blockdense"]
    ls, ws, bs = results["segment"]
    np.testing.assert_allclose(lb, ls, rtol=1e-5, atol=1e-6)
    scale = max(np.abs(ws).max(), np.abs(bs).max())
    assert np.abs(wb - ws).max() / scale < 2e-3
    assert np.abs(bb - bs).max() / scale < 2e-3


def test_sharded_blockdense_pallas_form_matches_scan():
    """form="pallas" (the single-chip headline kernel, per chip, in
    interpret mode on the CPU mesh) must equal the scan form exactly —
    same bf16 cell storage, same bf16 operand rounding, f32 accumulation
    differences only."""
    rng = np.random.default_rng(14)
    n = 128
    a, g = _clustered_graph(n, seed=31)
    x = rng.normal(size=(n, 16)).astype(np.float32)

    mesh = make_mesh(4, 1)
    pg = partition_graph(g, 4)
    halo = build_halo(pg)
    bd = build_sharded_blockdense(pg, halo, 16, row_block=32, stripe=32,
                                  min_edges=50)
    assert bd.n_cells > 0 and bd.sparse_edges > 0
    xp = pad_node_rows(pad_feature_dim(jnp.asarray(x), 8),
                       pg.n_rows_padded)
    xs = shard_features(mesh, xp)
    out_scan = np.asarray(propagate_sharded(
        mesh, pg, xs, 1, blockdense=bd, precision="bf16", form="scan"))
    out_pl = np.asarray(propagate_sharded(
        mesh, pg, xs, 1, blockdense=bd, precision="bf16", form="pallas",
        interpret=True))
    np.testing.assert_allclose(out_pl, out_scan, rtol=1e-5, atol=1e-5)


def test_sharded_blockdense_pallas_visited_mask():
    """Row blocks with NO admitted cells must come out exactly zero from
    the pallas cells term (on hardware those out-blocks are
    uninitialized memory — the visited mask zeroes them), while visited
    blocks keep their full contribution: row_block smaller than
    rows_per_part forces a mix of visited and unvisited blocks."""
    rng = np.random.default_rng(15)
    n = 128
    # lopsided: one dense corner (rows/cols < 32) + a sparse scatter —
    # parts 1-3 get few-to-no cells, so their row blocks go unvisited
    rd = rng.integers(0, 32, 3000)
    cd = rng.integers(0, 32, 3000)
    rs = rng.integers(0, n, 200)
    cs = rng.integers(0, n, 200)
    r = np.concatenate([rd, rs])
    c = np.concatenate([cd, cs])
    v = rng.standard_normal(len(r)).astype(np.float32)
    a = sp.coo_matrix((v, (r, c)), shape=(n, n))
    a.sum_duplicates()
    g = SparseGraph.from_scipy(a)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    mesh = make_mesh(4, 1)
    pg = partition_graph(g, 4)
    halo = build_halo(pg)
    # row_block 16 -> 2 blocks per 32-row part; min_edges high enough
    # that only the dense corner's cells qualify
    bd = build_sharded_blockdense(pg, halo, 16, row_block=16, stripe=16,
                                  min_edges=30)
    assert bd.n_cells > 0 and bd.sparse_edges > 0
    vis = np.asarray(bd.vis_int)
    assert not vis.all(), "need at least one unvisited row block"
    assert vis.any()
    xp = pad_node_rows(pad_feature_dim(jnp.asarray(x), 8),
                       pg.n_rows_padded)
    xs = shard_features(mesh, xp)
    out_scan = np.asarray(propagate_sharded(
        mesh, pg, xs, 1, blockdense=bd, precision="f32", form="scan"))
    out_pl = np.asarray(propagate_sharded(
        mesh, pg, xs, 1, blockdense=bd, precision="f32", form="pallas",
        interpret=True))
    # scan form is independently scipy-validated above; parity here
    # proves the mask zeroes exactly the unvisited blocks and nothing
    # else (a mask bug would zero real contributions => O(1) mismatch)
    np.testing.assert_allclose(out_pl, out_scan, rtol=1e-5, atol=1e-5)
    assert np.abs(out_pl[:32, :16]).max() > 0.1  # dense corner is live


def test_fast_build_matches_portable_bitwise():
    """The direct-scatter fast plan build must be BITWISE equal to the
    portable composition-of-parts build on every field — cells (bf16
    payloads compared as raw uint16), ids, visited masks, remainders,
    and scalar metadata (VERDICT round-3 #2: the fast path replaced a
    109 s build; equality is what makes the swap safe)."""
    from sgc_tpu.parallel.blockdense import (
        _build_sharded_fast,
        _build_sharded_portable,
    )
    from sgc_tpu import native

    if not native.has_cell_scatter():
        pytest.skip("native cell scatter unavailable")
    a, g = _clustered_graph(n=256, communities=4, seed=3)
    pg = partition_graph(g, 4)
    halo = build_halo(pg)
    args = (pg, halo, 16, 32, 32, 8.0, 4 << 30, False)
    fast = _build_sharded_fast(*args)
    port = _build_sharded_portable(*args)
    for name in ("cells_int", "cells_bnd"):
        fa = np.asarray(getattr(fast, name)).view(np.uint16)
        pa = np.asarray(getattr(port, name)).view(np.uint16)
        assert fa.shape == pa.shape and np.array_equal(fa, pa), name
    for name in ("rb_int", "st_int", "vis_int", "rb_bnd", "st_bnd",
                 "vis_bnd", "send_idx"):
        assert np.array_equal(np.asarray(getattr(fast, name)),
                              np.asarray(getattr(port, name))), name
    for fa, pa in zip(fast.rest_int + fast.rest_bnd,
                      port.rest_int + port.rest_bnd):
        assert np.array_equal(np.asarray(fa), np.asarray(pa))
    for name in ("row_block", "stripe", "n_parts", "rows_per_part",
                 "halo_width", "r_up", "t_pad", "chunk_int", "chunk_bnd",
                 "n_cells", "dense_edges", "sparse_edges"):
        assert getattr(fast, name) == getattr(port, name), name
    assert fast.n_cells > 0 and fast.sparse_edges > 0  # both paths live
