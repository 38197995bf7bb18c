"""Sharded SpMM / training-step tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
from jax.sharding import NamedSharding, PartitionSpec as P

from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.parallel import make_mesh, partition_graph, spmm_sharded
from sgc_tpu.parallel.mesh import NODES_AXIS, default_mesh_shape
from sgc_tpu.parallel.partition import pad_feature_dim, pad_node_rows
from sgc_tpu.parallel.spmm import propagate_sharded, shard_features
from sgc_tpu.parallel.train import init_sharded_state, make_sharded_train_step


def _random_graph(n, density=0.05, seed=1):
    a = sp.random(n, n, density=density, random_state=seed, format="coo")
    return a, SparseGraph.from_scipy(a)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 2), (1, 1)])
def test_spmm_sharded_matches_scipy(mesh_shape):
    n_nodes_parts, n_feat_parts = mesh_shape
    mesh = make_mesh(n_nodes_parts, n_feat_parts)
    rng = np.random.default_rng(0)
    a, g = _random_graph(100)
    pg = partition_graph(g, n_nodes_parts)

    x = rng.normal(size=(100, 24)).astype(np.float32)
    xp = pad_node_rows(
        pad_feature_dim(jnp.asarray(x), 8 * n_feat_parts), pg.n_rows_padded
    )
    xs = shard_features(mesh, xp)

    out = np.asarray(spmm_sharded(mesh, pg, xs))
    np.testing.assert_allclose(out[:100, :24], a @ x, rtol=1e-5, atol=1e-5)
    # padded rows and features stay exactly zero
    assert (out[100:] == 0).all()
    assert (out[:, 24:] == 0).all()


def test_propagate_sharded_two_hops():
    mesh = make_mesh(4, 2)
    rng = np.random.default_rng(1)
    a, g = _random_graph(90, seed=3)
    pg = partition_graph(g, 4)
    x = rng.normal(size=(90, 16)).astype(np.float32)
    xp = pad_node_rows(pad_feature_dim(jnp.asarray(x), 16), pg.n_rows_padded)
    xs = shard_features(mesh, xp)
    out = np.asarray(propagate_sharded(mesh, pg, xs, 2))
    np.testing.assert_allclose(out[:90, :16], a @ (a @ x), rtol=1e-4, atol=1e-5)


def test_propagate_col_chunk_bitwise_and_consume():
    """col_chunk paneling is bit-identical (SpMM is columnwise-
    independent) for even and uneven panel widths, with/without
    edge_chunk and halo; the box-consume form ([x]) empties the list
    (beyond-device memory controls, DESIGN §3b round 5)."""
    from sgc_tpu.parallel.halo import build_halo

    mesh = make_mesh(8, 1)
    rng = np.random.default_rng(5)
    a, g = _random_graph(128, seed=7)
    pg = partition_graph(g, 8)
    halo = build_halo(pg)
    x = rng.normal(size=(128, 40)).astype(np.float32)
    xs = shard_features(mesh, pad_node_rows(jnp.asarray(x),
                                            pg.n_rows_padded))
    for halo_arg in (None, halo):
        for ec in (None, 128):
            ref = np.asarray(propagate_sharded(
                mesh, pg, xs, 2, halo=halo_arg, edge_chunk=ec))
            for cc in (16, 13):
                got = np.asarray(propagate_sharded(
                    mesh, pg, xs, 2, halo=halo_arg, edge_chunk=ec,
                    col_chunk=cc, sync_each_hop=True))
                np.testing.assert_array_equal(got, ref)
    # consume form: the one-element list is emptied on entry
    box = [xs]
    out = propagate_sharded(mesh, pg, box, 2, halo=halo, col_chunk=16)
    assert box == []
    np.testing.assert_array_equal(
        np.asarray(out),
        np.asarray(propagate_sharded(mesh, pg, xs, 2, halo=halo,
                                     col_chunk=16)))
    with pytest.raises(ValueError, match="one-element"):
        propagate_sharded(mesh, pg, [xs, xs], 1)


def test_propagate_col_chunk_rejections():
    """col_chunk composes only with the segment formulation, eagerly,
    on an unsharded feat axis."""
    mesh = make_mesh(4, 2)
    _, g = _random_graph(64, seed=9)
    pg = partition_graph(g, 4)
    rng = np.random.default_rng(0)
    xs = shard_features(mesh, pad_node_rows(
        pad_feature_dim(jnp.asarray(
            rng.normal(size=(64, 16)).astype(np.float32)), 16),
        pg.n_rows_padded))
    with pytest.raises(ValueError, match="feat"):
        propagate_sharded(mesh, pg, xs, 1, col_chunk=8)
    with pytest.raises(ValueError, match="jit"):
        jax.jit(lambda v: propagate_sharded(
            make_mesh(4, 2), pg, v, 1, col_chunk=8))(xs)


def test_sharded_train_step_matches_single_device():
    """The 8-way sharded Adam step must match a replicated 1-device step."""
    rng = np.random.default_rng(2)
    n, f, c = 64, 24, 4
    a, g = _random_graph(n, density=0.1, seed=5)
    x = rng.normal(size=(n, f)).astype(np.float32)
    labels_np = rng.integers(0, c, n).astype(np.int32)

    results = {}
    for shape in [(1, 1), (4, 2)]:
        mesh = make_mesh(*shape)
        pg = partition_graph(g, shape[0])
        # identical feature padding across mesh shapes so params match
        xp = pad_node_rows(pad_feature_dim(jnp.asarray(x), 32), pg.n_rows_padded)
        xs = shard_features(mesh, xp)
        labels = pad_node_rows(jnp.asarray(labels_np), pg.n_rows_padded)
        mask = pad_node_rows(jnp.ones(n, jnp.float32), pg.n_rows_padded)
        labels = jax.device_put(labels, NamedSharding(mesh, P(NODES_AXIS)))
        mask = jax.device_put(mask, NamedSharding(mesh, P(NODES_AXIS)))

        state = init_sharded_state(
            mesh, jax.random.PRNGKey(0), xp.shape[1], c, 0.2, 1e-5
        )
        step = make_sharded_train_step(mesh, pg, degree=2, lr=0.2, weight_decay=1e-5)
        losses = []
        for _ in range(3):
            state, loss = step(state, xs, labels, mask)
            losses.append(float(loss))
        results[shape] = (losses, np.asarray(state.params.w))

    l1, w1 = results[(1, 1)]
    l8, w8 = results[(4, 2)]
    np.testing.assert_allclose(l1, l8, rtol=1e-4)
    np.testing.assert_allclose(w1[:24], w8[:24], rtol=1e-3, atol=1e-5)


def test_default_mesh_shapes():
    assert default_mesh_shape(8) == (4, 2)
    assert default_mesh_shape(4) == (2, 2)
    assert default_mesh_shape(2) == (2, 1)
    assert default_mesh_shape(1) == (1, 1)


def test_partition_preserves_all_edges():
    a, g = _random_graph(77, density=0.08, seed=7)
    pg = partition_graph(g, 4)
    # reconstruct global COO from partition and compare to original
    dense = np.zeros((pg.n_rows_padded, g.n_cols), np.float32)
    for p in range(4):
        r = np.asarray(pg.rows_local[p]) + p * pg.rows_per_part
        c = np.asarray(pg.cols[p])
        v = np.asarray(pg.vals[p])
        np.add.at(dense, (r, c), v)
    np.testing.assert_allclose(dense[:77], a.toarray(), rtol=1e-6, atol=1e-7)


class TestScalingHarness:
    def test_measure_spmm_scaling_runs_and_agrees(self):
        import scipy.sparse as sp

        from sgc_tpu.graph.normalize import aug_normalized_adjacency
        from sgc_tpu.parallel.scaling import measure_spmm_scaling

        rng = np.random.default_rng(0)
        n, e = 256, 2000
        adj = sp.coo_matrix(
            (np.ones(e, np.float32),
             (rng.integers(0, n, e), rng.integers(0, n, e))),
            shape=(n, n),
        )
        graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj + adj.T))
        x = rng.standard_normal((n, 16)).astype(np.float32)
        report = measure_spmm_scaling(graph, x, n_devices=4, hops=2,
                                      repeats=1)
        assert report.n_devices == 4
        assert report.single_rate > 0 and report.sharded_rate > 0
        assert 0.0 < report.halo_fraction <= 1.0
        assert report.plan_build_s >= 0.0
        assert "plan build" in str(report)
        assert "efficiency" in str(report)

    def test_init_distributed_noop_single_process(self, monkeypatch):
        from sgc_tpu.parallel.scaling import init_distributed

        for k in ("MEGASCALE_COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                  "COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
            monkeypatch.delenv(k, raising=False)
        assert init_distributed() is False


class TestHaloTrainStep:
    def test_halo_step_matches_allgather_step(self):
        """degree>0 training with halo exchange inside the SPMD body
        produces the same losses as the all-gather body."""
        import scipy.sparse as sp

        from sgc_tpu.graph.normalize import aug_normalized_adjacency
        from sgc_tpu.parallel.halo import build_halo
        from sgc_tpu.parallel.mesh import make_mesh
        from sgc_tpu.parallel.partition import (
            pad_feature_dim, pad_node_rows, partition_graph,
        )
        from sgc_tpu.parallel.spmm import shard_features
        from sgc_tpu.parallel.train import (
            init_sharded_state, make_sharded_train_step,
        )
        from jax.sharding import NamedSharding, PartitionSpec as P
        from sgc_tpu.parallel.mesh import NODES_AXIS

        rng = np.random.default_rng(0)
        n, e, f, c = 96, 700, 24, 4
        adj = sp.coo_matrix(
            (np.ones(e, np.float32),
             (rng.integers(0, n, e), rng.integers(0, n, e))),
            shape=(n, n),
        )
        graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj + adj.T))
        mesh = make_mesh(4, 1)
        pgraph = partition_graph(graph, 4)
        halo = build_halo(pgraph)

        x = jnp.asarray(rng.standard_normal((n, f), dtype=np.float32))
        x = pad_node_rows(pad_feature_dim(x, 8), pgraph.n_rows_padded)
        xs = shard_features(mesh, x)
        y = pad_node_rows(
            jnp.asarray(rng.integers(0, c, n), jnp.int32),
            pgraph.n_rows_padded,
        )
        m = pad_node_rows(jnp.ones(n, jnp.float32), pgraph.n_rows_padded)
        y = jax.device_put(y, NamedSharding(mesh, P(NODES_AXIS)))
        m = jax.device_put(m, NamedSharding(mesh, P(NODES_AXIS)))

        losses = {}
        for name, h in (("allgather", None), ("halo", halo)):
            state = init_sharded_state(
                mesh, jax.random.PRNGKey(0), int(xs.shape[1]), c,
                lr=0.2, weight_decay=0.0,
            )
            step = make_sharded_train_step(
                mesh, pgraph, degree=2, lr=0.2, weight_decay=0.0, halo=h,
            )
            ls = []
            s = state
            for _ in range(5):
                s, l = step(s, xs, y, m)
                ls.append(float(l))
            losses[name] = ls
        np.testing.assert_allclose(
            losses["halo"], losses["allgather"], rtol=1e-4, atol=1e-5
        )


def test_scaling_cli_json_contract(monkeypatch, capsys):
    """cli.scaling --json rows carry the comm model + plan timing
    (VERDICT round-1 #6 deliverable)."""
    import json as _json
    import sys

    from sgc_tpu.cli import scaling as scaling_cli

    monkeypatch.setattr(sys, "argv", [
        "scaling", "--nodes", "2000", "--edges", "20000",
        "--features", "16", "--repeats", "1", "--json",
    ])
    scaling_cli.main()
    rows = [_json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    assert rows, "no output rows"
    for r in rows:
        assert r["plan_build_s"] >= 0.0
        cm = r["comm_model"]
        assert cm["ici_bytes_per_hop_halo"] >= 0
        assert cm["ici_bytes_per_hop_allgather"] > 0
        assert 0 < cm["projected_efficiency_halo"] <= 1.0
        assert "assumed_ici_gbps" in cm
