"""Tests: checksum exchange validation + determinism assertions."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from sgc_tpu.graph.normalize import aug_normalized_adjacency
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.parallel.debug import assert_deterministic, validate_exchange
from sgc_tpu.parallel.halo import build_halo
from sgc_tpu.parallel.mesh import make_mesh
from sgc_tpu.parallel.partition import pad_node_rows, partition_graph


def _setup(n_parts=4, n=96, e=600, seed=0):
    rng = np.random.default_rng(seed)
    adj = sp.coo_matrix(
        (np.ones(e, np.float32),
         (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n),
    )
    adj = adj + adj.T
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj))
    pgraph = partition_graph(graph, n_parts)
    halo = build_halo(pgraph)
    mesh = make_mesh(n_parts, 1)
    x = jnp.asarray(rng.standard_normal((n, 16), dtype=np.float32))
    x = pad_node_rows(x, pgraph.n_rows_padded)
    return mesh, pgraph, halo, x


def test_validate_exchange_clean():
    mesh, pgraph, halo, x = _setup()
    deltas = validate_exchange(mesh, halo.send_idx, x)
    assert deltas.shape == (4, 4)
    assert np.all(deltas == 0.0)


def test_validate_exchange_detects_injected_fault():
    mesh, pgraph, halo, x = _setup(seed=1)
    with pytest.raises(AssertionError, match="halo exchange corruption"):
        validate_exchange(mesh, halo.send_idx, x, inject_fault=(1, 2))


def test_validate_exchange_fault_localized():
    """The delta matrix points at exactly the corrupted (src, dst) pair."""
    mesh, pgraph, halo, x = _setup(seed=4)
    try:
        validate_exchange(mesh, halo.send_idx, x, inject_fault=(0, 3))
    except AssertionError as e:
        assert "src part 0 -> dst part 3" in str(e)
    else:
        pytest.fail("fault not detected")


def test_assert_deterministic_passes_on_spmm():
    from sgc_tpu.ops.spmm import spmm

    rng = np.random.default_rng(3)
    n, e = 64, 400
    adj = sp.coo_matrix(
        (np.ones(e, np.float32),
         (rng.integers(0, n, e), rng.integers(0, n, e))),
        shape=(n, n),
    )
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj + adj.T))
    feats = jnp.asarray(rng.standard_normal((n, 8), dtype=np.float32))
    assert_deterministic(lambda: spmm(graph, feats, impl="segment"))


def test_assert_deterministic_catches_mutation():
    state = {"n": 0}

    def flaky():
        state["n"] += 1
        return np.asarray([float(state["n"])])

    with pytest.raises(AssertionError, match="non-deterministic"):
        assert_deterministic(flaky)
