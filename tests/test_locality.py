"""LocalityPlan: reorder + dead-row + hybrid split, end-to-end exactness."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from sgc_tpu.graph.locality import LocalityPlan
from sgc_tpu.graph.normalize import aug_normalized_adjacency
from sgc_tpu.graph.sparse import SparseGraph


def _clustered(seed=0, n_clusters=5, per=96, p_in=0.25, p_out=0.01):
    rng = np.random.default_rng(seed)
    n = n_clusters * per
    blocks = np.repeat(np.arange(n_clusters), per)
    r, c = np.triu_indices(n, 1)
    same = blocks[r] == blocks[c]
    keep = rng.random(len(r)) < np.where(same, p_in, p_out)
    adj = sp.coo_matrix(
        (np.ones(int(keep.sum()), np.float32), (r[keep], c[keep])),
        shape=(n, n))
    adj = (adj + adj.T).tocsr()
    shuffle = rng.permutation(n)
    adj = adj[shuffle][:, shuffle]
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj).tocoo())
    x = rng.standard_normal((n, 24)).astype(np.float32)
    labels = blocks[shuffle].astype(np.int32)
    idx_train = rng.choice(n, size=n // 3, replace=False)
    return graph, x, labels, idx_train


# blockdense stores cells in bf16 (MXU rounds operands anyway) -> loose
# tolerance; onehot in interpret mode is f32-exact-ish
TOLS = {"blockdense": dict(rtol=3e-2, atol=5e-3),
        "onehot": dict(rtol=5e-4, atol=5e-5)}


@pytest.mark.parametrize("formulation", ["blockdense", "onehot"])
def test_plan_propagation_matches_scipy_oracle_in_original_ids(formulation):
    graph, x, labels, idx_train = _clustered()
    s = graph.to_scipy().tocsr()
    oracle = (s @ (s @ x))  # original numbering

    plan = LocalityPlan.build(graph, x, labels, idx_train,
                              formulation=formulation)
    got = np.asarray(plan.propagate_train(degree=2, interpret=True))

    # plan rows are plan.idx_train in the NEW numbering; map to old ids
    old_ids = plan.order[plan.idx_train]
    np.testing.assert_allclose(got, oracle[old_ids], **TOLS[formulation])
    # labels travelled with their nodes
    np.testing.assert_array_equal(plan.labels[plan.idx_train], labels[old_ids])


def test_plan_discovers_density_from_shuffled_ids():
    graph, x, labels, idx_train = _clustered(p_in=0.5, per=128, n_clusters=4)
    plan = LocalityPlan.build(graph, x, labels, idx_train,
                              row_block=128, stripe=128, min_fill=0.3,
                              formulation="onehot")
    assert plan.dense_fraction > 0.5
    # the final-hop operator computes exactly the train rows
    assert plan.graph_final.n_rows == len(idx_train)
    assert set(plan.prep_seconds) >= {
        "order_s", "apply_s", "subgraph_s", "split_s"}
    # round 4: the fault-wall probe rates ride along (DESIGN §2e)
    assert "fault_mrate_before" in plan.prep_seconds


def test_khop_traceable_matches_propagate_under_outer_jit():
    """One-program form (edge data as jit arguments) must equal the
    per-hop closure form — composed inside a caller's jit, as bench.py
    fuses it with the training step."""
    import jax

    graph, x, labels, idx_train = _clustered(seed=5)
    plan = LocalityPlan.build(graph, x, labels, idx_train)

    khop, dev_args = plan.khop_traceable(degree=2, interpret=True)
    fused = jax.jit(lambda xx, a: khop(xx, a) * 1.0)
    got = np.asarray(fused(jnp.asarray(plan.features), dev_args))

    want = np.asarray(plan.propagate_train(degree=2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_plan_build_is_host_resident():
    """LocalityPlan.build must never touch the device: intermediate
    arrays stay numpy (over the tunneled TPU backend an eager placement
    costs ~10x the whole build — docs/DESIGN.md §2d), and _device_args
    is the single explicit placement point. Both formulations."""
    import jax

    graph, x, labels, idx_train = _clustered(seed=7)
    for formulation in ("blockdense", "onehot"):
        plan = LocalityPlan.build(graph, x, labels, idx_train,
                                  formulation=formulation)
        for g in (plan.graph, plan.graph_final):
            for leaf in (g.rows, g.cols, g.vals, g.row_ptr):
                assert isinstance(leaf, np.ndarray), type(leaf)
        for split in (plan.split_main, plan.split_final):
            if formulation == "blockdense":
                assert isinstance(split.cells, np.ndarray)
            elif split.tiled is not None:
                assert isinstance(split.tiled.rows, np.ndarray)
            if split.rest is not None:
                assert isinstance(split.rest.rows, np.ndarray)

        # ... and placement happens exactly at _device_args
        args = plan._device_args()
        leaves = [l for l in jax.tree_util.tree_leaves(args)]
        assert leaves and all(isinstance(l, jax.Array) for l in leaves)


@pytest.mark.parametrize("formulation", ["blockdense", "onehot"])
def test_propagate_all_matches_scipy_in_original_order(formulation):
    graph, x, labels, idx_train = _clustered(seed=9)
    s = graph.to_scipy().tocsr()
    oracle = s @ (s @ x)

    plan = LocalityPlan.build(graph, x, labels, idx_train,
                              formulation=formulation)
    got = np.asarray(plan.propagate_all(degree=2, interpret=True))
    np.testing.assert_allclose(got, oracle, **TOLS[formulation])

    # restore=False leaves rows in the plan's (reordered) numbering
    raw = np.asarray(plan.propagate_all(degree=2, interpret=True,
                                        restore=False))
    np.testing.assert_allclose(raw, oracle[plan.order], **TOLS[formulation])


def test_restore_rows_roundtrip():
    graph, x, labels, idx_train = _clustered(seed=3)
    plan = LocalityPlan.build(graph, x, labels, idx_train)
    restored = plan.restore_rows(plan.labels)
    np.testing.assert_array_equal(restored, labels)


def test_hop_programs_and_placement_are_cached():
    """hop_fns must return the SAME closures across calls (one compile
    per (precision, interpret)) and device args must be placed once —
    rebuilding per call retraces/recompiles every propagate (minutes
    over the tunneled backend; round-2 review finding)."""
    graph, x, labels, idx_train = _clustered(seed=11)
    plan = LocalityPlan.build(graph, x, labels, idx_train)

    f1, g1 = plan.hop_fns(interpret=True)
    f2, g2 = plan.hop_fns(interpret=True)
    assert f1 is f2 and g1 is g2
    assert plan._device_args() is plan._device_args()
    _, a1 = plan.khop_traceable(interpret=True)
    _, a2 = plan.khop_traceable(interpret=True)
    assert a1 is a2


def test_blockdense_pallas_formulation_matches_blockdense():
    graph, x, labels, idx_train = _clustered(seed=13)
    a = LocalityPlan.build(graph, x, labels, idx_train,
                           formulation="blockdense")
    b = LocalityPlan.build(graph, x, labels, idx_train,
                           formulation="blockdense_pallas")
    ya = np.asarray(a.propagate_train(degree=2, interpret=True))
    yb = np.asarray(b.propagate_train(degree=2, interpret=True))
    np.testing.assert_allclose(ya, yb, rtol=1e-5, atol=1e-5)


def test_auto_formulation_resolves_off_tpu_to_blockdense():
    """'auto' (the default) must resolve via the scalar-prefetch probe:
    off-TPU the probe short-circuits False (no compile attempted) and
    the plan lands on the scan-form blockdense."""
    from sgc_tpu.ops import spmm_pallas as sp_mod

    graph, x, labels, idx_train = _clustered(seed=21)
    plan = LocalityPlan.build(graph, x, labels, idx_train,
                              formulation="auto")
    assert plan.formulation == "blockdense"
    # default formulation IS auto
    plan2 = LocalityPlan.build(graph, x, labels, idx_train)
    assert plan2.formulation == "blockdense"
    assert sp_mod.scalar_prefetch_compiles() is False


def test_auto_formulation_picks_pallas_when_probe_passes(monkeypatch):
    """On a backend whose probe passes, auto selects the compiled
    Pallas kernel form."""
    from sgc_tpu.ops import spmm_pallas as sp_mod

    monkeypatch.setattr(sp_mod, "scalar_prefetch_compiles", lambda: True)
    graph, x, labels, idx_train = _clustered(seed=22)
    plan = LocalityPlan.build(graph, x, labels, idx_train,
                              formulation="auto")
    assert plan.formulation == "blockdense_pallas"
