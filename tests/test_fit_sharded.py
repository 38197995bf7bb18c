"""End-to-end distributed fit vs single-device reference training."""

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from sgc_tpu.graph.normalize import aug_normalized_adjacency
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.models.sgc import init_sgc
from sgc_tpu.ops.propagate import propagate
from sgc_tpu.parallel.fit import fit_sharded
from sgc_tpu.parallel.mesh import make_mesh
from sgc_tpu.train.loops import train_regression
from sgc_tpu.train.metrics import accuracy


def _task(n=128, seed=0):
    """Clustered graph where propagation + linear head separates classes."""
    rng = np.random.default_rng(seed)
    c = 4
    blocks = np.repeat(np.arange(c), n // c)
    r, co = np.triu_indices(n, 1)
    keep = rng.random(len(r)) < np.where(blocks[r] == blocks[co], 0.3, 0.01)
    adj = sp.coo_matrix(
        (np.ones(keep.sum(), np.float32), (r[keep], co[keep])), shape=(n, n)
    )
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj + adj.T))
    x = rng.standard_normal((n, 16)).astype(np.float32)
    x[np.arange(n), blocks] += 1.5
    idx_train = np.sort(rng.choice(n, n // 2, replace=False))
    return graph, x, blocks.astype(np.int32), idx_train, c


def test_fit_sharded_matches_single_device_quality():
    graph, x, y, idx_train, c = _task()
    mesh = make_mesh(4, 2)
    params, report = fit_sharded(
        graph, x, y, idx_train, c,
        mesh=mesh, degree=2, epochs=60, lr=0.2, weight_decay=0.0,
    )
    assert report.n_parts == 4
    assert report.loss_history[-1] < report.loss_history[0]

    # single-device reference: same propagation + Adam regression
    feats = propagate(jnp.asarray(x), graph, 2)
    sp_params = init_sgc(jax.random.PRNGKey(42), 16, c)
    sp_params, _ = train_regression(
        sp_params, feats[idx_train], jnp.asarray(y[idx_train]),
        epochs=60, lr=0.2, weight_decay=0.0,
    )
    ref_acc = accuracy(
        feats[idx_train] @ sp_params.w + sp_params.b, y[idx_train]
    )
    assert report.train_accuracy > 0.9
    assert abs(report.train_accuracy - ref_acc) < 0.1


def test_fit_sharded_allgather_path():
    graph, x, y, idx_train, c = _task(seed=1)
    mesh = make_mesh(4, 1)
    params, report = fit_sharded(
        graph, x, y, idx_train, c,
        mesh=mesh, degree=2, epochs=40, use_halo=False,
    )
    assert report.halo_fraction == 1.0
    assert report.train_accuracy > 0.8


def test_fit_sharded_auto_halo_selection():
    """use_halo=None picks the exchange by measured halo fraction:
    all-gather on a random graph (fraction ~1), halo on a clustered one."""
    import scipy.sparse as sp

    from sgc_tpu.parallel.fit import fit_sharded
    from sgc_tpu.parallel.halo import build_halo, halo_fraction
    from sgc_tpu.parallel.partition import partition_graph

    # random graph -> fraction ~1 -> auto should behave like all-gather
    rng = np.random.default_rng(7)
    n, e = 128, 1200
    adj = sp.coo_matrix(
        (np.ones(e, np.float32),
         (rng.integers(0, n, e), rng.integers(0, n, e))), shape=(n, n))
    from sgc_tpu.graph.normalize import aug_normalized_adjacency

    g_rand = SparseGraph.from_scipy(aug_normalized_adjacency(adj + adj.T))
    pg = partition_graph(g_rand, 4)
    assert halo_fraction(build_halo(pg), pg) >= 0.5

    x = rng.standard_normal((n, 16)).astype(np.float32)
    y = rng.integers(0, 3, n).astype(np.int32)
    idx = np.arange(n // 2)
    mesh = make_mesh(4, 1)
    params, report = fit_sharded(
        g_rand, x, y, idx, 3, mesh=mesh, degree=1, epochs=5,
        use_halo=None,
    )
    assert report.halo_fraction == 1.0  # all-gather path reported

    # clustered graph with a sparse cut -> low fraction -> halo kept
    n2 = 512
    blocks = np.repeat(np.arange(4), n2 // 4)
    r_, c_ = np.triu_indices(n2, 1)
    p = np.where(blocks[r_] == blocks[c_], 0.08, 0.002)
    keep = rng.random(len(r_)) < p
    adj2 = sp.coo_matrix(
        (np.ones(keep.sum(), np.float32), (r_[keep], c_[keep])),
        shape=(n2, n2))
    g_clust = SparseGraph.from_scipy(
        aug_normalized_adjacency(adj2 + adj2.T))
    pg2 = partition_graph(g_clust, 4)
    assert halo_fraction(build_halo(pg2), pg2) < 0.5

    x2 = rng.standard_normal((n2, 16)).astype(np.float32)
    x2[np.arange(n2), blocks] += 1.5
    y2 = blocks.astype(np.int32)
    params, report = fit_sharded(
        g_clust, x2, y2, np.arange(n2 // 2), 4, mesh=mesh, degree=1,
        epochs=5, use_halo=None,
    )
    assert report.halo_fraction < 0.5


def test_fit_sharded_reorder_cuts_halo_and_matches_accuracy():
    """reorder="lpa" before partitioning: communities align with row
    blocks (halo fraction drops) while training reaches the same
    accuracy — the multi-chip face of the locality pipeline."""
    import numpy as np
    import scipy.sparse as sp

    from sgc_tpu.graph.normalize import aug_normalized_adjacency
    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.parallel.fit import fit_sharded

    rng = np.random.default_rng(8)
    n_clusters, per = 8, 48
    n = n_clusters * per
    blocks = np.repeat(np.arange(n_clusters), per)
    r, c = np.triu_indices(n, 1)
    keep = rng.random(len(r)) < np.where(blocks[r] == blocks[c], 0.5,
                                         0.002)
    adj = sp.coo_matrix(
        (np.ones(int(keep.sum()), np.float32), (r[keep], c[keep])),
        shape=(n, n))
    adj = (adj + adj.T).tocsr()
    shuffle = rng.permutation(n)
    adj = adj[shuffle][:, shuffle]
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj))

    # separable features per community
    centers = rng.normal(scale=2.0, size=(n_clusters, 16))
    x = (centers[blocks[shuffle]]
         + rng.normal(size=(n, 16))).astype(np.float32)
    labels = blocks[shuffle].astype(np.int32)
    idx_train = rng.choice(n, size=n // 2, replace=False)

    _, rep_plain = fit_sharded(graph, x, labels, idx_train, n_clusters,
                               epochs=30, use_halo=True)
    _, rep_lpa = fit_sharded(graph, x, labels, idx_train, n_clusters,
                             epochs=30, use_halo=True, reorder="lpa")
    assert rep_lpa.halo_fraction < rep_plain.halo_fraction * 0.6, (
        rep_lpa.halo_fraction, rep_plain.halo_fraction)
    assert rep_lpa.train_accuracy >= rep_plain.train_accuracy - 0.02
    assert rep_lpa.train_accuracy > 0.9


def test_fit_sharded_default_runs_blockdense():
    """formulation="auto" + halo => the fast block-dense formulation IS
    the sharded path (VERDICT round-2 #5), with quality preserved."""
    graph, x, y, idx_train, c = _task(seed=3)
    mesh = make_mesh(4, 2)
    params, report = fit_sharded(
        graph, x, y, idx_train, c,
        mesh=mesh, degree=2, epochs=60, lr=0.2, weight_decay=0.0,
        row_block=32, stripe=32,
    )
    assert report.formulation == "blockdense"
    assert report.dense_fraction > 0.5  # clustered: most edges on MXU
    assert report.train_accuracy > 0.9


def test_fit_sharded_segment_formulation_unchanged():
    graph, x, y, idx_train, c = _task(seed=4)
    mesh = make_mesh(4, 1)
    params, report = fit_sharded(
        graph, x, y, idx_train, c,
        mesh=mesh, degree=2, epochs=60, formulation="segment",
    )
    assert report.formulation == "segment"
    assert report.dense_fraction == 0.0
    assert report.train_accuracy > 0.9


def test_fit_sharded_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Preemption-safe distributed training: interrupt at epoch 20 (via
    a first fit that saves there), rerun with the same checkpoint dir —
    the resumed fit must reproduce the uninterrupted run's losses and
    params exactly (full-batch training is deterministic)."""
    import jax

    graph, x, y, idx_train, c = _task(seed=6)
    mesh = make_mesh(4, 2)
    kw = dict(mesh=mesh, degree=2, epochs=40, lr=0.2, weight_decay=1e-5,
              formulation="segment")

    ref_params, ref_report = fit_sharded(
        graph, x, y, idx_train, c, **kw)

    ck = tmp_path / "ckpt"
    # phase 1: "preempted" after 20 epochs (epochs=20 saves on completion)
    fit_sharded(graph, x, y, idx_train, c,
                checkpoint_dir=str(ck), **{**kw, "epochs": 20})
    assert (ck / "meta.json").exists()
    # phase 2: same dir, full epoch budget -> resumes from 20
    params, report = fit_sharded(
        graph, x, y, idx_train, c, checkpoint_dir=str(ck), **kw)

    assert len(report.loss_history) == 40
    np.testing.assert_allclose(
        report.loss_history, ref_report.loss_history, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(params.w), np.asarray(ref_params.w), rtol=1e-6,
        atol=1e-7)


def test_fit_sharded_checkpoint_safety(tmp_path):
    """Wrong-run and corrupted checkpoints degrade to a fresh start
    (warning, never a crash or silently-wrong params)."""
    import warnings

    graph, x, y, idx_train, c = _task(seed=8)
    mesh = make_mesh(4, 1)
    ck = tmp_path / "ckpt"
    kw = dict(mesh=mesh, degree=2, epochs=20, formulation="segment",
              checkpoint_dir=str(ck))

    fit_sharded(graph, x, y, idx_train, c, lr=0.2, **kw)
    assert (ck / "meta.json").exists()

    # different hyperparams => fingerprint mismatch => fresh start
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _, report = fit_sharded(graph, x, y, idx_train, c, lr=0.1, **kw)
    assert any("fingerprint mismatch" in str(x.message) for x in w)
    assert len(report.loss_history) == 20  # trained from scratch

    # garbled meta => fresh start, not a crash loop
    (ck / "meta.json").write_text("{not json")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _, report = fit_sharded(graph, x, y, idx_train, c, lr=0.2, **kw)
    assert any("unreadable checkpoint" in str(x.message) for x in w)
    assert len(report.loss_history) == 20

    # saved epoch beyond the requested budget => ignored with a warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _, report = fit_sharded(graph, x, y, idx_train, c, lr=0.2,
                                **{**kw, "epochs": 10})
    assert any("exceeds the requested" in str(x.message) for x in w)
    assert len(report.loss_history) == 10


def test_fit_sharded_newton_trainer_matches_single_device():
    """trainer="newton": the Böhning/MM head fit sharded by the
    partitioner (psum'd Gram/gradients) must match the single-device
    newton_linear_fit on the same propagated features."""
    import jax.numpy as jnp

    from sgc_tpu.train.optim import newton_linear_fit

    graph, x, y, idx_train, c = _task(seed=5)
    mesh = make_mesh(4, 2)
    params, report = fit_sharded(
        graph, x, y, idx_train, c,
        mesh=mesh, degree=2, epochs=0, weight_decay=1e-4,
        trainer="newton", newton_steps=6,
    )
    assert report.train_accuracy > 0.9

    # single-device oracle: same init geometry (padded F), same mask
    from sgc_tpu.models.sgc import init_sgc

    feats = np.asarray(propagate(jnp.asarray(x), graph, 2))
    f_pad = params.w.shape[0]
    zpad = np.zeros((feats.shape[0], f_pad - feats.shape[1]), np.float32)
    # replicate fit_sharded's padded-row space: rows beyond n get mask 0
    n_pad = -(-feats.shape[0] // 8) * 8
    Z = np.zeros((n_pad, f_pad), np.float32)
    Z[: feats.shape[0]] = np.concatenate([feats, zpad], axis=1)
    yy = np.zeros(n_pad, np.int32)
    yy[: len(y)] = y
    sw = np.zeros(n_pad, np.float32)
    sw[np.asarray(idx_train)] = 1.0
    p0 = init_sgc(jax.random.PRNGKey(42), f_pad, c, bias=True)
    w_ref, b_ref, _ = newton_linear_fit(
        p0.w, p0.b, jnp.asarray(Z), jnp.asarray(yy),
        jnp.asarray(1e-4, jnp.float32), jnp.asarray(sw), steps=6)
    # sharded psum reduction order accumulates f32 rounding over the
    # 6 steps (and through the discrete line-search choices) — the
    # trajectories match to ~1e-2 absolute on O(5) weights
    np.testing.assert_allclose(
        np.asarray(params.w), np.asarray(w_ref), rtol=0.02, atol=0.02)
    np.testing.assert_allclose(
        np.asarray(params.b), np.asarray(b_ref), rtol=0.02, atol=0.02)


def test_fit_sharded_newton_rejects_checkpoint():
    import pytest

    graph, x, y, idx_train, c = _task(seed=6)
    with pytest.raises(ValueError, match="adam"):
        fit_sharded(graph, x, y, idx_train, c, mesh=make_mesh(4, 1),
                    trainer="newton", checkpoint_dir="/tmp/nope")
