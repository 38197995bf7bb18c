"""Checkpoint/resume, profiling, and GCN training tests."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from sgc_tpu.graph.normalize import aug_normalized_adjacency
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.models.gcn import gcn_apply, init_gcn
from sgc_tpu.models.sgc import init_sgc
from sgc_tpu.ops.spmm import spmm
from sgc_tpu.train.loops import train_gcn
from sgc_tpu.utils.checkpoint import (
    PropagationCheckpointer,
    load_features,
    load_params,
    propagate_with_checkpoints,
    save_features,
    save_params,
)
from sgc_tpu.utils.profiling import Metrics, sync


def _graph(n=60, seed=0):
    a = sp.random(n, n, density=0.1, random_state=seed, format="coo")
    a = a + a.T
    return SparseGraph.from_scipy(aug_normalized_adjacency(a))


def test_propagation_checkpoint_resume(tmp_path):
    g = _graph()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(60, 8)), jnp.float32)

    from sgc_tpu.utils.checkpoint import propagation_fingerprint

    full = propagate_with_checkpoints(x, g, 3, tmp_path)
    # simulate restart: hop 0,1,2 saved; resume must reuse hop files
    ckpt = PropagationCheckpointer(
        tmp_path, propagation_fingerprint(g, x, 3)
    )
    restored, next_hop = ckpt.restore(x)
    assert next_hop == 3
    np.testing.assert_allclose(np.asarray(restored), np.asarray(full))

    # content-aware: different edge VALUES (same shapes) must NOT restore
    g2 = g.with_vals(g.vals * 2.0)
    assert propagation_fingerprint(
        g2, x, 3
    ) != propagation_fingerprint(g, x, 3)

    # mismatched fingerprint (different K) restarts from scratch
    ckpt2 = PropagationCheckpointer(tmp_path, "different")
    _, h = ckpt2.restore(x)
    assert h == 0

    # GENUINE mid-propagation resume: a checkpoint holding only hop 0
    # under the MATCHING fingerprint must resume at hop 1 (not recompute
    # hop 0) and still equal straight-through. The spy below fails the
    # test if resume silently fell back to a from-scratch run.
    import tempfile

    with tempfile.TemporaryDirectory() as d2:
        fp = propagation_fingerprint(g, x, 3)
        partial_ckpt = PropagationCheckpointer(d2, fp)
        one_hop = spmm(g, x)
        partial_ckpt.save_hop(0, one_hop)
        restored, nxt = partial_ckpt.restore(x)
        assert nxt == 1, "matching fingerprint must resume after hop 0"
        np.testing.assert_allclose(
            np.asarray(restored), np.asarray(one_hop)
        )
        calls = []
        import importlib

        spmm_mod = importlib.import_module("sgc_tpu.ops.spmm")
        real = spmm_mod.spmm

        def spy(*a, **k):
            calls.append(1)
            return real(*a, **k)

        spmm_mod.spmm = spy
        try:
            resumed = propagate_with_checkpoints(x, g, 3, d2)
        finally:
            spmm_mod.spmm = real
        assert len(calls) == 2, (
            f"resume ran {len(calls)} hops; expected 2 (hops 1 and 2)"
        )
        np.testing.assert_allclose(
            np.asarray(resumed), np.asarray(full), rtol=1e-6
        )


def test_params_roundtrip(tmp_path):
    p = init_sgc(jax.random.PRNGKey(0), 12, 3)
    save_params(tmp_path / "p.npz", p)
    q = load_params(tmp_path / "p.npz")
    np.testing.assert_array_equal(np.asarray(p.w), np.asarray(q.w))
    np.testing.assert_array_equal(np.asarray(p.b), np.asarray(q.b))

    feats = {"train": jnp.ones((4, 5)), "test": jnp.zeros((2, 5))}
    save_features(tmp_path / "f.npz", feats)
    back = load_features(tmp_path / "f.npz")
    assert set(back) == {"train", "test"}
    np.testing.assert_array_equal(np.asarray(back["train"]), np.ones((4, 5)))


def test_metrics_timer_and_rates():
    m = Metrics()
    x = jnp.ones((128, 128))
    with m.timer("precompute") as t:
        t.result = x
        y = x * 2
    assert m.timings["precompute"] > 0
    m.count("edges", 1000)
    assert m.spmm_rate(500, 2) > 0
    assert "timings_s" in m.report()


def test_gcn_learns_two_clusters():
    rng = np.random.default_rng(3)
    n, half = 80, 40
    labels = np.concatenate([np.zeros(half), np.ones(half)]).astype(np.int32)
    edges = []
    for _ in range(n * 8):
        c = rng.integers(0, 2)
        edges.append((rng.integers(0, half) + c * half,
                      rng.integers(0, half) + c * half))
    r, c = np.array(edges).T
    adj = sp.coo_matrix((np.ones(len(edges), np.float32), (r, c)), shape=(n, n))
    g = SparseGraph.from_scipy(aug_normalized_adjacency(adj + adj.T))
    feats = jnp.asarray(
        labels[:, None] + rng.normal(0, 1.0, size=(n, 6)), jnp.float32
    )
    idx_train = jnp.asarray(np.arange(0, n, 2))
    params = init_gcn(jax.random.PRNGKey(0), 6, 8, 2)
    params, _ = train_gcn(
        params, feats, g, idx_train, jnp.asarray(labels[::2]),
        epochs=100, weight_decay=5e-4, lr=0.05, dropout=0.3,
    )
    logits = gcn_apply(params, feats, g)
    test_idx = np.arange(1, n, 2)
    acc = float(jnp.mean(
        (jnp.argmax(logits[test_idx], 1) == jnp.asarray(labels[test_idx]))
        .astype(jnp.float32)
    ))
    assert acc > 0.9, acc


def test_transformer_params_checkpoint_roundtrip(tmp_path):
    """save_params/load_params over the nested transformer pytree."""
    import jax

    from sgc_tpu.models.transformer import (
        TransformerConfig, init_transformer, transformer_apply,
    )
    from sgc_tpu.utils.checkpoint import load_params, save_params

    cfg = TransformerConfig(
        vocab_size=32, n_classes=3, max_len=8, dim=16, n_heads=2, n_layers=2
    )
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    save_params(tmp_path / "ckpt", params)
    back = load_params(tmp_path / "ckpt")

    ids = jnp.asarray(np.zeros((2, 8), np.int32))
    mask = jnp.ones((2, 8), jnp.float32)
    a = np.asarray(transformer_apply(params, ids, mask))
    b = np.asarray(transformer_apply(back, ids, mask))
    np.testing.assert_array_equal(a, b)


def test_sharded_checkpoint_roundtrip(tmp_path):
    """orbax sharded-state save/restore preserves values and shardings."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sgc_tpu.parallel.mesh import make_mesh
    from sgc_tpu.utils.checkpoint import (
        load_sharded, orbax_available, save_sharded,
    )

    mesh = make_mesh(4, 2)
    x = jnp.arange(64.0, dtype=jnp.float32).reshape(8, 8)
    xs = jax.device_put(x, NamedSharding(mesh, P("nodes", "feat")))
    tree = {"w": xs, "step": jnp.asarray(7)}
    save_sharded(tmp_path / "state", tree)
    back = load_sharded(tmp_path / "state")
    np.testing.assert_array_equal(np.asarray(back["w"]), np.asarray(x))
    assert int(back["step"]) == 7
    if orbax_available():
        # restore onto the mesh layout
        like = {"w": xs, "step": jnp.asarray(0)}
        back2 = load_sharded(tmp_path / "state", like=like)
        assert back2["w"].sharding == xs.sharding


def test_feature_cache_suffixless_path_roundtrips(tmp_path):
    """--feat_cache paths without .npz must hit their cache on reload
    (np.savez appends the suffix; save/load/exists all normalize now)."""
    import jax.numpy as jnp

    from sgc_tpu.utils.checkpoint import (
        _npz_path,
        load_features,
        save_features,
    )

    cache = tmp_path / "feats.pkl"   # the suffix users actually pass
    d = {"train": jnp.ones((4, 3)), "val": jnp.zeros((2, 3))}
    save_features(cache, d)
    assert _npz_path(cache).exists()
    back = load_features(cache)
    np.testing.assert_array_equal(np.asarray(back["train"]), np.ones((4, 3)))


def test_propagation_checkpointer_corrupt_meta_restarts(tmp_path):
    """A half-written meta.json (crash mid-save) restarts cleanly instead
    of crashing the resume; superseded hop files are dropped."""
    import jax.numpy as jnp

    from sgc_tpu.utils.checkpoint import PropagationCheckpointer

    ckpt = PropagationCheckpointer(tmp_path, "fp1")
    x0 = jnp.ones((3, 2))
    ckpt.save_hop(0, x0)
    ckpt.save_hop(1, x0 * 2)
    assert not (tmp_path / "hop_0.npz").exists()   # superseded, dropped
    x, nxt = ckpt.restore(x0)
    assert nxt == 2

    (tmp_path / "meta.json").write_text("{\"finger")   # truncated write
    x, nxt = ckpt.restore(x0)
    assert nxt == 0
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x0))
