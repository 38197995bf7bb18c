"""Tests: neighborhood-sampled inference + transformer sequence baseline."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from sgc_tpu.graph.normalize import aug_normalized_adjacency
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.ops.sampling import (
    sample_neighbors,
    sampled_propagate,
    sampled_sgc_infer,
)
from sgc_tpu.ops.spmm import spmm


def _random_graph(n=64, e=512, seed=0):
    rng = np.random.default_rng(seed)
    src, dst = rng.integers(0, n, e), rng.integers(0, n, e)
    adj = sp.coo_matrix((np.ones(e, np.float32), (src, dst)), shape=(n, n))
    adj = adj + adj.T
    norm = aug_normalized_adjacency(adj)
    return SparseGraph.from_scipy(norm), norm


class TestSampling:
    def test_sample_neighbors_valid(self):
        graph, norm = _random_graph()
        nodes = jnp.arange(16, dtype=jnp.int32)
        nbr, w = sample_neighbors(graph, nodes, jax.random.PRNGKey(0), 8)
        assert nbr.shape == (16, 8) and w.shape == (16, 8)
        csr = norm.tocsr()
        nbr_np, w_np = np.asarray(nbr), np.asarray(w)
        for i, v in enumerate(range(16)):
            neighbors = set(csr.indices[csr.indptr[v]:csr.indptr[v + 1]])
            assert set(nbr_np[i]) <= neighbors  # aug-norm adds self loops
            assert np.all(w_np[i] > 0)

    def test_isolated_node_zero_weight(self):
        # node 3 has no edges at all (not even self — raw adjacency)
        adj = sp.coo_matrix(
            (np.ones(2, np.float32), ([0, 1], [1, 0])), shape=(4, 4)
        )
        graph = SparseGraph.from_scipy(adj.tocsr())
        nbr, w = sample_neighbors(
            graph, jnp.asarray([3], jnp.int32), jax.random.PRNGKey(0), 4
        )
        assert np.all(np.asarray(nbr) == 3)       # self fallback
        assert np.all(np.asarray(w) == 0.0)

    def test_estimator_unbiased_vs_exact_hop(self):
        """Mean over many sampled draws converges to the exact S @ x row."""
        graph, norm = _random_graph(n=32, e=256, seed=1)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((32, 8), dtype=np.float32))
        exact = spmm(graph, x)

        nodes = jnp.arange(32, dtype=jnp.int32)
        acc = np.zeros((32, 8), np.float64)
        trials = 300
        for t in range(trials):
            est = sampled_propagate(
                graph, x, nodes, jax.random.PRNGKey(t), (8,)
            )
            acc += np.asarray(est, np.float64)
        np.testing.assert_allclose(
            acc / trials, np.asarray(exact), atol=0.15, rtol=0.2
        )

    def test_large_fanout_two_hop_low_variance(self):
        """Two-hop estimate with fanout >> mean degree on a random graph:
        a single draw lands within a coarse variance bound of exact.
        (Sampling is WITH replacement, so no finite fanout is per-draw
        exact — per-draw unbiasedness is covered by the expectation test
        above.)"""
        graph, norm = _random_graph(n=16, e=64, seed=3)
        x = jnp.asarray(
            np.random.default_rng(4).standard_normal((16, 4), dtype=np.float32)
        )
        est2 = sampled_propagate(
            graph, x, jnp.arange(16, dtype=jnp.int32),
            jax.random.PRNGKey(9), (64, 64),
        )
        exact2 = spmm(graph, spmm(graph, x))
        # big fanout -> low variance two-hop estimate
        err = np.abs(np.asarray(est2) - np.asarray(exact2)).mean()
        scale = np.abs(np.asarray(exact2)).mean() + 1e-9
        assert err / scale < 0.35

    def test_sampled_sgc_infer_shapes(self):
        from sgc_tpu.models.sgc import init_sgc

        graph, _ = _random_graph()
        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((64, 12), dtype=np.float32)
        )
        params = init_sgc(jax.random.PRNGKey(0), 12, 5)
        logits = sampled_sgc_infer(
            params, graph, x, np.arange(10), jax.random.PRNGKey(1), (4, 4)
        )
        assert logits.shape == (10, 5)
        assert np.all(np.isfinite(np.asarray(logits)))


class TestTransformer:
    def _tiny(self):
        from sgc_tpu.models.transformer import TransformerConfig

        return TransformerConfig(
            vocab_size=64, n_classes=3, max_len=12, dim=32, n_heads=2,
            n_layers=2,
        )

    def test_forward_shapes_finite(self):
        from sgc_tpu.models.transformer import (
            init_transformer, transformer_apply,
        )

        cfg = self._tiny()
        params = init_transformer(jax.random.PRNGKey(0), cfg)
        ids = jnp.asarray(
            np.random.default_rng(0).integers(0, 64, (4, 12)), jnp.int32
        )
        mask = jnp.ones((4, 12), jnp.float32)
        logits = transformer_apply(params, ids, mask)
        assert logits.shape == (4, 3)
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_padding_invariance(self):
        """Front padding must not change the logits of the real tokens."""
        from sgc_tpu.models.transformer import (
            init_transformer, transformer_apply,
        )

        cfg = self._tiny()
        params = init_transformer(jax.random.PRNGKey(1), cfg)
        rng = np.random.default_rng(1)
        toks = rng.integers(2, 64, 6)

        ids_a = np.zeros((1, 12), np.int32)
        mask_a = np.zeros((1, 12), np.float32)
        ids_a[0, 6:] = toks
        mask_a[0, 6:] = 1.0

        ids_b = np.zeros((1, 12), np.int32)
        ids_b[0, 6:] = toks
        ids_b[0, :6] = 37  # garbage in padded region
        la = transformer_apply(params, jnp.asarray(ids_a), jnp.asarray(mask_a))
        lb = transformer_apply(params, jnp.asarray(ids_b), jnp.asarray(mask_a))
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=2e-2)

    def test_head_only_freezes_encoder(self):
        from sgc_tpu.models.transformer import (
            init_transformer, transformer_apply,
        )

        cfg = self._tiny()
        params = init_transformer(jax.random.PRNGKey(2), cfg)
        ids = jnp.asarray(
            np.random.default_rng(2).integers(0, 64, (2, 12)), jnp.int32
        )
        mask = jnp.ones((2, 12), jnp.float32)

        def loss(p, head_only):
            logits = transformer_apply(p, ids, mask, head_only=head_only)
            return jnp.sum(logits**2)

        g = jax.grad(lambda p: loss(p, True))(params)
        assert float(jnp.abs(g.layers[0].wq).max()) == 0.0
        assert float(jnp.abs(g.cls_w).max()) > 0.0
        g_full = jax.grad(lambda p: loss(p, False))(params)
        assert float(jnp.abs(g_full.layers[0].wq).max()) > 0.0

    def test_train_sequence_classifier_learns(self):
        """Separable toy task: token identity determines the class."""
        from sgc_tpu.models.transformer import TransformerConfig
        from sgc_tpu.train.sequence import (
            SeqTrainConfig, predict_sequence, train_sequence_classifier,
        )

        rng = np.random.default_rng(0)
        words = {0: ["aa", "bb", "cc"], 1: ["xx", "yy", "zz"]}
        docs, labels = [], []
        for _ in range(60):
            y = int(rng.integers(0, 2))
            docs.append(list(rng.choice(words[y], 5)))
            labels.append(y)
        cfg = TransformerConfig(
            vocab_size=32, n_classes=2, max_len=8, dim=32, n_heads=2,
            n_layers=1,
        )
        params, vocab = train_sequence_classifier(
            docs, np.asarray(labels), cfg,
            SeqTrainConfig(lr=3e-3, epochs=10, batch_size=16, dropout=0.0),
        )
        preds = predict_sequence(params, docs, vocab, cfg.max_len)
        acc = float((preds == np.asarray(labels)).mean())
        assert acc > 0.9, f"toy accuracy {acc}"
