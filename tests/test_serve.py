"""Serving engine + HTTP endpoint tests."""

import json
import threading
import urllib.request

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from sgc_tpu.graph.normalize import aug_normalized_adjacency
from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.models.sgc import init_sgc
from sgc_tpu.serve import EngineConfig, InferenceEngine


@pytest.fixture(scope="module")
def trained():
    """Tiny trained head over precomputed features (separable task)."""
    from sgc_tpu.train.loops import train_regression

    rng = np.random.default_rng(0)
    n, f, c = 64, 16, 3
    y = rng.integers(0, c, n).astype(np.int32)
    feats = rng.standard_normal((n, f)).astype(np.float32) * 0.1
    feats[np.arange(n), y] += 3.0  # class-aligned features
    params = init_sgc(jax.random.PRNGKey(0), f, c)
    params, _ = train_regression(
        params, jnp.asarray(feats), jnp.asarray(y), epochs=60, lr=0.2,
        weight_decay=0.0,
    )
    return params, feats, y


class TestEngine:
    def test_transductive_predictions(self, trained):
        params, feats, y = trained
        eng = InferenceEngine(
            params, features=feats,
            config=EngineConfig(min_batch=4, max_batch=32),
        )
        ids = list(range(20))
        preds = eng.predict(ids)
        assert preds.shape == (20,)
        acc = float((preds == y[:20]).mean())
        assert acc > 0.9
        assert eng.stats.requests >= 1 and eng.stats.rows >= 20

    def test_bucketing(self, trained):
        params, feats, _ = trained
        eng = InferenceEngine(
            params, features=feats,
            config=EngineConfig(min_batch=4, max_batch=32, warmup=False),
        )
        assert eng.bucket_for(3) == 4
        assert eng.bucket_for(4) == 4
        assert eng.bucket_for(5) == 8
        assert eng.bucket_for(32) == 32
        with pytest.raises(ValueError):
            eng.bucket_for(33)

    def test_empty_batch(self, trained):
        params, feats, _ = trained
        eng = InferenceEngine(
            params, features=feats,
            config=EngineConfig(min_batch=4, max_batch=8, warmup=False),
        )
        assert eng.predict([]).shape == (0,)

    def test_inductive_mode(self, trained):
        params, feats, _ = trained
        rng = np.random.default_rng(1)
        n = feats.shape[0]
        adj = sp.coo_matrix(
            (np.ones(400, np.float32),
             (rng.integers(0, n, 400), rng.integers(0, n, 400))),
            shape=(n, n),
        )
        graph = SparseGraph.from_scipy(
            aug_normalized_adjacency(adj + adj.T)
        )
        eng = InferenceEngine(
            params, graph=graph, raw_features=feats,
            config=EngineConfig(min_batch=4, max_batch=8, fanouts=(4, 4)),
        )
        out = eng.predict_logits([0, 1, 2])
        assert out.shape == (3, params.w.shape[1])
        assert np.all(np.isfinite(out))

    def test_mode_exclusivity(self, trained):
        params, feats, _ = trained
        with pytest.raises(ValueError):
            InferenceEngine(params)
        with pytest.raises(ValueError):
            InferenceEngine(params, features=feats, graph="also")


class TestHTTP:
    def test_endpoint_roundtrip(self, trained):
        from sgc_tpu.serve.http import serve

        params, feats, y = trained
        eng = InferenceEngine(
            params, features=feats,
            config=EngineConfig(min_batch=4, max_batch=16),
        )
        server = serve(eng, host="127.0.0.1", port=0)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict",
                data=json.dumps({"node_ids": [0, 1, 2, 3]}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                body = json.loads(r.read())
            assert body["predictions"] == list(np.asarray(y[:4]))

            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30
            ) as r:
                health = json.loads(r.read())
            assert health["status"] == "ok"
            assert health["requests"] >= 1

            # bad request
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict",
                data=json.dumps({"node_ids": "nope"}).encode(),
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 400

            # pipelined batch endpoint: many batches, one HTTP round
            # trip, results in submission order (incl. an empty batch)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict_batch",
                data=json.dumps(
                    {"batches": [[0, 1, 2], [], [4, 5]]}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                body = json.loads(r.read())
            assert body["predictions"] == [
                list(np.asarray(y[:3])), [], list(np.asarray(y[4:6]))]

            # batch endpoint validation: out-of-range id -> 400
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict_batch",
                data=json.dumps({"batches": [[0], [9999]]}).encode(),
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 400
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict_batch",
                data=json.dumps({"batches": "nope"}).encode(),
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 400
        finally:
            server.shutdown()


def test_serve_cli_starts(trained, tmp_path, monkeypatch):
    """CLI wires artifacts -> engine -> bound server."""
    import sys
    import threading

    import sgc_tpu.cli.serve as serve_cli
    from sgc_tpu.utils.checkpoint import save_params

    params, feats, y = trained
    save_params(tmp_path / "model", params)
    np.save(tmp_path / "feats.npy", feats)

    bound = {}

    def fake_forever(self):
        bound["addr"] = self.server_address
        self.server_close()

    monkeypatch.setattr(
        "http.server.HTTPServer.serve_forever", fake_forever
    )
    monkeypatch.setattr(sys, "argv", [
        "serve", "--params", str(tmp_path / "model"),
        "--features", str(tmp_path / "feats.npy"),
        "--port", "0", "--max_batch", "16",
    ])
    serve_cli.main()
    assert bound["addr"][1] > 0


def test_out_of_range_node_ids_rejected(trained):
    params, feats, _ = trained
    eng = InferenceEngine(
        params, features=feats,
        config=EngineConfig(min_batch=4, max_batch=8, warmup=False),
    )
    with pytest.raises(ValueError, match="out of range"):
        eng.predict([0, len(feats)])
    with pytest.raises(ValueError, match="out of range"):
        eng.predict([-1])


def test_int8_quantized_features_match_f32_predictions(trained):
    params, feats, y = trained
    f32 = InferenceEngine(
        params, features=feats,
        config=EngineConfig(min_batch=4, max_batch=32, warmup=False),
    )
    q8 = InferenceEngine(
        params, features=feats,
        config=EngineConfig(min_batch=4, max_batch=32, warmup=False,
                            quantize_int8=True),
    )
    ids = list(range(32))
    np.testing.assert_array_equal(q8.predict(ids), f32.predict(ids))
    # logits agree to int8 quantization error
    np.testing.assert_allclose(
        q8.predict_logits(ids), f32.predict_logits(ids), rtol=0.1, atol=0.2
    )


def test_engine_rejects_non_integer_ids_and_bad_buckets():
    """Round-2 review fixes: fractional node ids must not be silently
    truncated; min_batch=0 must not loop forever."""
    import pytest

    from sgc_tpu.serve.engine import EngineConfig, InferenceEngine, _buckets

    with pytest.raises(ValueError, match="min_batch"):
        _buckets(0, 1024)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((20, 4)).astype(np.float32)
    params = init_sgc(jax.random.PRNGKey(0), 4, 3)
    eng = InferenceEngine(params, features=jnp.asarray(feats),
                          config=EngineConfig(min_batch=4))
    with pytest.raises(ValueError, match="integer"):
        eng.predict_logits([1.9])
    # exact integral floats (JSON round-trip artifacts) are accepted
    out = eng.predict_logits([1.0, 2.0])
    assert out.shape == (2, 3)


def test_engine_shard_store_matches_unsharded():
    """shard_store=True: the feature store rows shard over the 8-device
    mesh; batch logits must equal the single-device engine bitwise
    (same gather + matmul, cross-shard via the SPMD partitioner)."""
    import numpy as np

    import jax

    from sgc_tpu.models.sgc import init_sgc
    from sgc_tpu.serve.engine import EngineConfig, InferenceEngine

    rng = np.random.default_rng(0)
    n, f, c = 103, 24, 5   # deliberately not divisible by 8 devices
    feats = rng.standard_normal((n, f)).astype(np.float32)
    params = init_sgc(jax.random.PRNGKey(1), f, c)

    base = InferenceEngine(
        params, features=feats,
        config=EngineConfig(max_batch=16, min_batch=4, warmup=False))
    sharded = InferenceEngine(
        params, features=feats,
        config=EngineConfig(max_batch=16, min_batch=4, warmup=False,
                            shard_store=True))
    ids = rng.integers(0, n, 11).astype(np.int32)
    a = np.asarray(base.predict(ids))
    b = np.asarray(sharded.predict(ids))
    np.testing.assert_array_equal(a, b)

    # int8 store composes with sharding
    q = InferenceEngine(
        params, features=feats,
        config=EngineConfig(max_batch=16, min_batch=4, warmup=False,
                            quantize_int8=True, shard_store=True))
    qb = InferenceEngine(
        params, features=feats,
        config=EngineConfig(max_batch=16, min_batch=4, warmup=False,
                            quantize_int8=True))
    np.testing.assert_array_equal(np.asarray(q.predict(ids)),
                                  np.asarray(qb.predict(ids)))


class TestBench:
    def test_stats_percentiles_window(self):
        from sgc_tpu.serve.engine import Stats

        s = Stats()
        assert s.percentile_ms(50) == 0.0
        for ms in [1, 2, 3, 4, 100]:
            s.observe(1, ms / 1e3)
        assert s.percentile_ms(50) == pytest.approx(3.0)
        assert s.percentile_ms(99) == pytest.approx(100.0, rel=0.05)
        # bounded window: old outlier falls out after 10k more
        for _ in range(10_000):
            s.observe(1, 0.001)
        assert s.percentile_ms(99) == pytest.approx(1.0)

    def test_bench_variant_sweep(self, trained):
        """_bench_variant returns one row per batch with sane fields."""
        from sgc_tpu.cli.serve import _bench_variant

        params, feats, _ = trained
        eng = InferenceEngine(
            params, features=feats,
            config=EngineConfig(min_batch=4, max_batch=32, warmup=False),
        )
        rows = _bench_variant("f32", eng, [4, 32], reps=3)
        assert [r["batch"] for r in rows] == [4, 32]
        for r in rows:
            assert r["requests"] == 3
            assert r["rows_per_s"] > 0
            assert r["p99_ms"] >= r["p50_ms"] > 0


class TestStagedStore:
    def test_provider_store_matches_ndarray_shard_store(self, trained):
        """shard_store from a row provider == shard_store from the full
        ndarray, bitwise — and the full matrix is never requested in
        one provider call."""
        from tests.test_staging import _ArrayProvider

        params, feats, _ = trained
        cfg = EngineConfig(min_batch=4, max_batch=16, shard_store=True,
                           warmup=False)
        ref = InferenceEngine(params, features=feats, config=cfg)
        prov = _ArrayProvider(feats)
        eng = InferenceEngine(params, features=prov, config=cfg)
        ids = list(range(0, 48, 3))
        np.testing.assert_array_equal(
            ref.predict_logits(ids), eng.predict_logits(ids))
        n_dev = len(jax.devices())
        assert max(b - a for a, b in prov.calls) <= -(-feats.shape[0] // n_dev) + n_dev

    def test_provider_requires_shard_store(self, trained):
        from tests.test_staging import _ArrayProvider

        params, feats, _ = trained
        with pytest.raises(ValueError, match="shard_store"):
            InferenceEngine(params, features=_ArrayProvider(feats),
                            config=EngineConfig(warmup=False))

    def test_padded_row_ids_rejected(self, trained):
        """ids in the zero-pad rows (>= true n) must raise, not serve
        confidently-wrong zeros."""
        from tests.test_staging import _ArrayProvider

        params, feats, _ = trained
        eng = InferenceEngine(
            params, features=_ArrayProvider(feats),
            config=EngineConfig(min_batch=4, max_batch=16,
                                shard_store=True, warmup=False))
        with pytest.raises(ValueError, match="out of range"):
            eng.predict_logits([feats.shape[0]])


def test_inductive_ids_beyond_graph_rejected(trained):
    """inductive mode: ids valid for the feature table but beyond
    graph.n_rows must raise (XLA would clamp the row_ptr gather and
    silently sample the LAST node's neighborhood)."""
    import scipy.sparse as sp

    from sgc_tpu.graph.normalize import aug_normalized_adjacency
    from sgc_tpu.graph.sparse import SparseGraph

    params, feats, _ = trained
    n_graph = feats.shape[0] - 10          # graph smaller than features
    rng = np.random.default_rng(0)
    r = rng.integers(0, n_graph, 200)
    c = rng.integers(0, n_graph, 200)
    adj = sp.coo_matrix((np.ones(200, np.float32), (r, c)),
                        shape=(n_graph, n_graph))
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj + adj.T))
    eng = InferenceEngine(
        params, graph=graph, raw_features=feats,
        config=EngineConfig(min_batch=4, max_batch=16, warmup=False))
    assert eng.predict_logits([0, 1]).shape == (2, params.w.shape[1])
    with pytest.raises(ValueError, match="out of range"):
        eng.predict_logits([n_graph])      # valid feature row, no graph row


class TestPipelinedStream:
    """predict_logits_stream: pipelined dispatch (VERDICT round-4 #5)."""

    def _engine(self, trained, **cfg):
        params, feats, _ = trained
        return InferenceEngine(
            params, features=feats,
            config=EngineConfig(min_batch=4, max_batch=32, warmup=False,
                                **cfg))

    def test_stream_matches_blocking_bitwise(self, trained):
        eng = self._engine(trained)
        rng = np.random.default_rng(3)
        batches = [rng.integers(0, 64, size=b)
                   for b in (7, 32, 1, 16, 32, 5)]
        blocking = [eng.predict_logits(b) for b in batches]
        for depth in (1, 2, 4):
            streamed = list(eng.predict_logits_stream(batches, depth=depth))
            assert len(streamed) == len(blocking)
            for got, want in zip(streamed, blocking):
                np.testing.assert_array_equal(got, want)

    def test_stream_handles_empty_and_orders_results(self, trained):
        eng = self._engine(trained)
        batches = [[1, 2, 3], [], [10]]
        outs = list(eng.predict_logits_stream(batches, depth=2))
        assert [o.shape[0] for o in outs] == [3, 0, 1]
        np.testing.assert_array_equal(outs[2], eng.predict_logits([10]))

    def test_stream_validates_like_blocking(self, trained):
        eng = self._engine(trained)
        with pytest.raises(ValueError, match="out of range"):
            list(eng.predict_logits_stream([[0], [999]], depth=2))
        with pytest.raises(ValueError, match="depth"):
            list(eng.predict_logits_stream([[0]], depth=0))

    def test_stream_observes_stats(self, trained):
        eng = self._engine(trained)
        from sgc_tpu.serve.engine import Stats

        eng.stats = Stats()
        list(eng.predict_logits_stream([[1, 2]] * 5, depth=2))
        assert eng.stats.requests == 5 and eng.stats.rows == 10

    def test_stream_shard_store(self, trained):
        """The pipelined path composes with the sharded feature store."""
        base = self._engine(trained)
        sharded = self._engine(trained, shard_store=True)
        batches = [[0, 5, 9], [63, 1]]
        for got, want in zip(
            sharded.predict_logits_stream(batches, depth=2),
            base.predict_logits_stream(batches, depth=2),
        ):
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
