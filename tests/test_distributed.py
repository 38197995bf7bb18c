"""Multi-process (DCN-regime) placement and end-to-end parity.

The SPMD programs are mesh-generic; what distributed.py adds is host<->
mesh data movement that works when devices span processes. Unit tests
cover the single-process semantics of put_global / fetch_global directly;
the end-to-end test launches REAL multiple jax.distributed processes
(2 procs x 2 CPU devices) through cli/dist_demo and asserts the sharded
fit reproduces the single-process numbers.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sgc_tpu.parallel.distributed import fetch_global, put_global
from sgc_tpu.parallel.mesh import FEAT_AXIS, NODES_AXIS, make_mesh

from tests.conftest import REPO_ROOT


class TestPutFetchGlobal:
    def test_put_round_trips_host_value(self):
        mesh = make_mesh(4, 2)
        x = np.random.default_rng(0).standard_normal((16, 8)).astype(
            np.float32
        )
        g = put_global(mesh, P(NODES_AXIS, FEAT_AXIS), x)
        assert isinstance(g, jax.Array)
        assert g.sharding.spec == P(NODES_AXIS, FEAT_AXIS)
        np.testing.assert_array_equal(fetch_global(g), x)

    def test_put_accepts_device_array(self):
        mesh = make_mesh(8, 1)
        x = jnp.arange(32, dtype=jnp.float32).reshape(8, 4)
        g = put_global(mesh, P(NODES_AXIS), x)
        np.testing.assert_array_equal(fetch_global(g), np.asarray(x))

    def test_fetch_plain_numpy_passthrough(self):
        x = np.arange(6).reshape(2, 3)
        out = fetch_global(x)
        np.testing.assert_array_equal(out, x)

    def test_fetch_replicated(self):
        mesh = make_mesh(8, 1)
        x = np.float32(3.5) * np.ones((4, 4), np.float32)
        g = put_global(mesh, P(), x)
        np.testing.assert_array_equal(fetch_global(g), x)

    def test_scrub_removes_stale_tpu_vars(self, monkeypatch):
        from sgc_tpu.parallel.distributed import scrub_single_host_tpu_env

        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
        monkeypatch.setenv("TPU_WORKER_ID", "0")
        scrub_single_host_tpu_env()
        assert "TPU_WORKER_HOSTNAMES" not in os.environ
        assert "TPU_WORKER_ID" not in os.environ


class TestMultiProcessEndToEnd:
    def test_two_process_fit_matches_single_process(self, tmp_path):
        """Real 2-process jax.distributed run: cluster bring-up, shard-wise
        placement, cross-process collectives, collective fetch — and the
        result must equal the single-process run on the same global mesh."""
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        # the launcher scrubs TPU vars + sets per-worker XLA_FLAGS itself
        env.pop("XLA_FLAGS", None)
        proc = subprocess.run(
            [sys.executable, "-m", "sgc_tpu.cli.dist_demo",
             "--procs", "2", "--devices-per-proc", "2",
             "--nodes", "1024", "--edges", "8000", "--features", "32",
             "--epochs", "5", "--timeout", "300"],
            env=env, cwd=REPO_ROOT, capture_output=True, text=True,
            timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        report = json.loads(proc.stdout.strip().splitlines()[-1])
        assert report["ok"] is True
        assert report["process_count_seen"] == 2
        assert report["global_devices"] == 4
        assert report["max_loss_deviation_vs_single_process"] < 1e-4
        assert report["max_param_deviation_vs_single_process"] < 1e-4
        # losses must be real training signal, not padding
        assert np.isfinite(report["final_loss"])
