"""Multi-host init + edges/s scaling-efficiency harness.

BASELINE.json's north star requires "edges/s scaling efficiency reported
at 1 chip, 1 host, and N>=2 hosts". The reference has no distributed
path at all (SURVEY.md §2.5); this module provides:

* :func:`init_distributed` — ``jax.distributed`` bring-up for multi-host
  pods (DCN coordination), env-var autodetecting (TPU pod runtimes set
  everything; explicit args override for manual launches). Safe no-op on
  single-process runs.
* :func:`measure_spmm_scaling` — times K-hop propagation on a 1-device
  baseline and on an n-device "nodes"-partitioned mesh (halo exchange
  over ICI) and reports edges/s plus parallel efficiency
  ``rate_n / (n * rate_1)``. Works identically on a virtual CPU mesh
  (tests) and a real slice.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.ops.spmm import spmm
from sgc_tpu.parallel.halo import build_halo
from sgc_tpu.parallel.mesh import make_mesh
from sgc_tpu.parallel.partition import pad_node_rows, partition_graph
from sgc_tpu.parallel.spmm import propagate_sharded, shard_features
from sgc_tpu.utils.profiling import sync


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed for multi-host execution.

    Returns True if distributed mode was initialized (or already active),
    False for single-process runs. TPU pod runtimes autodetect all three
    params from the environment; pass them explicitly for manual
    CPU/GPU multi-process launches.
    """
    if num_processes is None and coordinator_address is None:
        import os

        # pod runtimes export one of these; bare single-host runs do not
        if not any(
            k in os.environ
            for k in ("MEGASCALE_COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                      "COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")
        ):
            return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return jax.process_count() > 1
        # a genuine bring-up failure (bad coordinator, unreachable peers)
        # must not silently degrade into a single-process run
        raise


@dataclasses.dataclass
class ScalingReport:
    n_devices: int
    edges: int
    hops: int
    single_rate: float        # edges/s, 1 device
    sharded_rate: float       # edges/s, n devices
    efficiency: float         # sharded_rate / (n * single_rate)
    halo_fraction: float      # fraction of columns needing exchange

    def __str__(self) -> str:
        return (
            f"scaling: {self.n_devices} devices, {self.edges} edges x "
            f"{self.hops} hops | 1-dev {self.single_rate/1e6:.1f} Me/s, "
            f"{self.n_devices}-dev {self.sharded_rate/1e6:.1f} Me/s, "
            f"efficiency {self.efficiency:.2%}, halo "
            f"{self.halo_fraction:.2%}"
        )


def measure_spmm_scaling(
    graph: SparseGraph,
    features: np.ndarray,
    n_devices: int | None = None,
    hops: int = 2,
    repeats: int = 3,
) -> ScalingReport:
    """Edges/s on 1 device vs an n-device node-partitioned mesh."""
    from sgc_tpu.parallel.halo import halo_fraction

    if n_devices is None:
        n_devices = len(jax.devices())
    x = jnp.asarray(np.asarray(features, np.float32))

    # --- single device ---
    @jax.jit
    def single(x):
        for _ in range(hops):
            x = spmm(graph, x, impl="segment")
        return x

    sync(single(x))  # warm
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = single(x)
    sync(out)
    t_single = (time.perf_counter() - t0) / repeats

    # --- sharded ---
    mesh = make_mesh(n_devices, 1)
    pgraph = partition_graph(graph, n_devices)
    halo = build_halo(pgraph)
    xs = shard_features(mesh, pad_node_rows(x, pgraph.n_rows_padded))

    def sharded(xs):
        return propagate_sharded(mesh, pgraph, xs, hops, halo=halo)

    jitted = jax.jit(sharded)
    sync(jitted(xs))  # warm
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = jitted(xs)
    sync(out)
    t_sharded = (time.perf_counter() - t0) / repeats

    e = graph.nnz * hops
    single_rate = e / t_single
    sharded_rate = e / t_sharded
    return ScalingReport(
        n_devices=n_devices,
        edges=graph.nnz,
        hops=hops,
        single_rate=single_rate,
        sharded_rate=sharded_rate,
        efficiency=sharded_rate / (n_devices * single_rate),
        halo_fraction=halo_fraction(halo, pgraph),
    )
