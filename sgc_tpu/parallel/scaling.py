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
    else:
        # Explicit manual launch: stale single-host TPU cluster variables
        # (e.g. TPU_WORKER_HOSTNAMES=localhost from a single-chip runtime)
        # make initialize() mis-detect a 1-worker pod and ignore the
        # explicit arguments (measured; parallel/distributed.py).
        from sgc_tpu.parallel.distributed import scrub_single_host_tpu_env

        scrub_single_host_tpu_env()
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
    plan_build_s: float = 0.0  # host time to partition + build the plan

    def __str__(self) -> str:
        return (
            f"scaling: {self.n_devices} devices, {self.edges} edges x "
            f"{self.hops} hops | 1-dev {self.single_rate/1e6:.1f} Me/s, "
            f"{self.n_devices}-dev {self.sharded_rate/1e6:.1f} Me/s, "
            f"efficiency {self.efficiency:.2%}, halo "
            f"{self.halo_fraction:.2%}, plan build {self.plan_build_s:.2f}s"
        )


# Aggregate per-chip ICI bandwidth assumption for projections. v5e has a
# 2D torus with 4 links x ~50 GB/s/dir (1,600 Gbps total per chip); the
# achievable all-to-all number is lower — this is a MODEL constant, made
# explicit in every report that uses it, overridable per call.
V5E_ICI_GBPS = 180.0

# Per-host DCN (data-center network) bandwidth assumption for cross-host
# projections: ~100 Gbps NIC per v5e host = 12.5 GB/s. Same caveats as
# above — a MODEL constant, explicit in reports, overridable per call.
V5E_DCN_GBPS = 12.5


def comm_model(
    graph: SparseGraph,
    feature_dim: int,
    n_devices: int,
    single_rate_edges_s: float,
    bytes_per_elem: int = 4,
    ici_gbps: float = V5E_ICI_GBPS,
    build_plan: bool = True,
) -> dict:
    """Per-hop ICI byte counts + projected N-chip scaling efficiency.

    Host-side model (no devices needed): partitions the graph, builds the
    halo plan, and reports per-chip per-hop communication volume for both
    exchange variants plus a projected efficiency from the measured
    single-chip edge rate:

        t_local = (E / N) / single_rate
        t_comm  = bytes_per_chip / ici_bw
        eff     = t_local / max(t_local, t_comm)   (full overlap assumed)

    This is the auditable stand-in for the >=80% edges/s north star until
    real multi-chip hardware is attached (VERDICT round-1 #7/#6): the
    model inputs (H, halo fraction, bytes, assumed ICI bw) are all in the
    output, so a future real-pod measurement can be checked against it.
    """
    from sgc_tpu.parallel.halo import halo_stats
    from sgc_tpu.parallel.partition import _round_up

    t0 = time.perf_counter()
    # device=False: this is host-side MODELLING — eager device placement
    # would round-trip the edge arrays over a tunneled backend
    pgraph = partition_graph(graph, n_devices, device=False)
    if build_plan:
        # materialize the full exchange plan (send_idx + edge remap) —
        # what a real run would build; timing reported as plan_build_s
        halo = build_halo(pgraph, device=False)
        H = halo.halo_width
    else:
        # sizing-only path (bench.py): per-pair width counting gives H
        # without the remap/scatter passes — same model numbers, a
        # fraction of the host time at 10M+ edges
        from sgc_tpu.parallel.halo import HALO_PAD

        stats = halo_stats(pgraph)
        H = _round_up(max(stats["max_pair_width"], 1), HALO_PAD)
    plan_build_s = time.perf_counter() - t0

    P = n_devices
    F = feature_dim
    # all_to_all: each chip sends (P-1) blocks of H rows and receives the
    # same; count one direction (links are full duplex).
    halo_bytes = (P - 1) * H * F * bytes_per_elem
    # all-gather: each chip receives every other chip's row block.
    n_pad = pgraph.n_rows_padded
    allgather_bytes = (n_pad - n_pad // P) * F * bytes_per_elem

    ici_bw = ici_gbps * 1e9
    t_local = (graph.nnz / P) / max(single_rate_edges_s, 1.0)
    t_halo = halo_bytes / ici_bw
    t_ag = allgather_bytes / ici_bw

    def eff(t_comm: float) -> float:
        return t_local / max(t_local, t_comm)

    return {
        "devices": P,
        "halo_width": H,
        "halo_fraction": round(P * H / pgraph.n_rows_padded, 4),
        "plan_build_s": round(plan_build_s, 3),
        "ici_bytes_per_hop_halo": int(halo_bytes),
        "ici_bytes_per_hop_allgather": int(allgather_bytes),
        "assumed_ici_gbps": ici_gbps,
        "projected_efficiency_halo": round(eff(t_halo), 4),
        "projected_efficiency_allgather": round(eff(t_ag), 4),
    }


def halo_width_model(
    graph: SparseGraph, n_parts: int, row_align: int = 8
) -> tuple[int, int]:
    """(halo width H, padded row count) for a P-part row-block partition,
    computed straight from the COO edge list — no ``[P, E_max]``
    partition materialization, so sweeping many device counts stays
    cheap at 10M+ edges. Exactness vs the real plan builder
    (``build_halo(partition_graph(g, P)).halo_width``) is pinned by
    tests/test_comm_model.py.
    """
    from sgc_tpu.parallel.halo import HALO_PAD
    from sgc_tpu.parallel.partition import _round_up

    P = n_parts
    R = _round_up(-(-graph.n_rows // P), row_align)
    rows = np.asarray(graph.rows)[: graph.nnz].astype(np.int64)
    cols = np.asarray(graph.cols)[: graph.nnz].astype(np.int64)
    vals = np.asarray(graph.vals)[: graph.nnz]
    dst = np.minimum(rows // R, P - 1)
    src = np.minimum(cols // R, P - 1)
    remote = (vals != 0) & (src != dst)
    ncp = np.int64(P) * R
    key = (dst[remote] * P + src[remote]) * ncp + cols[remote]
    if not len(key):
        return HALO_PAD, P * R
    pair = np.unique(key) // ncp
    h_max = int(np.bincount(pair, minlength=P * P).max())
    return _round_up(max(h_max, 1), HALO_PAD), P * R


def comm_sweep(
    graph: SparseGraph,
    feature_dim: int,
    single_rate_edges_s: float,
    device_counts: tuple = (8, 16, 32, 64),
    fabrics: dict | None = None,
    bytes_per_elem: int = 4,
    target: float = 0.8,
) -> dict:
    """Device-count x fabric-bandwidth sweep of the projected scaling
    efficiency — the falsifiable form of the >=80% north star
    (BASELINE.md:33-34; VERDICT round-3 #5: at 8 devices x 180 GB/s both
    exchange variants round to 1.0, so a single-point model discriminates
    nothing).

    For every (P, fabric) the sweep projects BOTH exchange variants
    (halo all_to_all vs full all-gather) with the same overlap model as
    :func:`comm_model` and reports which wins; ``first_below_target`` is
    the first configuration (fabric-major, devices ascending) where even
    the winning exchange drops under ``target`` — the point at which the
    claim would fail on real hardware.

    Fabrics default to {"ici": 180 GB/s (v5e torus), "dcn": 25 GB/s
    (2x100 Gbps-class NICs per host)} — MODEL constants, explicit in the
    output so a real-pod measurement can audit every input.
    """
    if fabrics is None:
        fabrics = {"ici": V5E_ICI_GBPS, "dcn": 25.0}
    E = graph.nnz
    F = feature_dim
    rows = []
    first_below = None
    widths = {P: halo_width_model(graph, P) for P in device_counts}
    for fabric, gbps in fabrics.items():
        bw = gbps * 1e9
        for P in device_counts:
            H, n_pad = widths[P]
            halo_bytes = (P - 1) * H * F * bytes_per_elem
            ag_bytes = (n_pad - n_pad // P) * F * bytes_per_elem
            t_local = (E / P) / max(single_rate_edges_s, 1.0)
            eff_halo = t_local / max(t_local, halo_bytes / bw)
            eff_ag = t_local / max(t_local, ag_bytes / bw)
            winner = "halo" if eff_halo >= eff_ag else "all_gather"
            row = {
                "devices": P,
                "fabric": fabric,
                "gbps": gbps,
                "halo_width": H,
                "ici_bytes_per_hop_halo": int(halo_bytes),
                "ici_bytes_per_hop_allgather": int(ag_bytes),
                "efficiency_halo": round(eff_halo, 4),
                "efficiency_allgather": round(eff_ag, 4),
                "winner": winner,
            }
            rows.append(row)
            if first_below is None and max(eff_halo, eff_ag) < target:
                first_below = {
                    "devices": P,
                    "fabric": fabric,
                    "gbps": gbps,
                    "efficiency": round(max(eff_halo, eff_ag), 4),
                    "winner": winner,
                }
    return {
        "rate_edges_per_s": single_rate_edges_s,
        "feature_dim": F,
        "target": target,
        "rows": rows,
        "first_below_target": first_below,
    }


def comm_model_two_level(
    graph: SparseGraph,
    feature_dim: int,
    n_hosts: int,
    devices_per_host: int,
    single_rate_edges_s: float,
    bytes_per_elem: int = 4,
    ici_gbps: float = V5E_ICI_GBPS,
    dcn_gbps: float = V5E_DCN_GBPS,
) -> dict:
    """Two-fabric (ICI within host, DCN across hosts) halo-traffic model.

    Splits the per-hop exchange volume of a P = n_hosts*devices_per_host
    node partition by which fabric each (dst, src) pair crosses
    (contiguous parts per host — the layout put_global produces on a
    multi-host mesh), and projects scaling efficiency with the two
    transfers overlapped:

        eff = t_local / max(t_local, t_ici, t_dcn)

    Units: ``ici_bytes_*`` are per CHIP per hop (each chip drives its
    own ICI links); ``dcn_bytes_*`` are per HOST per hop (the NIC is a
    shared per-host resource). Two cross-host variants are reported:
      * flat     — the implemented uniform all_to_all: every remote pair
                   exchanges the global max width H over whichever fabric
                   connects it; DCN pairs dominate cost.
      * hierarchical — each needed row crosses DCN ONCE per destination
                   host (union over its chips; exact ragged byte counts
                   from the edge list) and fans out over ICI. This is the
                   design target for pod-scale runs; the gap between the
                   two is the payoff of adding the host-level stage.

    Pure host-side analysis (no devices needed); all model inputs are in
    the output so a real multi-host measurement can audit it.
    """
    from sgc_tpu.parallel.halo import (
        HALO_PAD,
        host_union_widths,
        pair_width_matrix,
    )
    from sgc_tpu.parallel.partition import _round_up

    P = n_hosts * devices_per_host
    D = devices_per_host
    F = feature_dim
    t0 = time.perf_counter()
    pgraph = partition_graph(graph, P, device=False)   # host-side model
    W = pair_width_matrix(pgraph)                      # [P, P]
    U = host_union_widths(pgraph, n_hosts)             # [n_hosts, P]
    plan_build_s = time.perf_counter() - t0

    H = _round_up(max(int(W.max()), 1), HALO_PAD)
    part_host = np.arange(P) // D
    same_host = part_host[:, None] == part_host[None, :]
    off_diag = ~np.eye(P, dtype=bool)

    # flat uniform exchange: H rows per remote pair, one direction
    # counted. ICI volume is per CHIP (each chip drives its own links);
    # DCN volume is per HOST (the NIC is a shared per-host resource, so
    # a host's cost is the sum over its D chips' cross-host pairs).
    n_ici_pairs = int((same_host & off_diag).sum(axis=1).max())
    dcn_pairs_per_host = (~same_host).sum(axis=1).reshape(n_hosts, D)
    n_dcn_pairs = int(dcn_pairs_per_host.sum(axis=1).max())
    ici_flat = n_ici_pairs * H * F * bytes_per_elem
    dcn_flat = n_dcn_pairs * H * F * bytes_per_elem

    # hierarchical: exact ragged row counts; DCN volume is the per-host
    # union of remote-host rows (each row crosses DCN once), ICI volume
    # is the worst chip's intra-host ragged exchange
    remote_src = part_host[None, :P] != np.arange(n_hosts)[:, None]
    dcn_rows_per_host = (U * remote_src).sum(axis=1)
    dcn_hier = int(dcn_rows_per_host.max()) * F * bytes_per_elem
    ici_rows_per_chip = (W * (same_host & off_diag)).sum(axis=1)
    ici_hier = int(ici_rows_per_chip.max()) * F * bytes_per_elem

    t_local = (graph.nnz / P) / max(single_rate_edges_s, 1.0)

    def eff(ici_bytes: float, dcn_bytes: float) -> float:
        t_ici = ici_bytes / (ici_gbps * 1e9)
        t_dcn = dcn_bytes / (dcn_gbps * 1e9)
        return t_local / max(t_local, t_ici, t_dcn)

    return {
        "hosts": n_hosts,
        "devices_per_host": D,
        "devices": P,
        "halo_width": H,
        "plan_build_s": round(plan_build_s, 3),
        "ici_bytes_per_hop_flat": int(ici_flat),
        "dcn_bytes_per_hop_flat": int(dcn_flat),
        "ici_bytes_per_hop_hier": int(ici_hier),
        "dcn_bytes_per_hop_hier": int(dcn_hier),
        "dcn_saving_hier_vs_flat": round(
            1.0 - dcn_hier / dcn_flat, 4
        ) if dcn_flat else 0.0,
        "assumed_ici_gbps": ici_gbps,
        "assumed_dcn_gbps": dcn_gbps,
        "projected_efficiency_flat": round(eff(ici_flat, dcn_flat), 4),
        "projected_efficiency_hier": round(eff(ici_hier, dcn_hier), 4),
    }


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
    t0 = time.perf_counter()
    pgraph = partition_graph(graph, n_devices)
    halo = build_halo(pgraph)
    plan_build_s = time.perf_counter() - t0
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
        plan_build_s=plan_build_s,
    )
