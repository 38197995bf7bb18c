"""Scaling-efficiency benchmark CLI (edges/s at 1..N devices).

The BASELINE north star requires edges/s scaling efficiency reported at
1 chip, 1 host, and N hosts. This CLI measures it on whatever devices are
visible — a real slice, or a virtual CPU mesh for pre-flight:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python -m sgc_tpu.cli.scaling --nodes 100000 --edges 2000000

Prints one line per device count (1, 2, 4, ... N): single-device rate,
sharded rate, parallel efficiency, halo fraction.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nodes", type=int, default=100_000)
    p.add_argument("--edges", type=int, default=2_000_000)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--hops", type=int, default=2)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--clustered", action="store_true",
                   help="block-clustered graph (halo exchange wins)")
    p.add_argument("--reorder", default="none",
                   choices=("none", "rcm", "bfs", "degree", "spectral"))
    p.add_argument("--json", action="store_true")
    p.add_argument("--hosts", type=int, default=1,
                   help="also print the two-level ICI+DCN comm model "
                        "for this many hosts")
    p.add_argument("--devices-per-host", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    a = p.parse_args()

    import jax
    import scipy.sparse as sp

    from sgc_tpu.graph.normalize import aug_normalized_adjacency
    from sgc_tpu.graph.reorder import apply_order, fetch_ordering
    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.parallel.scaling import measure_spmm_scaling

    rng = np.random.default_rng(a.seed)
    n, e = a.nodes, a.edges
    if a.clustered:
        # locality the row-block partitioner can exploit: blocks are
        # CONTIGUOUS node ranges (partition p owns rows [p*R, (p+1)*R)),
        # and 90% of edges stay within the source's range
        n_dev = len(jax.devices())
        block_size = -(-n // n_dev)
        src = rng.integers(0, n, e)
        same = rng.random(e) < 0.9
        block_start = (src // block_size) * block_size
        block_end = np.minimum(block_start + block_size, n)
        local = block_start + rng.integers(0, block_size, e) % (
            block_end - block_start
        )
        dst = np.where(same, local, rng.integers(0, n, e))
    else:
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
    adj = sp.coo_matrix(
        (np.ones(e, np.float32), (src, dst)), shape=(n, n)
    )
    adj = (adj + adj.T).tocsr()
    if a.reorder != "none":
        order = fetch_ordering(a.reorder)(adj)
        adj, = apply_order(adj, order)
    graph = SparseGraph.from_scipy(aug_normalized_adjacency(adj))
    x = rng.standard_normal((n, a.features)).astype(np.float32)

    n_total = len(jax.devices())
    counts = []
    d = 2
    while d < n_total:
        counts.append(d)
        d *= 2
    counts.append(n_total)
    from sgc_tpu.parallel.scaling import comm_model

    for nd in counts:
        rep = measure_spmm_scaling(
            graph, x, n_devices=nd, hops=a.hops, repeats=a.repeats
        )
        # sizing-only: measure_spmm_scaling already built the full plan
        # for the measured run; rebuilding it here would double the most
        # expensive host-side work per device count
        model = comm_model(graph, a.features, nd, rep.single_rate,
                           build_plan=False)
        if a.json:
            print(json.dumps({
                "devices": rep.n_devices,
                "single_edges_per_s": rep.single_rate,
                "sharded_edges_per_s": rep.sharded_rate,
                "efficiency": rep.efficiency,
                "halo_fraction": rep.halo_fraction,
                "plan_build_s": rep.plan_build_s,
                "comm_model": model,
            }))
        else:
            print(rep)
            print(
                "  comm model: halo {h} B/hop/chip (plan build {p}s), "
                "all-gather {a} B/hop/chip, projected eff @{ici:.0f}GB/s "
                "ICI: halo {eh:.0%} / all-gather {ea:.0%}".format(
                    h=model["ici_bytes_per_hop_halo"],
                    p=round(rep.plan_build_s, 2),
                    a=model["ici_bytes_per_hop_allgather"],
                    ici=model["assumed_ici_gbps"],
                    eh=model["projected_efficiency_halo"],
                    ea=model["projected_efficiency_allgather"],
                )
            )

    if a.hosts > 1:
        from sgc_tpu.parallel.scaling import comm_model_two_level

        # reuse the last measured single-device rate for t_local
        two = comm_model_two_level(
            graph, a.features, a.hosts, a.devices_per_host,
            rep.single_rate,
        )
        if a.json:
            print(json.dumps({"comm_model_two_level": two}))
        else:
            print(
                "two-level model ({H} hosts x {D} chips): per hop "
                "ICI {i} B/chip, DCN flat {df} B/host vs hierarchical "
                "{dh} B/host ({sv:.0%} DCN saving); projected eff "
                "flat {ef:.0%} / hier {eh:.0%} "
                "(@{ici:.0f} GB/s ICI, {dcn:.1f} GB/s DCN)".format(
                    H=two["hosts"], D=two["devices_per_host"],
                    i=two["ici_bytes_per_hop_hier"],
                    df=two["dcn_bytes_per_hop_flat"],
                    dh=two["dcn_bytes_per_hop_hier"],
                    sv=two["dcn_saving_hier_vs_flat"],
                    ef=two["projected_efficiency_flat"],
                    eh=two["projected_efficiency_hier"],
                    ici=two["assumed_ici_gbps"],
                    dcn=two["assumed_dcn_gbps"],
                )
            )


if __name__ == "__main__":
    main()
