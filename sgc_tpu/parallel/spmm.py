"""Sharded SpMM: K-hop propagation over a ("nodes", "feat") mesh.

SPMD structure (per hop):
  1. Every "nodes" group owns a row block of S (its edge shard) and the
     matching row shard of X. SpMM is independent across feature columns,
     so the "feat" axis shards X's columns with zero communication.
  2. Source features are assembled with an all-gather over the "nodes"
     axis (XLA lowers this to ICI ring transfers); each device then runs
     its local gather -> scale -> sorted-segment-sum into its row block.
  3. Padding edges (val == 0) contribute nothing, so padded rows stay 0
     and repeated hops remain exact.

An all-gather moves N*F/pf bytes per hop per device. A halo exchange
(only boundary columns, via all_to_all) is the bandwidth-optimal variant
for well-partitioned graphs — see HaloExchange below, which precomputes
static per-peer column index sets so the exchange is a single all_to_all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from sgc_tpu.parallel.mesh import FEAT_AXIS, NODES_AXIS
from sgc_tpu.parallel.partition import PartitionedGraph


def _local_spmm(rows_local, cols, vals, x_full, rows_per_part,
                edge_chunk=None):
    """Row-segment SpMM of one edge shard against gathered features.

    ``edge_chunk`` bounds the [E, F] contribution transient at
    ``chunk x F`` via the edge-chunked scan (halo._chunked_segment_spmm)
    — the beyond-one-device memory control, honored on EVERY segment
    formulation branch (not just the overlapped-halo one)."""
    if edge_chunk:
        from sgc_tpu.parallel.halo import _chunked_segment_spmm

        return _chunked_segment_spmm(
            rows_local, cols, vals, x_full, rows_per_part, edge_chunk)
    contrib = jnp.take(x_full, cols, axis=0) * vals[:, None]
    return jax.ops.segment_sum(
        contrib, rows_local, num_segments=rows_per_part, indices_are_sorted=False
    )


def spmm_sharded(
    mesh, pgraph: PartitionedGraph, x: jnp.ndarray, halo=None,
    blockdense=None, precision: str = "bf16", form: str = "scan",
    interpret: bool = False, edge_chunk: int | None = None,
) -> jnp.ndarray:
    """One sharded SpMM hop: returns S @ x with the same sharding as x.

    Args:
      mesh:   ("nodes", "feat") Mesh.
      pgraph: row-block partitioned S; n_parts must equal the "nodes" axis.
      x:      float[N_pad, F] node features, N_pad = pgraph.n_rows_padded.
              Sharded (or shardable) as P("nodes", "feat").
      halo:   optional HaloDescriptor (parallel.halo.build_halo) — exchange
              only boundary rows via all_to_all instead of the full
              all-gather. Wins when halo_fraction(halo, pgraph) < 1.
      blockdense: optional ShardedBlockDense (parallel.blockdense) — run
              the per-chip hop through the block-dense formulation
              (dense-cell MXU matmuls + segment remainder, interior
              overlapped with the halo all_to_all). Supersedes ``halo``:
              the plan embeds its own exchange. ``precision`` controls
              the matmul cast ("bf16" default; "f32" for CPU-exact
              parity tests) and applies to the blockdense path only.
    """
    if pgraph.n_parts != mesh.shape[NODES_AXIS]:
        raise ValueError(
            f"graph has {pgraph.n_parts} parts, mesh nodes axis is "
            f"{mesh.shape[NODES_AXIS]}"
        )

    edge_spec = P(NODES_AXIS, None)

    if blockdense is not None:
        if edge_chunk:
            raise ValueError(
                "edge_chunk applies to the segment formulations; the "
                "block-dense formulation's dense term is already "
                "tile-bounded and its remainder is not chunked — use "
                "formulation='segment' for memory-bounded hops")
        from sgc_tpu.parallel.blockdense import (
            blockdense_exchange_and_spmm,
            blockdense_flat_args,
            blockdense_in_specs,
        )

        def body_bd(args, x_local):
            return blockdense_exchange_and_spmm(
                blockdense, tuple(a[0] for a in args), x_local,
                precision=precision, form=form, interpret=interpret,
            )

        fn = shard_map(
            body_bd,
            mesh=mesh,
            in_specs=(blockdense_in_specs(blockdense),
                      P(NODES_AXIS, FEAT_AXIS)),
            out_specs=P(NODES_AXIS, FEAT_AXIS),
            # the cell scan's zero-initialized carry is unvarying while
            # the body output varies over the mesh — same relaxation as
            # make_sharded_train_step
            check_vma=False,
        )
        return fn(blockdense_flat_args(blockdense), x)

    if halo is not None and halo.overlapped:
        from sgc_tpu.parallel.halo import exchange_and_spmm_overlapped

        def body_overlap(e_int, e_bnd, send_idx, x_local):
            return exchange_and_spmm_overlapped(
                tuple(a[0] for a in e_int), tuple(a[0] for a in e_bnd),
                send_idx[0], x_local, pgraph.rows_per_part,
                edge_chunk=edge_chunk,
            )

        e3 = (edge_spec, edge_spec, edge_spec)
        fn = shard_map(
            body_overlap,
            mesh=mesh,
            in_specs=(e3, e3, P(NODES_AXIS, None, None),
                      P(NODES_AXIS, FEAT_AXIS)),
            out_specs=P(NODES_AXIS, FEAT_AXIS),
            # the edge-chunked scan's zero-initialized carry is unvarying
            # while the body output varies over the mesh — same
            # relaxation as the blockdense path above
            check_vma=not edge_chunk,
        )
        return fn(halo.edges_int, halo.edges_bnd, halo.send_idx, x)

    if halo is not None:
        from sgc_tpu.parallel.halo import exchange_and_spmm

        def body_halo(rows_l, cols_h, vals, send_idx, x_local):
            return exchange_and_spmm(
                rows_l[0], cols_h[0], vals[0], send_idx[0],
                x_local, pgraph.rows_per_part, edge_chunk=edge_chunk,
            )

        fn = shard_map(
            body_halo,
            mesh=mesh,
            in_specs=(
                edge_spec, edge_spec, edge_spec,
                P(NODES_AXIS, None, None),
                P(NODES_AXIS, FEAT_AXIS),
            ),
            out_specs=P(NODES_AXIS, FEAT_AXIS),
            check_vma=not edge_chunk,   # chunked-scan carry (see above)
        )
        return fn(
            pgraph.rows_local, halo.cols_halo, pgraph.vals, halo.send_idx, x
        )

    def body(rows_l, cols, vals, x_local):
        # shapes: rows_l/cols/vals [1, E], x_local [R, F/pf]
        x_full = jax.lax.all_gather(x_local, NODES_AXIS, axis=0, tiled=True)
        return _local_spmm(
            rows_l[0], cols[0], vals[0], x_full, pgraph.rows_per_part,
            edge_chunk=edge_chunk,
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(edge_spec, edge_spec, edge_spec, P(NODES_AXIS, FEAT_AXIS)),
        out_specs=P(NODES_AXIS, FEAT_AXIS),
        check_vma=not edge_chunk,       # chunked-scan carry (see above)
    )
    return fn(pgraph.rows_local, pgraph.cols, pgraph.vals, x)


def _spmm_col_paneled(mesh, pgraph, xbox, col_chunk, **kw):
    """One sharded hop computed in feature-column panels of width
    ``col_chunk`` — the second beyond-one-device memory control.

    SpMM is exactly columnwise-independent, so each panel's reduction
    is bit-identical to the same columns of the unpaneled hop. The
    memory model (measured on the virtual mesh, DESIGN §staging): a
    full-width hop transiently holds ~4x the feature bytes beyond its
    input (scan carry double-buffer, per-step segment-sum outputs,
    shard output copies) — panel-width-scaled here. The full-width
    arrays alive at once are bounded at TWO: the input is consumed
    (``xbox`` is a one-element list, emptied on entry, and the local
    reference is dropped before assembly) and the output is a single
    concatenate of the finished panels, so peak ≈
    max(input + panels, panels + output) + 4x·(col_chunk/F).
    Eager-only (panels are host-loop scheduled); requires an unsharded
    feat axis (the beyond-device mesh is ("nodes", 1)).
    """
    if mesh.shape[FEAT_AXIS] != 1:
        raise ValueError(
            "col_chunk needs an unsharded 'feat' axis (panels would cut "
            "across the feature sharding); use a ('nodes', 1) mesh")
    x = xbox.pop()
    f = int(x.shape[1])
    spec = NamedSharding(mesh, P(NODES_AXIS, FEAT_AXIS))
    cut = jax.jit(
        lambda xx, c, w: jax.lax.dynamic_slice(
            xx, (0, c), (xx.shape[0], w)),
        static_argnums=(2,))
    from sgc_tpu.utils.profiling import sync

    panels = []
    for c0 in range(0, f, col_chunk):
        w = min(col_chunk, f - c0)
        panel = spmm_sharded(mesh, pgraph, cut(x, c0, w), **kw)
        # sequential panels: async dispatch would stack every panel's
        # transients, defeating the paneling (same rationale as
        # sync_each_hop below)
        sync(panel)
        panels.append(panel)
    del x                      # input dead before the output assembles
    out = jax.jit(
        lambda *ps: jnp.concatenate(ps, axis=1), out_shardings=spec,
    )(*panels)
    sync(out)
    return out


def propagate_sharded(
    mesh, pgraph: PartitionedGraph, x: jnp.ndarray, degree: int, halo=None,
    blockdense=None, precision: str = "bf16", form: str = "scan",
    interpret: bool = False, edge_chunk: int | None = None,
    sync_each_hop: bool = False, col_chunk: int | None = None,
) -> jnp.ndarray:
    """K sharded SpMM hops (x <- S @ x). Jit-compatible; degree is static.

    ``form="pallas"`` runs the per-chip dense-cell term through the
    streamed Pallas kernel (the single-chip headline kernel); ``"scan"``
    (default) is the portable einsum form — identical math.

    ``sync_each_hop`` (eager callers only; a no-op under tracing) blocks
    on each hop before dispatching the next: async dispatch keeps BOTH
    hops' transients live at once, which roughly doubles peak memory —
    measured 9.5 vs 4.8 GiB on the 600k x 512 beyond-device probe. The
    hops are sequential anyway, so the sync costs one dispatch latency
    per hop. ``edge_chunk`` bounds the per-hop [E, F] contribution
    transient (see ``halo._chunked_segment_spmm``); ``col_chunk``
    additionally runs each hop in feature-column panels so the
    remaining ~4x-feature-bytes hop transient scales with the panel
    width (``_spmm_col_paneled`` — eager segment-formulation only,
    bit-identical output).

    ``x`` may be passed as a ONE-ELEMENT LIST ``[x]`` to transfer
    ownership: the list is emptied immediately, so no caller frame
    keeps the hop-0 input (e.g. an 18 GiB staged store) alive through
    the later hops — a plain argument stays referenced by the caller's
    local until the call returns, which costs a full extra feature
    matrix at peak on beyond-one-device runs."""
    if isinstance(x, list):
        if len(x) != 1:
            raise ValueError("consume form takes a one-element list [x]")
        x = x.pop()              # caller's list no longer references it
    if col_chunk is not None:
        if blockdense is not None:
            raise ValueError(
                "col_chunk applies to the segment formulations (the "
                "blockdense plan is built for a fixed feature width)")
        if isinstance(x, jax.core.Tracer):
            raise ValueError(
                "col_chunk panels are host-scheduled — call eagerly, "
                "not under jit")
    for _ in range(degree):
        if col_chunk is not None and int(x.shape[1]) > col_chunk:
            # box-consume per hop: no frame keeps hop k's input alive
            # while hop k's output panels assemble
            box = [x]
            x = None
            x = _spmm_col_paneled(
                mesh, pgraph, box, col_chunk, halo=halo,
                precision=precision, form=form, interpret=interpret,
                edge_chunk=edge_chunk)
        else:
            x = spmm_sharded(mesh, pgraph, x, halo=halo,
                             blockdense=blockdense, precision=precision,
                             form=form, interpret=interpret,
                             edge_chunk=edge_chunk)
        if sync_each_hop and not isinstance(x, jax.core.Tracer):
            # profiling.sync, not block_until_ready: the tunneled axon
            # backend's block_until_ready can return EARLY (CLAUDE.md),
            # which would re-stack both hops' transients — the exact
            # condition this sync exists to prevent
            from sgc_tpu.utils.profiling import sync

            sync(x)
    return x


def shard_features(mesh, x: jnp.ndarray) -> jnp.ndarray:
    """Place a [N_pad, F] feature matrix with P("nodes", "feat") sharding.

    Multi-process safe: every process passes the same full host value and
    contributes only its local shards (see parallel/distributed.py).
    """
    from sgc_tpu.parallel.distributed import put_global

    return put_global(mesh, P(NODES_AXIS, FEAT_AXIS), x)
