"""Locality pipeline: discover community structure, then exploit it.

Real graphs arrive with arbitrary node ids, but their EDGES are usually
community-clustered (Reddit posts link via shared commenters inside a
subreddit; citation graphs cluster by field). On TPU that structure is
worth real money: once nodes are numbered community-contiguously, most
edges fall in dense diagonal cells of a (row_block, stripe) tiling, and
the hybrid SpMM (`ops/spmm_hybrid.py`) routes those cells to one-hot MXU
matmuls instead of the latency-bound XLA gather (measured on v5e at
Reddit scale: 63M edges/s hybrid vs the 34M edges/s gather wall —
docs/DESIGN.md §2d).

This module packages the whole preprocessing chain as one host-side step
(the TPU analog of the reference's scipy normalization prep,
reference utils.py:32-60):

    plan = LocalityPlan.build(graph, features, labels, idx_train)
    tr   = plan.propagate_train(degree=2)   # jit-compiled hybrid hops

* node reordering via :func:`sgc_tpu.graph.reorder.lpa_order` (community
  discovery; `ordering=` accepts any registered ordering),
* exact dead-row elimination for the final hop
  (:meth:`SparseGraph.row_subgraph` — the output rows are exactly
  ``idx_train``),
* cost-model MXU/XLA edge split per hop operator
  (:func:`sgc_tpu.ops.spmm_hybrid.split_dense_cells`).

Everything here is deterministic (seeded LPA, fixed reduction orders)
and permutation-exact: training on the reordered arrays is the same
problem, and `restore_rows` maps per-node results back to input ids.
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from sgc_tpu.graph.reorder import reorder_graph_arrays
from sgc_tpu.graph.sparse import SparseGraph


@dataclasses.dataclass(frozen=True)
class LocalityPlan:
    """Reordered graph + hybrid splits, ready for K-hop propagation."""

    graph: SparseGraph            # reordered, normalized operator
    graph_final: SparseGraph      # row-subset operator for the last hop
    features: np.ndarray          # reordered per-node arrays
    labels: np.ndarray
    idx_train: np.ndarray         # positions in the reordered numbering
    order: np.ndarray             # order[new_pos] = old id
    split_main: object            # HybridSplit / BlockDenseSplit (full hops)
    split_final: object           # same, for the train-row hop
    prep_seconds: dict            # per-stage host prep timing
    formulation: str = "blockdense"  # dense-cell compute form (see build)
    # jit-program + device-placement cache: hop programs are built ONCE
    # per (precision, interpret) and edge arrays placed ONCE per plan —
    # rebuilding jit closures per call would retrace/recompile every
    # propagate_* invocation (minutes over the tunneled backend)
    _cache: dict = dataclasses.field(
        default_factory=dict, repr=False, compare=False)

    @classmethod
    def build(
        cls,
        graph: SparseGraph,
        features: np.ndarray,
        labels: np.ndarray,
        idx_train: np.ndarray,
        ordering: str = "lpa",
        row_block: int = 512,
        stripe: int = 512,
        min_fill: float | None = None,
        formulation: str = "auto",
        calibrate: bool = False,
    ) -> "LocalityPlan":
        """Host-side, O(E log E); do once per graph, reuse across K/epochs.

        ``formulation`` picks the dense-cell compute form:
        * ``auto`` (default) — ``blockdense_pallas`` when the backend
          compiles scalar-prefetch index maps (a cached ~0.4 s probe,
          ``ops.spmm_pallas.scalar_prefetch_compiles``; measured 0.278 s
          vs 0.368 s full-scale clustered headline), else ``blockdense``.
        * ``blockdense`` — materialized bf16 cells as REAL MXU
          matmuls (ops/spmm_blockdense.py; ~2x the one-hot kernel at
          Reddit-scale cell densities, DESIGN §2e). ``min_fill`` is
          ignored (admission is the per-cell edge-count crossover).
        * ``blockdense_pallas`` — same split, computed by the streamed
          Pallas kernel (no HBM materialization of gathered stripes /
          out blocks) — requires a backend that compiles
          scalar-prefetch index maps.
        * ``onehot`` — the Pallas flat-schedule one-hot kernel
          (ops/spmm_hybrid.py); f32-storage exact, no cell byte budget.

        ``calibrate=True`` replaces the committed admission constants
        with rates measured on THIS backend (a cached ~1 s micro-probe,
        :func:`sgc_tpu.ops.calibrate.measured_rates`) — the blockdense
        per-cell crossover then reflects the actual machine.
        """
        from sgc_tpu.ops.spmm_blockdense import split_block_dense
        from sgc_tpu.ops.spmm_hybrid import split_dense_cells

        if formulation not in ("auto", "blockdense", "blockdense_pallas",
                               "onehot"):
            raise ValueError(f"unknown formulation {formulation!r}")
        if formulation == "auto":
            from sgc_tpu.ops.spmm_pallas import scalar_prefetch_compiles

            formulation = ("blockdense_pallas"
                           if scalar_prefetch_compiles() else "blockdense")
        if min_fill is not None and formulation.startswith("blockdense"):
            raise ValueError(
                "min_fill is the one-hot admission knob; blockdense "
                "admission is the per-cell edge-count crossover "
                "(min_edges_for) — pass formulation='onehot' to use "
                "min_fill")

        # shared recipe (graph/reorder.py): coo -> csr -> ordering ->
        # permute -> presorted HOST-RESIDENT graph (eager device
        # placement would round-trip the edge arrays over the tunneled
        # backend — ~10x slower build)
        t = {}
        # fault-wall guard (DESIGN §2e): on a fragmented machine,
        # first-touch faults run 27x slow for EVERY fresh allocation
        # below — probe, and trigger kernel compaction if degraded
        from sgc_tpu.utils.alloc import ensure_fault_rate, mem_counters

        t0 = time.perf_counter()
        probe = ensure_fault_rate()
        # the probe itself faults 256 MB and re-probes after compaction
        # — in the degraded state that is seconds, and it must not read
        # as unattributed build time (probe_s closes the stage-sum gap)
        t["probe_s"] = time.perf_counter() - t0
        t["fault_mrate_before"] = probe["rate_before"]
        t["fault_mrate_after"] = probe["rate_after"]
        # per-stage GROUND-TRUTH attribution: the 256 MB probe above is
        # size-dependent and can read healthy while a multi-GB stage
        # pays the wall (VERDICT round-4 #2) — record each stage's
        # actual minor-fault delta and RSS so a slow stage is
        # explainable from the JSON: stage wall ≈ minflt_m x us/fault
        # when fault-bound, and ≈ flat minflt when compute-bound.
        c0 = mem_counters()
        t["rss0_gb"] = round(c0["rss_gb"], 2)
        # (Measured and REJECTED: prewarming the split's cell buffer in
        # a background thread during ordering — the overlap hypothesis
        # fails on this 4-core box, fault handling starves the order
        # stage instead: order_s 7.5 -> 27.2 s A/B'd same-minute, net
        # prep 26 -> 44 s. DESIGN §2e round-4 revision.)
        t0 = time.perf_counter()
        graph_p, features_p, labels_p, idx_p, order = reorder_graph_arrays(
            graph, ordering, features, labels, idx_train)
        t["order_s"] = time.perf_counter() - t0
        t["apply_s"] = 0.0  # folded into order_s by the shared helper
        c1 = mem_counters()
        t["order_minflt_m"] = round(c1["minflt_m"] - c0["minflt_m"], 2)

        t0 = time.perf_counter()
        graph_final = graph_p.row_subgraph(idx_p)
        t["subgraph_s"] = time.perf_counter() - t0
        c2 = mem_counters()
        t["subgraph_minflt_m"] = round(c2["minflt_m"] - c1["minflt_m"], 2)

        t0 = time.perf_counter()
        nf = int(features_p.shape[1])
        if formulation.startswith("blockdense"):
            min_edges = None
            if calibrate:
                from sgc_tpu.ops.calibrate import measured_rates
                from sgc_tpu.ops.spmm_blockdense import min_edges_for

                rates = measured_rates()
                min_edges = min_edges_for(
                    row_block, stripe, nf,
                    eff_flops=rates["blockdense_eff_flops"],
                    xla_edges_per_s=rates["xla_edges_per_s"])
            # super-row cell order for the Pallas kernel: an 8-row-block
            # out panel resident in VMEM shares stripe loads across the
            # panel (5081 -> 1030 loads at the headline's dense frac)
            # — measured 46.5 -> 40.3 ms on the full-scale dense term,
            # same-session A/B (scripts/exp_super_rows.py; S=16
            # regresses, S=8 is the sweet spot). Scan form accepts
            # either order, so only the kernel schedule changes.
            superp = 8 if formulation == "blockdense_pallas" else None
            split_main = split_block_dense(
                graph_p, nf, row_block, stripe, min_edges=min_edges,
                super_rows=superp)
            split_final = split_block_dense(
                graph_final, nf, row_block, stripe, min_edges=min_edges,
                super_rows=superp)
        else:
            split_main = split_dense_cells(
                graph_p, nf, row_block, stripe, min_fill=min_fill)
            split_final = split_dense_cells(
                graph_final, nf, row_block, stripe, min_fill=min_fill)
        t["split_s"] = time.perf_counter() - t0
        c3 = mem_counters()
        t["split_minflt_m"] = round(c3["minflt_m"] - c2["minflt_m"], 2)
        t["split_rss_gb"] = round(c3["rss_gb"], 2)

        return cls(
            graph=graph_p, graph_final=graph_final, features=features_p,
            labels=labels_p, idx_train=idx_p, order=order,
            split_main=split_main, split_final=split_final, prep_seconds=t,
            formulation=formulation,
        )

    # ------------------------------------------------------------- compute

    @property
    def _blockdense(self) -> bool:
        return self.formulation.startswith("blockdense")

    def _device_args(self):
        """Edge arrays placed on device ONCE per plan (jit arguments, not
        HLO literals — the closure form bakes 100+ MB into the program
        at Reddit scale and trips remote-compile body limits)."""
        if "args" not in self._cache:
            if self._blockdense:
                from sgc_tpu.ops.spmm_blockdense import (
                    blockdense_device_args as dev_args)
            else:
                from sgc_tpu.ops.spmm_hybrid import (
                    hybrid_device_args as dev_args)
            self._cache["args"] = (dev_args(self.split_main),
                                   dev_args(self.split_final))
        return self._cache["args"]

    def _spmm_form(self, split, precision: str, interpret: bool | None):
        """(x, args) -> S@x for one split, under the plan's formulation."""
        if self.formulation == "blockdense_pallas":
            from sgc_tpu.ops.spmm_blockdense import spmm_blockdense_pallas

            return lambda x, a: spmm_blockdense_pallas(
                split, x, args=a, interpret=interpret,
                precision=precision if precision == "f32" else "bf16")
        if self._blockdense:
            from sgc_tpu.ops.spmm_blockdense import spmm_block_dense

            return lambda x, a: spmm_block_dense(
                split, x, args=a, precision=precision)
        from sgc_tpu.ops.spmm_hybrid import hybrid_bind, spmm_hybrid_split

        return lambda x, a: spmm_hybrid_split(
            hybrid_bind(split, a), x, interpret=interpret,
            precision=precision)

    def hop_fns(self, precision: str = "f32", interpret: bool | None = None):
        """(full_hop, final_hop) jit-compiled hybrid SpMM closures.

        Programs are cached per (precision, interpret) and edge data is
        device-resident via :meth:`_device_args`, so repeated calls reuse
        one compile and pay zero host->device transfer.
        """
        key = ("fns", precision, interpret)
        if key not in self._cache:
            full_p = jax.jit(
                self._spmm_form(self.split_main, precision, interpret))
            final_p = jax.jit(
                self._spmm_form(self.split_final, precision, interpret))
            args_main, args_final = self._device_args()
            self._cache[key] = (
                lambda x: full_p(x, args_main),
                lambda x: final_p(x, args_final),
            )
        return self._cache[key]

    def khop_traceable(
        self,
        degree: int = 2,
        precision: str = "f32",
        interpret: bool | None = None,
    ):
        """(traceable_fn, device_args) for one-program pipelines.

        ``traceable_fn(x, device_args)`` computes ``(S^degree X)[idx_train]``
        and may be called inside a caller's jit — e.g. fused with the
        training step so the whole timed region is ONE device dispatch.
        The edge data rides in ``device_args`` (jit-argument leaves, not
        HLO literals — see :func:`sgc_tpu.ops.spmm_hybrid.hybrid_device_args`),
        which keeps the compile unit small enough for remote-compile
        body limits and the persistent cache.
        """
        if degree < 1:
            raise ValueError("degree must be >= 1 (S^0 is a row gather)")
        device_args = self._device_args()
        full_f = self._spmm_form(self.split_main, precision, interpret)
        final_f = self._spmm_form(self.split_final, precision, interpret)

        def khop(x, args):
            main_args, final_args = args
            for _ in range(degree - 1):
                x = full_f(x, main_args)
            return final_f(x, final_args)

        return khop, device_args

    def propagate_train(
        self,
        degree: int = 2,
        features: jnp.ndarray | None = None,
        precision: str = "f32",
        interpret: bool | None = None,
    ) -> jnp.ndarray:
        """``(S^degree X)[idx_train]`` through the hybrid operators.

        The final hop runs the train-row subset operator (exact, same
        reduction order — `SparseGraph.row_subgraph`). Separate jit
        programs per hop keep each compile unit small (tunneled-backend
        compile-size limits; see docs/DESIGN.md §2d).
        """
        if degree < 1:
            raise ValueError("degree must be >= 1 (S^0 is a row gather)")
        full, final = self.hop_fns(precision=precision, interpret=interpret)
        x = jnp.asarray(features if features is not None else self.features)
        for _ in range(degree - 1):
            x = full(x)
        return final(x)

    def propagate_all(
        self,
        degree: int = 2,
        features: jnp.ndarray | None = None,
        precision: str = "f32",
        interpret: bool | None = None,
        restore: bool = True,
    ) -> jnp.ndarray:
        """``S^degree X`` for ALL rows through the hybrid full-hop
        operator — the eval-features form (reference reddit.py:43
        propagates the full graph for eval rows).

        With ``restore=True`` (default) rows come back in the ORIGINAL
        node numbering, so callers can mix this with un-reordered
        indices/labels transparently.
        """
        if degree < 1:
            raise ValueError("degree must be >= 1")
        full, _ = self.hop_fns(precision=precision, interpret=interpret)
        x = jnp.asarray(features if features is not None else self.features)
        for _ in range(degree):
            x = full(x)
        if restore:
            # x[p] holds node order[p]; out[old] = x[inv[old]]
            inv = np.empty(len(self.order), np.int64)
            inv[self.order] = np.arange(len(self.order))
            x = jnp.take(x, jnp.asarray(inv), axis=0)
        return x

    # --------------------------------------------------------------- utils

    def restore_rows(self, per_node: np.ndarray) -> np.ndarray:
        """Map a per-node array back to the ORIGINAL node numbering."""
        out = np.empty_like(per_node)
        out[self.order] = per_node
        return out

    @property
    def dense_fraction(self) -> float:
        return self.split_main.dense_edges / max(1, self.graph.nnz)
