"""High-level distributed training: one call from graph to fitted head.

Composes the pieces (mesh, partition, optional spectral reordering, halo
exchange, sharded precompute, SPMD train step) into the workflow a user
actually runs on a pod slice:

    params, report = fit_sharded(graph, X, y, idx_train, n_classes)

Follows the SGC factorization: propagation happens ONCE through the
halo-exchanged sharded SpMM, then every epoch is the tiny SPMD
linear-head step (degree=0) — the distributed mirror of the reference's
precompute-then-regress flow (reference citation.py:32,65).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.parallel.distributed import fetch_global, put_global
from sgc_tpu.parallel.halo import build_halo
from sgc_tpu.parallel.mesh import (
    FEAT_AXIS,
    NODES_AXIS,
    default_mesh_shape,
    make_mesh,
)
from sgc_tpu.parallel.partition import (
    pad_feature_dim,
    pad_node_rows,
    partition_graph,
)
from sgc_tpu.parallel.spmm import propagate_sharded, shard_features
from sgc_tpu.parallel.train import init_sharded_state, make_sharded_train_step


class _FitCheckpointer:
    """Sharded train-state checkpoints for :func:`fit_sharded`.

    State (params + Adam moments) goes through
    ``utils.checkpoint.save_sharded`` (orbax: device shardings
    preserved, per-host parallel writes). Crash-safety contract:

    * state goes to an EPOCH-TAGGED directory (``state_<epoch>``) and
      ``meta.json`` — written atomically (tmp + rename), by process 0
      only — names the epoch it belongs to; a preemption between the two
      writes leaves the PREVIOUS consistent (meta, state) pair in force.
    * ``fingerprint`` (run configuration + data identity) is stored in
      the meta and validated on restore — a changed run silently gets a
      fresh start instead of someone else's state (same rationale as
      utils.checkpoint.propagation_fingerprint).
    * any restore failure (partial state, garbled meta) degrades to
      "no checkpoint" with a warning, never a crash loop.
    """

    def __init__(self, directory, fingerprint: str):
        from pathlib import Path

        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.fingerprint = fingerprint

    def _is_proc0(self) -> bool:
        return jax.process_index() == 0

    def save(self, state, epoch: int, losses: list) -> None:
        import json

        from sgc_tpu.utils.checkpoint import save_sharded

        state_dir = self.dir / f"state_{epoch}"
        save_sharded(state_dir, state)   # all processes (orbax coordinates)
        if self._is_proc0():
            tmp = self.dir / "meta.json.tmp"
            tmp.write_text(json.dumps({
                "epoch": epoch, "losses": losses,
                "fingerprint": self.fingerprint,
            }))
            tmp.replace(self.dir / "meta.json")
            # old state dirs are garbage once meta points past them
            for p in self.dir.glob("state_*"):
                if p != state_dir:
                    import shutil

                    shutil.rmtree(p, ignore_errors=True)

    def restore(self, like):
        """(state, epoch, losses) from the latest CONSISTENT save, or
        None (missing, mismatched fingerprint, or unreadable)."""
        import json
        import warnings

        from sgc_tpu.utils.checkpoint import load_sharded

        meta_p = self.dir / "meta.json"
        if not meta_p.exists():
            return None
        try:
            meta = json.loads(meta_p.read_text())
            if meta.get("fingerprint") != self.fingerprint:
                warnings.warn(
                    f"{self.dir}: checkpoint belongs to a different run "
                    "(fingerprint mismatch) — starting fresh",
                    stacklevel=2)
                return None
            state = load_sharded(self.dir / f"state_{meta['epoch']}",
                                 like=like)
            return state, int(meta["epoch"]), list(meta["losses"])
        except Exception as exc:
            warnings.warn(
                f"{self.dir}: unreadable checkpoint "
                f"({type(exc).__name__}: {exc}) — starting fresh",
                stacklevel=2)
            return None


@dataclasses.dataclass
class FitReport:
    loss_history: list
    train_accuracy: float
    n_devices: int
    n_parts: int
    halo_fraction: float
    formulation: str = "segment"
    dense_fraction: float = 0.0


def fit_sharded(
    graph: SparseGraph,
    features: np.ndarray,
    labels: np.ndarray,
    idx_train: np.ndarray,
    n_classes: int,
    *,
    mesh=None,
    degree: int = 2,
    epochs: int = 100,
    lr: float = 0.2,
    weight_decay: float = 5e-6,
    seed: int = 42,
    use_halo: bool | None = True,
    reorder: str | None = None,
    formulation: str = "auto",
    row_block: int = 512,
    stripe: int = 512,
    checkpoint_dir: str | None = None,
    save_every: int = 25,
    edge_chunk: int | None = None,
    col_chunk: int | None = None,
    trainer: str = "adam",
    newton_steps: int = 8,
):
    """Distributed SGC fit. Returns (host SGCParams, FitReport).

    ``formulation`` picks the sharded propagation kernel:
    * ``auto`` (default) — block-dense when the halo exchange is chosen
      (the plan embeds its own all_to_all; its per-cell admission
      degrades gracefully to the segment math on structureless graphs),
      else the segment path.
    * ``blockdense`` — force the sharded block-dense formulation
      (parallel/blockdense.py: dense-cell MXU matmuls + segment
      remainder, interior overlapped with the halo exchange). Requires
      a halo plan; overrides ``use_halo=False``.
    * ``segment`` — the gather/segment-sum kernel (round-1 path).

    ``use_halo``: True = boundary all_to_all exchange, False = all-gather,
    None = auto — build the plan and pick halo when the halo fraction is
    below 0.5. Pure volume break-even is fraction 1.0 (P*H*F exchanged
    vs N*F gathered); the 0.5 threshold is a deliberate 2x margin for
    the halo path's extra costs (pack gathers, P-1 peer messages,
    max-width padding across pairs) — halo must clearly win on volume
    before it is chosen.

    ``reorder``: optional node ordering (any graph/reorder.py registry
    name, e.g. "lpa") applied BEFORE row-block partitioning — contiguous
    blocks then align with communities, shrinking the halo. Labels/
    features/idx_train travel with their nodes; the returned params are
    node-order-independent, so nothing needs restoring.

    ``trainer``: ``"adam"`` (default) mirrors the reference's Adam
    regression epochs (citation.py:41-42) as an SPMD step;
    ``"newton"`` runs the accelerated Böhning/MM fit
    (``train/optim.py::newton_linear_fit``) on the SHARDED features —
    the partitioner turns its Gram/gradient contractions into psums
    over the "nodes" axis and its Cholesky/solve replicate, so the
    same ~``newton_steps`` sequential MXU steps that replaced the
    LBFGS chain single-chip also train the distributed head. Epoch
    knobs (``epochs``/``lr``/``save_every``/``checkpoint_dir``) apply
    to the adam path only; a Newton fit is seconds of work with no
    optimizer state worth checkpointing.

    ``checkpoint_dir``: preemption-safe training — the sharded train
    state (params + Adam moments, device shardings preserved via orbax)
    is saved every ``save_every`` epochs and on completion; a rerun with
    the same directory resumes from the last saved epoch. Propagation is
    recomputed on resume (it is the deterministic one-time precompute —
    the SGC factorization means only the cheap head epochs replay).
    Full-batch training is deterministic, so an interrupted-and-resumed
    fit matches an uninterrupted one exactly.
    """
    from sgc_tpu.models.sgc import SGCParams
    from sgc_tpu.parallel.halo import halo_fraction

    from sgc_tpu.parallel.staging import is_provider, stage_rows

    staged = is_provider(features)
    if reorder is not None:
        if staged:
            raise ValueError(
                "reorder= needs to permute feature rows, which a staged "
                "row provider cannot do lazily — pre-permute the provider "
                "(compose it with the permutation) or pass an ndarray"
            )
        from sgc_tpu.graph.reorder import reorder_graph_arrays

        graph, features, labels, idx_train, _ = reorder_graph_arrays(
            graph, reorder, features, labels, idx_train)

    if mesh is None:
        n_nodes_parts, n_feat_parts = default_mesh_shape(
            len(jax.devices())
        )
        mesh = make_mesh(n_nodes_parts, n_feat_parts)
    n_parts = mesh.shape[NODES_AXIS]
    n_feat_parts = mesh.shape[FEAT_AXIS]

    if formulation not in ("auto", "blockdense", "segment"):
        raise ValueError(f"unknown formulation {formulation!r}")

    pgraph = partition_graph(graph, n_parts)
    # overlap=True: interior/boundary edge split so XLA hides the
    # all_to_all behind the interior segment-sum (halo.py). In auto
    # mode, size with a plain plan FIRST — building (and device-placing)
    # the split edge lists only to discard them above the 0.5 threshold
    # wastes GBs at scale. The blockdense formulation embeds its own
    # exchange, so it needs only the plain (non-overlapped) descriptor.
    if formulation == "blockdense":
        # the plan embeds its own exchange; only the plain descriptor is
        # needed (overrides use_halo=False — documented above)
        halo = build_halo(pgraph)
        frac = halo_fraction(halo, pgraph)
    else:
        sizing = None
        if use_halo is None:
            sizing = build_halo(pgraph)
            frac = halo_fraction(sizing, pgraph)
            want_halo = frac < 0.5
        else:
            want_halo = bool(use_halo)
            frac = None  # computed below once a plan exists
        if formulation == "auto":
            # edge_chunk/col_chunk are memory-bounded-hop requests —
            # only the segment formulation honors them (spmm_sharded /
            # propagate_sharded reject the combination explicitly), so
            # auto must not pick blockdense
            formulation = (
                "blockdense"
                if want_halo and not edge_chunk and not col_chunk
                else "segment")
        if not want_halo:
            halo = None
            if frac is None:   # use_halo=False: nothing was measured
                frac = 1.0
            # else: keep the MEASURED fraction so FitReport records why
            # the halo was rejected (auto mode)
        elif formulation == "blockdense":
            halo = sizing if sizing is not None else build_halo(pgraph)
        else:
            # memory-bounded hops (edge_chunk/col_chunk) take the PLAIN
            # exchange: the overlapped form materializes separate
            # interior and boundary full-width accumulators (an extra
            # ~2x row-block bytes per hop) and its overlap buys nothing
            # once the scan serializes the chunks — measured 3x faster
            # AND smaller on the beyond-device probe (DESIGN §staging)
            halo = build_halo(
                pgraph, overlap=not (edge_chunk or col_chunk))
        if frac is None:
            frac = halo_fraction(halo, pgraph)

    if staged:
        # per-shard host staging: the full [N, F] matrix never exists in
        # one buffer — each device's shard is materialized from the
        # provider and placed independently (parallel/staging.py; the
        # beyond-one-device path, VERDICT r3 #6)
        x = stage_rows(mesh, features, n_rows_padded=pgraph.n_rows_padded)
    else:
        x = jnp.asarray(np.asarray(features, np.float32))
        x = pad_feature_dim(x, 8 * n_feat_parts)
        x = pad_node_rows(x, pgraph.n_rows_padded)
        x = shard_features(mesh, x)

    blockdense = None
    dense_fraction = 0.0
    if formulation == "blockdense":
        from sgc_tpu.parallel.blockdense import build_sharded_blockdense

        blockdense = build_sharded_blockdense(
            pgraph, halo, int(x.shape[1]) // n_feat_parts,
            row_block=row_block, stripe=stripe)
        dense_fraction = blockdense.dense_fraction

    # one-time sharded propagation (halo-exchanged SpMM hops).
    # sync_each_hop: async hop dispatch doubles peak memory (both hops'
    # transients live at once) for no wall-clock win — the hops are
    # data-dependent. edge_chunk additionally bounds the per-hop
    # [E, F] contribution buffer for beyond-one-device graphs.
    # consume form: this frame must not keep the hop-0 input (at
    # beyond-device scale, the multi-GiB staged store) alive through
    # the later hops — the box is built FIRST and the local name
    # deleted before the call (an inline ``[x]`` would leave this
    # frame's ``x`` pinning the store until the call returns; measured
    # as exactly +1x features at the full-scale peak)
    xbox = [x]
    del x
    x = propagate_sharded(mesh, pgraph, xbox, degree, halo=halo,
                          blockdense=blockdense, edge_chunk=edge_chunk,
                          col_chunk=col_chunk, sync_each_hop=True)

    from sgc_tpu.parallel.train import place_node_targets

    y, m = place_node_targets(mesh, pgraph.n_rows_padded, labels, idx_train)

    if trainer not in ("adam", "newton"):
        raise ValueError(f"unknown trainer {trainer!r}")
    if trainer == "newton":
        if checkpoint_dir:
            raise ValueError(
                "checkpoint_dir applies to the adam epoch loop; the "
                "newton fit is a single short program")
        from functools import partial as _partial

        from sgc_tpu.train.optim import newton_linear_fit

        state = init_sharded_state(
            mesh, jax.random.PRNGKey(seed), int(x.shape[1]), n_classes,
            lr=lr, weight_decay=weight_decay,
        )
        fit_fn = jax.jit(_partial(
            newton_linear_fit, steps=newton_steps, binary=False))
        w_s, b_s, final_loss = fit_fn(
            state.params.w, state.params.b, x, y,
            jnp.asarray(weight_decay, jnp.float32), m)
        w = fetch_global(w_s)
        b = fetch_global(b_s)
        params = SGCParams(w=jnp.asarray(w), b=jnp.asarray(b))
        losses = [float(fetch_global(final_loss))]
        return _finish(mesh, pgraph, x, params, labels, idx_train,
                       losses, frac, formulation, dense_fraction)

    state = init_sharded_state(
        mesh, jax.random.PRNGKey(seed), int(x.shape[1]), n_classes,
        lr=lr, weight_decay=weight_decay,
    )
    step = make_sharded_train_step(
        mesh, pgraph, degree=0, lr=lr, weight_decay=weight_decay
    )

    start_epoch = 0
    host_losses: list = []           # floats for completed epochs
    ckpt = None
    if checkpoint_dir:
        # fingerprint ties the checkpoint to THIS run's configuration +
        # data identity: a changed run starts fresh instead of training
        # on someone else's state
        import hashlib

        fp = hashlib.sha256(repr((
            "fit_sharded_v1", graph.nnz, graph.n_rows,
            int(np.shape(features)[1]), n_classes, degree, lr,
            weight_decay, seed, formulation, n_parts, n_feat_parts,
            reorder, row_block, stripe, edge_chunk, col_chunk,
        )).encode()).hexdigest()[:16]
        ckpt = _FitCheckpointer(checkpoint_dir, fp)
        restored = ckpt.restore(state)
        if restored is not None:
            r_state, r_epoch, r_losses = restored
            if r_epoch <= epochs:
                state, start_epoch, host_losses = (
                    r_state, r_epoch, r_losses)
            else:
                import warnings

                warnings.warn(
                    f"{checkpoint_dir}: saved epoch {r_epoch} exceeds the "
                    f"requested {epochs} — ignoring the checkpoint",
                    stacklevel=2)

    pending = []                      # device losses since the last drain
    for i in range(start_epoch, epochs):
        state, loss = step(state, x, y, m)
        pending.append(loss)          # stay async: no per-epoch host sync
        drain = (i + 1) % 16 == 0 or i + 1 == epochs
        if ckpt is not None and (i + 1) % save_every == 0:
            drain = True
        if drain:
            # drain the dispatch queue every 16 epochs (unbounded async
            # depth floods XLA:CPU's in-process communicator — the
            # stuck-collective watchdog SIGABRTs the virtual mesh at
            # cora scale) and convert just the NEW slice to host floats
            # — each loss crosses the host boundary exactly once
            host_losses.extend(float(fetch_global(l)) for l in pending)
            pending = []
        if (ckpt is not None and (i + 1) % save_every == 0
                and i + 1 < epochs):
            ckpt.save(state, i + 1, host_losses)
    losses = host_losses
    if ckpt is not None:
        ckpt.save(state, epochs, losses)

    # pull params to host (replicate the TP-sharded W; collective when
    # the feat axis spans processes)
    w = fetch_global(state.params.w)
    b = fetch_global(state.params.b)
    params = SGCParams(w=jnp.asarray(w), b=jnp.asarray(b))
    return _finish(mesh, pgraph, x, params, labels, idx_train,
                   losses, frac, formulation, dense_fraction)


def _finish(mesh, pgraph, x, params, labels, idx_train, losses, frac,
            formulation, dense_fraction):
    """Shared fit_sharded tail: training accuracy + report."""
    # training accuracy from sharded features (jit auto-partitions)
    @jax.jit
    def logits_fn(x, w, b):
        return jnp.dot(x, w, preferred_element_type=jnp.float32) + b

    logits = fetch_global(logits_fn(x, params.w, params.b))
    preds = logits.argmax(axis=1)
    idx = np.asarray(idx_train)
    train_acc = float(
        (preds[idx] == np.asarray(labels, np.int32)[idx]).mean()
    )

    report = FitReport(
        loss_history=losses,
        train_accuracy=train_acc,
        n_devices=len(mesh.devices.ravel()),
        n_parts=mesh.shape[NODES_AXIS],
        halo_fraction=frac,
        formulation=formulation,
        dense_fraction=dense_fraction,
    )
    return params, report
