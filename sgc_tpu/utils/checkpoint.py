"""Checkpoint / resume: propagated-feature shards and model params.

The reference's only checkpointing is pickled degree-2 feature dicts
(``--preprocessed``, downstream/TextSGC/train.py:29-30,107-112) and an
XLNet state_dict save (xlnet/xlnet.py:228-248). Here checkpointing is
first-class:

* ``save_features`` / ``load_features`` — propagated features (the
  expensive artifact; precompute-once / train-many workflows and the
  TextSGC --preprocessed path).
* ``PropagationCheckpointer`` — per-hop checkpointing of the K-hop
  propagation. The precompute is a deterministic pure function of
  (graph, X, K), so hop k's output is a complete restart point
  (SURVEY.md §5 failure-detection note).
* ``save_params`` / ``load_params`` — linear-head / GCN params.

Storage is orbax when importable (sharded-array aware, async-capable),
else numpy ``.npz``.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_array_dict(path: str | Path, arrays: dict) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # np.savez appends '.npz' itself when missing; normalize so save and
    # load agree for suffixless cache paths (--feat_cache feats.pkl)
    np.savez(_npz_path(path), **{k: np.asarray(v) for k, v in arrays.items()})


def load_array_dict(path: str | Path) -> dict:
    with np.load(_npz_path(Path(path))) as f:
        return {k: jnp.asarray(f[k]) for k in f.files}


def save_features(path: str | Path, feat_dict: dict) -> None:
    """Save a phase->features dict (TextSGC preprocessed format, npz)."""
    save_array_dict(path, feat_dict)


def load_features(path: str | Path) -> dict:
    return load_array_dict(path)


def _npz_path(path: Path) -> Path:
    # np.savez appends .npz itself; normalize so save/load agree for
    # suffixless paths
    return path if path.suffix == ".npz" else path.with_suffix(
        path.suffix + ".npz"
    )


def save_params(path: str | Path, params) -> None:
    """Save a params pytree (structure recorded alongside the leaves)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree.flatten(_to_host(params))
    np.savez(_npz_path(path), **{f"leaf_{i}": l for i, l in enumerate(leaves)})
    with open(path.with_suffix(".treedef"), "wb") as f:
        pickle.dump(treedef, f)


def load_params(path: str | Path, like=None):
    """Load a params pytree saved by :func:`save_params`.

    ``like`` — an example pytree with the expected structure (e.g. a
    freshly-initialized params object). When given, the tree structure is
    taken from ``like`` and the ``.treedef`` sidecar is never unpickled —
    use this form for artifacts from untrusted sources (unpickling the
    treedef executes arbitrary code; the npz leaves themselves are inert).
    """
    path = Path(path)
    with np.load(_npz_path(path)) as f:
        leaves = [jnp.asarray(f[f"leaf_{i}"]) for i in range(len(f.files))]
    if like is not None:
        treedef = jax.tree.structure(like)
        if treedef.num_leaves != len(leaves):
            raise ValueError(
                f"checkpoint has {len(leaves)} leaves but `like` structure "
                f"expects {treedef.num_leaves}"
            )
    else:
        with open(path.with_suffix(".treedef"), "rb") as f:
            treedef = pickle.load(f)
    return jax.tree.unflatten(treedef, leaves)


def propagation_fingerprint(graph, x, degree: int) -> str:
    """Content-aware restart key: shape metadata alone would silently
    restore hops computed under a different normalization or different
    features of the same shape."""
    import hashlib

    h = hashlib.sha1()
    h.update(np.asarray(
        [graph.n_rows, graph.n_cols, graph.nnz], np.int64
    ).tobytes())
    h.update(np.asarray(graph.rows)[: graph.nnz].tobytes())
    h.update(np.asarray(graph.vals)[: graph.nnz].tobytes())
    h.update(np.asarray(graph.cols)[: graph.nnz].tobytes())
    xs = np.asarray(x)
    h.update(np.asarray(
        [xs.shape[0], xs.shape[1]], np.int64
    ).tobytes())
    # cheap content digest of x (full hash of N*F floats can be hundreds
    # of MB; sums + corners catch normalization/feature swaps)
    h.update(np.asarray(
        [float(xs.sum()), float(np.abs(xs).sum()),
         float(xs[0].sum()), float(xs[-1].sum())], np.float64
    ).tobytes())
    return f"k{degree}_{h.hexdigest()[:16]}"


class PropagationCheckpointer:
    """Per-hop checkpoint/resume for K-hop propagation.

    Usage::

        ckpt = PropagationCheckpointer(dir, graph_fingerprint)
        x, start_hop = ckpt.restore(x0)
        for k in range(start_hop, K):
            x = spmm(graph, x)
            ckpt.save_hop(k, x)
    """

    def __init__(self, directory: str | Path, fingerprint: str):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.fingerprint = fingerprint
        self._meta_path = self.dir / "meta.json"

    def _load_meta(self) -> dict:
        # a half-written meta (crash mid-save) must read as "no
        # checkpoint", not crash the restart that resume exists for
        if self._meta_path.exists():
            try:
                with open(self._meta_path) as f:
                    return json.load(f)
            except (json.JSONDecodeError, OSError):
                return {}
        return {}

    def save_hop(self, hop: int, x: jnp.ndarray) -> None:
        save_array_dict(self.dir / f"hop_{hop}.npz", {"x": x})
        # atomic meta update, then drop the superseded hop (only the last
        # completed hop is ever restored; at Reddit scale each is ~0.5 GB)
        import os

        tmp = self._meta_path.with_suffix(".json.tmp")
        with open(tmp, "w") as f:
            json.dump({"fingerprint": self.fingerprint, "last_hop": hop}, f)
        os.replace(tmp, self._meta_path)
        prev = self.dir / f"hop_{hop - 1}.npz"
        if hop > 0 and prev.exists():
            prev.unlink()

    def restore(self, x0: jnp.ndarray) -> tuple[jnp.ndarray, int]:
        """Return (features, next_hop_index); (x0, 0) when no checkpoint."""
        meta = self._load_meta()
        if meta.get("fingerprint") != self.fingerprint:
            return x0, 0
        hop = int(meta["last_hop"])
        path = self.dir / f"hop_{hop}.npz"
        if not path.exists():
            return x0, 0
        return load_array_dict(path)["x"], hop + 1


def propagate_with_checkpoints(
    x: jnp.ndarray,
    graph,
    degree: int,
    checkpoint_dir: str | Path | None = None,
    impl: str = "auto",
):
    """K-hop propagation, restartable from the last completed hop."""
    from sgc_tpu.ops.spmm import spmm

    start = 0
    ckpt = None
    if checkpoint_dir is not None:
        ckpt = PropagationCheckpointer(
            checkpoint_dir, propagation_fingerprint(graph, x, degree)
        )
        x, start = ckpt.restore(x)
    for k in range(start, degree):
        x = spmm(graph, x, impl=impl)
        if ckpt is not None:
            x.block_until_ready()
            ckpt.save_hop(k, x)
    return x


# ---------------------------------------------------------------------------
# Sharded-state checkpointing (orbax)
# ---------------------------------------------------------------------------


def orbax_available() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except Exception:
        return False


def save_sharded(path: str | Path, tree) -> None:
    """Checkpoint a pytree of (possibly sharded) jax arrays via orbax.

    Unlike ``save_params`` (host numpy + npz), this preserves device
    sharding metadata and writes shards in parallel from each host — the
    path to use for pod-scale training state. Falls back to
    ``save_params`` when orbax is unavailable.
    """
    path = Path(path).resolve()
    if not orbax_available():
        save_params(path, tree)
        return
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_sharded(path: str | Path, like=None):
    """Restore a pytree saved by :func:`save_sharded`.

    ``like`` (a pytree of arrays or jax.ShapeDtypeStruct with shardings)
    restores directly onto the target mesh layout; None restores to host.
    """
    path = Path(path).resolve()
    if not orbax_available():
        return load_params(path)
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        return ckptr.restore(path, item=like)
