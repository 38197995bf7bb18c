"""Full-batch training / evaluation loops.

The SGC factorization means training never touches the graph: these loops
consume propagated features only. Parity targets:

* ``train_regression`` — reference citation.py:35-58: Adam (lr 0.2, L2
  weight decay), ``epochs`` full-batch cross-entropy steps on train rows.
  Here the epoch loop is a single ``lax.scan`` jitted program — zero host
  round-trips (the reference pays one per epoch).
* ``train_linear`` / ``eval_linear`` — downstream/TextSGC/train.py:52-100:
  L-BFGS with manual L2 ``0.5 * wd * ||W||^2``, binary (sigmoid + BCE) vs
  multiclass (log-softmax + NLL) criteria, optional inverse-frequency class
  weights (TextSGC_indexing/trainv2.py:74-82).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from time import perf_counter

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sgc_tpu.models.sgc import SGCParams, sgc_apply
from sgc_tpu.train.optim import lbfgs_fit_pytree, torch_adam


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  class_weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean softmax cross-entropy; torch-style weighted mean if weights given."""
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if class_weights is None:
        return losses.mean()
    w = class_weights[labels]
    return (losses * w).sum() / w.sum()


def binary_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean BCE on sigmoid(logits) vs float labels (numerically stable)."""
    logits = logits.squeeze()
    labels = labels.astype(logits.dtype)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


# no donation: the head params are tiny and donation would invalidate the
# caller's array (hyperopt trials legitimately reuse an init)
@partial(jax.jit, static_argnames=("epochs",))
def _adam_epochs(
    params: SGCParams,
    train_x: jnp.ndarray,
    train_y: jnp.ndarray,
    lr: jnp.ndarray,
    weight_decay: jnp.ndarray,
    epochs: int,
):
    # lr / weight_decay are TRACED (inject_hyperparams) so hyperparameter
    # sweeps (60-trial TPE, per-fold tuned wds) share ONE compiled program
    # instead of recompiling per value
    tx = optax.inject_hyperparams(torch_adam)(
        lr=lr, weight_decay=weight_decay
    )
    opt_state = tx.init(params)

    def loss_fn(p):
        return cross_entropy(sgc_apply(p, train_x), train_y)

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state), None, length=epochs)
    return params, losses


# AOT executable cache: .lower().compile() bypasses the jit cache, so
# without this every train_regression call recompiled the epoch scan
_ADAM_EXEC_CACHE: dict = {}


def _adam_executable(params, x, y, lr, wd, epochs):
    key = (
        tuple((l.shape, str(l.dtype)) for l in jax.tree.leaves(params)),
        x.shape, str(x.dtype), y.shape, str(y.dtype), epochs,
    )
    hit = _ADAM_EXEC_CACHE.get(key)
    if hit is None:
        hit = _adam_epochs.lower(params, x, y, lr, wd, epochs).compile()
        if len(_ADAM_EXEC_CACHE) > 32:
            _ADAM_EXEC_CACHE.pop(next(iter(_ADAM_EXEC_CACHE)))
        _ADAM_EXEC_CACHE[key] = hit
    return hit


@partial(jax.jit, static_argnames=("epochs",))
def _adam_epochs_many(params, train_x, train_y, lrs, wds, epochs):
    # vmap over the hyperparameter axis: params stacked on axis 0,
    # features/labels broadcast — W candidate heads train in ONE program
    return jax.vmap(
        _adam_epochs.__wrapped__, in_axes=(0, None, None, 0, 0, None)
    )(params, train_x, train_y, lrs, wds, epochs)


def train_regression_many(
    params: SGCParams,
    train_features: jnp.ndarray,
    train_labels: jnp.ndarray,
    weight_decays,
    epochs: int = 100,
    lr: float = 0.2,
):
    """Train one head PER weight decay simultaneously (vmap over the
    hyperparameter axis) — the TPU-native form of the reference's
    sequential tuning trials (tuning.py:26-33 trains 60 heads one after
    another on frozen features; here a candidate grid is a single
    batched program and the MXU sees one big matmul).

    ``params`` is a single init, replicated across candidates. Returns
    (stacked SGCParams with leading axis W, float32[W, epochs] losses,
    seconds).
    """
    wds = jnp.asarray(np.asarray(weight_decays, np.float32))
    n = wds.shape[0]
    lrs = jnp.full((n,), lr, jnp.float32)
    stacked = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (n,) + l.shape), params
    )
    from sgc_tpu.utils.profiling import sync

    _adam_epochs_many.lower(
        stacked, train_features, train_labels, lrs, wds, epochs
    ).compile()
    t = perf_counter()
    out, losses = _adam_epochs_many(
        stacked, train_features, train_labels, lrs, wds, epochs
    )
    sync(out)
    return out, losses, perf_counter() - t


def train_regression(
    params: SGCParams,
    train_features: jnp.ndarray,
    train_labels: jnp.ndarray,
    epochs: int = 100,
    weight_decay: float = 5e-6,
    lr: float = 0.2,
    writer=None,
):
    """Adam full-batch logistic regression. Returns (params, train_seconds).

    ``writer`` (utils.profiling.ScalarWriter) records the per-epoch train
    loss curve — the SummaryWriter contract of TextSGC_Bio/trainv2.py.
    """
    lr_arr = jnp.asarray(lr, jnp.float32)
    wd_arr = jnp.asarray(weight_decay, jnp.float32)
    compiled = _adam_executable(
        params, train_features, train_labels, lr_arr, wd_arr, epochs
    )
    from sgc_tpu.utils.profiling import sync

    t = perf_counter()
    params, losses = compiled(
        params, train_features, train_labels, lr_arr, wd_arr
    )
    sync(params)
    dt = perf_counter() - t
    if writer is not None:
        writer.scalars("train/loss", [float(l) for l in losses])
        writer.flush()
    return params, dt


@partial(
    jax.jit,
    static_argnames=("epochs", "binary", "weighted", "lr"),
)
def _lbfgs_linear_fit(
    params: SGCParams,
    train_features: jnp.ndarray,
    train_labels: jnp.ndarray,
    weight_decay: jnp.ndarray,
    class_weights: jnp.ndarray,
    epochs: int,
    binary: bool,
    weighted: bool,
    lr: float,
):
    def loss_fn(p: SGCParams):
        logits = sgc_apply(p, train_features)
        l2 = 0.5 * weight_decay * jnp.sum(p.w**2)
        if binary:
            if weighted:
                # per-sample weights from the class of each label —
                # same weighted-mean definition as the multiclass
                # branch and the newton trainer (which this function
                # is the parity oracle for)
                lg = logits.squeeze()
                y = train_labels.astype(lg.dtype)
                ll = (jnp.maximum(lg, 0) - lg * y
                      + jnp.log1p(jnp.exp(-jnp.abs(lg))))
                sw = class_weights[train_labels]
                return jnp.sum(sw * ll) / jnp.sum(sw) + l2
            return binary_cross_entropy(logits, train_labels) + l2
        cw = class_weights if weighted else None
        return cross_entropy(logits, train_labels, cw) + l2

    params, loss, _ = lbfgs_fit_pytree(loss_fn, params, epochs=epochs, lr=lr)
    return params, loss


@partial(jax.jit, static_argnames=("steps", "binary", "weighted"))
def _newton_linear_fit(
    params: SGCParams,
    train_features: jnp.ndarray,
    train_labels: jnp.ndarray,
    weight_decay: jnp.ndarray,
    class_weights: jnp.ndarray,
    steps: int,
    binary: bool,
    weighted: bool,
):
    """Accelerated Newton-class (Böhning MM) linear-head fit — the fast
    default for the full-batch head; LBFGS (`_lbfgs_linear_fit`) stays
    the torch-parity oracle (VERDICT round-3 #3). Same loss definition
    (weighted mean + 0.5*wd*||W||^2), same SGCParams in/out."""
    from sgc_tpu.train.optim import newton_linear_fit

    sw = class_weights[train_labels] if weighted else None
    w, b, loss = newton_linear_fit(
        params.w, params.b, train_features, train_labels, weight_decay,
        sample_weights=sw, steps=steps, binary=binary)
    return dataclasses.replace(params, w=w, b=b), loss


def train_linear(
    params: SGCParams,
    train_features: jnp.ndarray,
    train_labels: jnp.ndarray,
    weight_decay: float = 0.0,
    epochs: int = 3,
    binary: bool = False,
    class_weights: jnp.ndarray | None = None,
    lr: float = 1.0,
    trainer: str = "lbfgs",
    newton_steps: int = 8,
):
    """Linear-head fit with manual L2 on W. Returns (params, seconds).

    ``trainer="lbfgs"`` (default) is the torch-parity oracle path
    (reference train.py:59-73 closure semantics); ``"newton"`` runs the
    accelerated Böhning/MM fit (`train.optim.newton_linear_fit`) — same
    loss, ~3-6 sequential steps instead of epochs*20, the MXU-native
    choice for latency-critical fits.

    The whole optimization is one cached jitted program (keyed on shapes +
    static config), so repeated fits — hyperopt trials, cross-val folds,
    benchmark warm-up — pay compilation once.
    """
    weighted = class_weights is not None
    if class_weights is None:
        n_out = params.w.shape[1]
        class_weights = jnp.ones((n_out,), jnp.float32)
    wd = jnp.asarray(weight_decay, jnp.float32)
    if trainer not in ("lbfgs", "newton"):
        raise ValueError(f"unknown trainer {trainer!r}")
    t = perf_counter()
    if trainer == "newton":
        params, _ = _newton_linear_fit(
            params, train_features, train_labels, wd, class_weights,
            newton_steps, binary, weighted,
        )
    else:
        params, _ = _lbfgs_linear_fit(
            params, train_features, train_labels, wd, class_weights,
            epochs, binary, weighted, lr,
        )
    from sgc_tpu.utils.profiling import sync

    sync(params)
    return params, perf_counter() - t


def train_gcn(
    params,
    features: jnp.ndarray,
    graph,
    train_idx: jnp.ndarray,
    train_labels: jnp.ndarray,
    epochs: int = 100,
    weight_decay: float = 5e-6,
    lr: float = 0.01,
    dropout: float = 0.5,
    seed: int = 42,
):
    """Full-batch GCN training: Adam + CE on train rows, dropout per epoch.

    The graph propagation runs inside every step (GCN has no precompute
    factorization); the whole epoch loop is one jitted lax.scan program,
    cached module-level so repeated calls (folds, tuning trials) compile
    once per shape.
    """
    from sgc_tpu.utils.profiling import sync

    key = jax.random.PRNGKey(seed)
    t = perf_counter()
    params, losses = _gcn_fit(
        params, features, graph, train_idx, train_labels, key,
        jnp.asarray(lr, jnp.float32), jnp.asarray(weight_decay, jnp.float32),
        epochs, dropout,
    )
    sync(params)
    return params, perf_counter() - t


@partial(jax.jit, static_argnames=("epochs", "dropout"))
def _gcn_fit(params, features, graph, train_idx, train_labels, key,
             lr, weight_decay, epochs, dropout):
    from sgc_tpu.models.gcn import gcn_apply

    tx = optax.inject_hyperparams(torch_adam)(
        lr=lr, weight_decay=weight_decay
    )
    opt_state = tx.init(params)

    def loss_fn(p, dkey):
        logits = gcn_apply(
            p, features, graph, dropout_rate=dropout, dropout_key=dkey
        )
        return cross_entropy(logits[train_idx], train_labels)

    def step(carry, dkey):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, dkey)
        updates, s = tx.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    keys = jax.random.split(key, epochs)
    (params, _), losses = jax.lax.scan(step, (params, opt_state), keys)
    return params, losses


def eval_linear(
    params: SGCParams,
    features: jnp.ndarray,
    labels: jnp.ndarray,
    binary: bool = False,
) -> dict:
    """Loss + accuracy on a split. Parity: TextSGC train.py:80-100."""
    logits = sgc_apply(params, features)
    if binary:
        loss = binary_cross_entropy(logits, labels)
        preds = (jax.nn.sigmoid(logits.squeeze()) > 0.5).astype(labels.dtype)
    else:
        loss = cross_entropy(logits, labels)
        preds = jnp.argmax(logits, axis=1)
    acc = jnp.mean((preds == labels).astype(jnp.float32))
    return {"loss": float(loss), "accuracy": float(acc), "predictions": preds}
