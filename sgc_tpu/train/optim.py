"""Optimizers: torch-semantics Adam (via optax) and a JAX L-BFGS.

* ``torch_adam`` — matches ``torch.optim.Adam(params, lr, weight_decay)``
  as used by the citation trainer (reference citation.py:41-42): weight
  decay is classic L2 added to the gradient BEFORE the Adam moments (not
  decoupled AdamW), with bias correction.

* ``lbfgs_minimize`` — a jittable L-BFGS with the closure semantics of
  ``torch.optim.LBFGS`` (reference reddit.py:52, downstream/TextSGC/
  train.py:59): two-loop recursion over a circular (s, y) history, no line
  search (fixed step = lr, except the very first iteration which uses
  min(1, 1/||g||_1) * lr), gradient / parameter-change / loss-change
  tolerances. One call == ``epochs`` torch ``.step(closure)`` calls of
  ``max_iter`` iterations each with state carried across steps, which in
  torch is exactly ``epochs * max_iter`` iterations of the same loop.

  The whole optimization runs on device as a single ``lax.while_loop`` —
  no host round-trip per iteration (the reference pays a Python round-trip
  per closure evaluation).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


def torch_adam(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    # add_decayed_weights(0.0) is an exact no-op, so the chain shape stays
    # fixed — required for traced weight_decay (optax.inject_hyperparams)
    # and for opt-state surgery in parallel/train.py
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )


class _LBFGSState(NamedTuple):
    x: jnp.ndarray
    loss: jnp.ndarray
    grad: jnp.ndarray
    prev_flat_grad: jnp.ndarray
    d: jnp.ndarray            # last search direction
    t: jnp.ndarray            # last step size
    s_hist: jnp.ndarray       # [m, n]
    y_hist: jnp.ndarray       # [m, n]
    rho: jnp.ndarray          # [m]
    n_hist: jnp.ndarray       # number of stored pairs (<= m)
    head: jnp.ndarray         # circular insert position
    n_iter: jnp.ndarray
    done: jnp.ndarray


def lbfgs_minimize(
    loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    max_iter: int = 20,
    lr: float = 1.0,
    history_size: int = 100,
    tolerance_grad: float = 1e-7,
    tolerance_change: float = 1e-9,
):
    """Minimize ``loss_fn`` (flat-vector -> scalar) from ``x0``.

    Returns (x_final, loss_final, n_iterations_run).
    """
    n = x0.shape[0]
    m = history_size
    value_and_grad = jax.value_and_grad(loss_fn)

    def direction(state: _LBFGSState) -> jnp.ndarray:
        g = state.grad

        def two_loop(_):
            # Newest pair defines the initial Hessian scaling.
            newest = (state.head - 1) % m
            y_new = state.y_hist[newest]
            s_new = state.s_hist[newest]
            h_diag = jnp.dot(y_new, s_new) / jnp.dot(y_new, y_new)

            def bwd(j, carry):
                q, alphas = carry
                idx = (state.head - 1 - j) % m
                valid = j < state.n_hist
                alpha = jnp.where(
                    valid, state.rho[idx] * jnp.dot(state.s_hist[idx], q), 0.0
                )
                q = q - alpha * state.y_hist[idx]
                return q, alphas.at[j].set(alpha)

            q, alphas = jax.lax.fori_loop(
                0, m, bwd, (g, jnp.zeros((m,), dtype=x0.dtype))
            )
            r = q * h_diag

            def fwd(j_rev, r):
                j = m - 1 - j_rev
                idx = (state.head - 1 - j) % m
                valid = j < state.n_hist
                beta = jnp.where(
                    valid, state.rho[idx] * jnp.dot(state.y_hist[idx], r), 0.0
                )
                return r + (alphas[j] - beta) * state.s_hist[idx]

            r = jax.lax.fori_loop(0, m, fwd, r)
            return -r

        return jax.lax.cond(
            state.n_hist > 0, two_loop, lambda _: -g, operand=None
        )

    def cond(state: _LBFGSState):
        return jnp.logical_and(state.n_iter < max_iter, ~state.done)

    def body(state: _LBFGSState) -> _LBFGSState:
        n_iter = state.n_iter + 1

        # --- history update from the previous accepted step -------------
        def push(_):
            y = state.grad - state.prev_flat_grad
            s = state.d * state.t
            ys = jnp.dot(y, s)

            def do_push(_):
                s_hist = state.s_hist.at[state.head].set(s)
                y_hist = state.y_hist.at[state.head].set(y)
                rho = state.rho.at[state.head].set(1.0 / ys)
                return (
                    s_hist,
                    y_hist,
                    rho,
                    jnp.minimum(state.n_hist + 1, m),
                    (state.head + 1) % m,
                )

            return jax.lax.cond(
                ys > 1e-10,
                do_push,
                lambda _: (
                    state.s_hist,
                    state.y_hist,
                    state.rho,
                    state.n_hist,
                    state.head,
                ),
                operand=None,
            )

        s_hist, y_hist, rho, n_hist, head = jax.lax.cond(
            n_iter > 1,
            push,
            lambda _: (
                state.s_hist,
                state.y_hist,
                state.rho,
                state.n_hist,
                state.head,
            ),
            operand=None,
        )
        hist_state = state._replace(
            s_hist=s_hist, y_hist=y_hist, rho=rho, n_hist=n_hist, head=head
        )

        d = direction(hist_state)
        t = jnp.where(
            n_iter == 1,
            jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(state.grad))) * lr,
            jnp.asarray(lr, dtype=x0.dtype),
        )

        x_new = state.x + t * d
        loss_new, grad_new = value_and_grad(x_new)

        done = jnp.max(jnp.abs(grad_new)) <= tolerance_grad
        done |= jnp.max(jnp.abs(t * d)) <= tolerance_change
        done |= jnp.abs(loss_new - state.loss) < tolerance_change
        done |= ~jnp.isfinite(loss_new)

        return _LBFGSState(
            x=x_new,
            loss=loss_new,
            grad=grad_new,
            prev_flat_grad=state.grad,
            d=d,
            t=t,
            s_hist=s_hist,
            y_hist=y_hist,
            rho=rho,
            n_hist=n_hist,
            head=head,
            n_iter=n_iter,
            done=done,
        )

    loss0, grad0 = value_and_grad(x0)
    init = _LBFGSState(
        x=x0,
        loss=loss0,
        grad=grad0,
        prev_flat_grad=grad0,
        d=jnp.zeros_like(x0),
        t=jnp.asarray(0.0, dtype=x0.dtype),
        s_hist=jnp.zeros((m, n), dtype=x0.dtype),
        y_hist=jnp.zeros((m, n), dtype=x0.dtype),
        rho=jnp.zeros((m,), dtype=x0.dtype),
        n_hist=jnp.asarray(0, dtype=jnp.int32),
        head=jnp.asarray(0, dtype=jnp.int32),
        n_iter=jnp.asarray(0, dtype=jnp.int32),
        done=jnp.max(jnp.abs(grad0)) <= tolerance_grad,
    )
    final = jax.lax.while_loop(cond, body, init)
    return final.x, final.loss, final.n_iter


def newton_linear_fit(
    w0: jnp.ndarray,                  # [F, C] (C=1 for binary)
    b0: jnp.ndarray | None,           # [C] or None
    features: jnp.ndarray,            # [n, F]
    labels: jnp.ndarray,              # int[n] (binary: {0,1})
    weight_decay: jnp.ndarray,
    sample_weights: jnp.ndarray | None = None,   # [n] (class weighting)
    steps: int = 8,
    binary: bool = False,
):
    """Accelerated Böhning/MM Newton-class fit of a linear softmax (or
    sigmoid) head — the MXU-native replacement for the sequential LBFGS
    chain on full-batch logistic regression (VERDICT round-3 #3).

    The reference contract is the end metric (reddit.py:66-72 micro-F1),
    not the optimizer; torch-parity LBFGS (``lbfgs_minimize``) stays as
    the oracle path. This trainer exploits what LBFGS cannot: the
    multinomial-logistic Hessian admits the FIXED upper bound
    ``H <= 1/2 I_C (x) Z'Z/n + wd I`` (Böhning 1992; 1/4 for sigmoid),
    so ONE (F+1)^2 Cholesky yields a constant preconditioner and each
    iteration is three large MXU matmuls: logits ``Z v``, gradient
    ``Z'(P-Y)/n``, and the search direction's image ``Z D`` for a
    BATCHED exact-on-a-grid line search (the bound is loose on real
    data — measured best step ~8x the unit MM step). Nesterov momentum
    in the preconditioned metric gives the accelerated O(1/k^2) rate:
    measured loss-parity with 40 LBFGS iterations in 3-6 steps on the
    bench problem (scripts/exp_newton_head.py).

    Returns ``(w, b, loss)`` — ``b`` is None iff ``b0`` is None. The
    loss includes the ``0.5 * wd * ||W||^2`` term, matching
    ``train/loops.py`` losses (reference train.py:68 manual L2).
    """
    n, F = features.shape
    C = w0.shape[1]
    has_bias = b0 is not None
    f32 = jnp.float32

    if has_bias:
        Z = jnp.concatenate([features, jnp.ones((n, 1), f32)], axis=1)
        theta0 = jnp.concatenate([w0, b0[None, :]], axis=0)
    else:
        Z = features
        theta0 = w0
    d = Z.shape[1]

    sw = (jnp.ones((n,), f32) if sample_weights is None
          else sample_weights.astype(f32))
    sw_sum = jnp.sum(sw)
    # curvature bound: softmax 1/2, sigmoid 1/4 (Böhning)
    curv = 0.25 if binary else 0.5
    A = (Z.T @ (Z * sw[:, None])) / sw_sum
    # wd penalizes W only; the bias diagonal keeps a small ridge so the
    # factor stays SPD when wd == 0
    ridge = 1e-6 * jnp.trace(A) / d
    diag = jnp.full((d,), ridge) + weight_decay
    if has_bias:
        diag = diag.at[-1].set(ridge)
    from jax.scipy.linalg import cho_factor, cho_solve

    factor = cho_factor(curv * A + jnp.diag(diag))

    if binary:
        y = labels.astype(f32)[:, None]                     # [n, 1]
    else:
        y = jax.nn.one_hot(labels, C, dtype=f32)            # [n, C]

    def loss_of(logits, w):
        l2 = 0.5 * weight_decay * jnp.sum(w**2)
        if binary:
            ll = jax.nn.log_sigmoid(logits) * y + jax.nn.log_sigmoid(
                -logits) * (1.0 - y)
            return -jnp.sum(sw[:, None] * ll) / sw_sum + l2
        lp = jax.nn.log_softmax(logits)
        return -jnp.sum(sw * jnp.sum(lp * y, axis=1)) / sw_sum + l2

    def probs(logits):
        return jax.nn.sigmoid(logits) if binary else jax.nn.softmax(logits)

    # line-search grid: t=0 keeps the momentum point (never worse than
    # it); large t exploits the bound's looseness on real data
    ts = jnp.asarray([0.0, 0.25, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0], f32)

    def w_of(theta):
        return theta[:-1] if has_bias else theta

    def step(carry, k):
        theta, theta_prev = carry
        mom = (k - 1.0) / (k + 2.0)
        v = theta + mom * (theta - theta_prev)
        logits = Z @ v
        G = Z.T @ ((probs(logits) - y) * sw[:, None]) / sw_sum
        if has_bias:
            G = jnp.concatenate(
                [G[:-1] + weight_decay * w_of(v), G[-1:]], axis=0)
        else:
            G = G + weight_decay * v
        D = cho_solve(factor, G)
        ZD = Z @ D
        losses = jax.vmap(
            lambda t: loss_of(logits - t * ZD, w_of(v) - t * w_of(D)))(ts)
        best = jnp.argmin(losses)
        return (v - ts[best] * D, theta), losses[best]

    (theta, _), losses = jax.lax.scan(
        step, (theta0, theta0), jnp.arange(1, steps + 1, dtype=f32))
    w = w_of(theta)
    b = theta[-1] if has_bias else None
    return w, b, losses[-1]


def lbfgs_fit_pytree(
    loss_fn_pytree: Callable,
    params,
    epochs: int = 2,
    max_iter: int = 20,
    lr: float = 1.0,
    history_size: int = 100,
):
    """Convenience wrapper: L-BFGS over a params pytree.

    ``epochs`` torch ``.step()`` calls == ``epochs * max_iter`` iterations
    of the persistent-state loop (see module docstring).
    """
    # A history longer than the total iteration count is mathematically
    # inert (the circular buffer never fills past n_iter pairs) but the
    # two-loop recursion still scans all m slots per iteration; capping
    # m at the iteration count is an exact, free speedup.
    history_size = min(history_size, epochs * max_iter)
    flat0, unravel = ravel_pytree(params)

    def flat_loss(flat):
        return loss_fn_pytree(unravel(flat))

    x, loss, n_iter = lbfgs_minimize(
        flat_loss,
        flat0,
        max_iter=epochs * max_iter,
        lr=lr,
        history_size=history_size,
    )
    return unravel(x), loss, n_iter
