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
