"""Experiment: Newton-class (Böhning MM) trainer vs torch-parity LBFGS
for the SGC linear head (VERDICT round-3 #3).

The reference contract is the END METRIC (reddit.py:66-72 micro-F1),
not the optimizer. LBFGS (2 epochs = 40 sequential iterations) is the
largest single slice of the round-3 headline (~105 of 265 ms, DESIGN
§2f) and the iteration count is an optimizer property, not a hardware
floor. Full-batch multinomial logistic regression is smooth + convex:
the Böhning (1992) minorize-maximize bound H <= 1/2 I_C (x) Z'Z/n + wd I
gives a fixed preconditioner — ONE (F+1)^2 Cholesky, then each
iteration is two big MXU matmuls + a batched line search. This script
measures iterations-to-parity on the bench synthetic.

Usage: python scripts/exp_newton_head.py [scale]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    from sgc_tpu.data.synthetic import synthetic_reddit_clustered
    from sgc_tpu.graph.locality import LocalityPlan
    from sgc_tpu.models.sgc import init_sgc, sgc_apply
    from sgc_tpu.train.loops import _lbfgs_linear_fit

    graph, features, labels, idx_train = synthetic_reddit_clustered(
        scale, shuffle=True, device=False)
    plan = LocalityPlan.build(graph, features, labels, idx_train,
                              formulation="blockdense", calibrate=False)
    tr = np.asarray(plan.propagate_train(degree=2))
    y = np.asarray(plan.labels)[np.asarray(plan.idx_train)]
    n, F = tr.shape
    C = int(y.max()) + 1
    print(f"n={n} F={F} C={C}")

    params0 = init_sgc(jax.random.PRNGKey(42), F, C, bias=True)
    wd = jnp.asarray(0.0, jnp.float32)
    cw = jnp.ones((C,), jnp.float32)
    yj = jnp.asarray(y)
    trj = jnp.asarray(tr)

    t0 = time.perf_counter()
    p_lb, loss_lb = _lbfgs_linear_fit(
        params0, trj, yj, wd, cw, 2, False, False, 1.0)
    loss_lb.block_until_ready()
    t_lb = time.perf_counter() - t0
    logits = sgc_apply(p_lb, trj)
    acc_lb = float((jnp.argmax(logits, 1) == yj).mean())
    print(f"LBFGS 2 epochs (40 iters): loss {float(loss_lb):.6f} "
          f"train-acc {acc_lb:.4f}  [{t_lb:.1f}s incl compile]")

    # ---- Böhning MM with batched line search -------------------------
    Z = jnp.concatenate([trj, jnp.ones((n, 1), jnp.float32)], axis=1)
    A = (Z.T @ Z) / n                     # (F+1, F+1)
    ridge = 1e-6 * jnp.trace(A) / (F + 1)
    from jax.scipy.linalg import cho_factor, cho_solve

    cf_ = cho_factor(A / 2 + (ridge + 0.0) * jnp.eye(F + 1))
    Y1 = jax.nn.one_hot(yj, C)
    ts = jnp.asarray([0.5, 1.0, 1.5, 2.0, 3.0], jnp.float32)

    def ce(logits):
        return -jnp.mean(
            jnp.take_along_axis(jax.nn.log_softmax(logits), yj[:, None],
                                axis=1))

    @jax.jit
    def step2(theta):
        logits = Z @ theta
        P = jax.nn.softmax(logits)
        G = Z.T @ (P - Y1) / n
        D = cho_solve(cf_, G)
        ZD = Z @ D
        losses = jax.vmap(lambda t: ce(logits - t * ZD))(ts)
        best = jnp.argmin(losses)
        return theta - ts[best] * D, losses[best]

    theta = jnp.zeros((F + 1, C), jnp.float32)
    for it in range(1, 21):
        theta, loss = step2(theta)
        if it % 1 == 0:
            logits = Z @ theta
            acc = float((jnp.argmax(logits, 1) == yj).mean())
            print(f"newton iter {it:2d}: loss {float(loss):.6f} "
                  f"acc {acc:.4f}"
                  + ("  <= LBFGS" if float(loss) <= float(loss_lb) else ""))
        if float(loss) <= float(loss_lb) and acc >= acc_lb:
            print(f"parity at iter {it}")
            break


if __name__ == "__main__":
    main()
