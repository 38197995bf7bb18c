"""Planted-label learnability + newton-vs-LBFGS parity on the bench's
synthetic clustered graph (VERDICT round-4 #3).

The bench's ``train_parity`` gate used to run on uncorrelated labels, so
both trainers sat at chance and a broken trainer would have passed. The
clustered synthetic now plants labels (community -> class + 10% noise,
class-mean feature component — data/synthetic.py); this test enforces,
at CI scale, the same properties the bench gate reports at full scale:
both trainers land far above chance AND agree with each other.

Reference contract: reddit.py:51-64 (LBFGS head on S^2 X features).
"""

import numpy as np

import jax
import jax.numpy as jnp

from sgc_tpu.data.synthetic import synthetic_reddit_clustered
from sgc_tpu.models.sgc import init_sgc, sgc_apply
from sgc_tpu.ops.spmm import spmm
from sgc_tpu.train.loops import _lbfgs_linear_fit, _newton_linear_fit


def _setup(scale=0.02, seed=42):
    graph, x, labels, idx_train = synthetic_reddit_clustered(
        scale, seed=seed, shuffle=True, device=False)
    x = jnp.asarray(x)
    for _ in range(2):
        x = spmm(graph, x, impl="segment")
    tr = jnp.take(x, jnp.asarray(idx_train), axis=0)
    y = jnp.asarray(labels[idx_train])
    n_classes = int(labels.max()) + 1
    params0 = init_sgc(jax.random.PRNGKey(42), tr.shape[1], n_classes,
                       bias=True)
    # nonzero weight decay: at CI scale (3k train rows < 602*41 head
    # params) the planted problem is linearly separable and the wd=0
    # optimum sits at infinity — parity between two optimizers is only
    # well-defined on a strongly convex objective. Full bench scale
    # (152k rows, 10% label noise) is non-separable, so the bench gate
    # keeps the reference's wd.
    wd = jnp.asarray(1e-4, jnp.float32)
    cw = jnp.ones((n_classes,), jnp.float32)
    return tr, y, params0, wd, cw, n_classes


def test_planted_labels_learnable_and_trainers_agree():
    tr, y, params0, wd, cw, n_classes = _setup()
    chance = 1.0 / n_classes

    # converged-regime comparison (newton 64 steps / lbfgs 16 epochs):
    # at CI scale the ill-conditioned tail of the objective needs more
    # iterations than the full-scale bench settings (8 / 2) — parity is
    # a statement about the shared optimum, not the iteration budget
    p_n, loss_n = _newton_linear_fit(params0, tr, y, wd, cw, 64, False,
                                     False)
    p_l, loss_l = _lbfgs_linear_fit(params0, tr, y, wd, cw, 16, False,
                                    False, 1.0)

    def acc(p):
        return float((jnp.argmax(sgc_apply(p, tr), 1) == y).mean())

    acc_n, acc_l = acc(p_n), acc(p_l)
    # both trainers must be FAR above chance (planted labels: the 10%
    # flip noise caps train acc ~0.9; 5x chance = 0.12 is the bench
    # gate's bar, the margin here is much larger)
    assert acc_n >= 5 * chance, f"newton at {acc_n:.3f} (chance {chance:.3f})"
    assert acc_l >= 5 * chance, f"lbfgs at {acc_l:.3f} (chance {chance:.3f})"
    # and newton must not be WORSE than the LBFGS oracle (one-sided,
    # mirroring the bench gate: on this conditioning LBFGS's tail can
    # lag Newton's by a lot, and outperforming the oracle is not a
    # failure; a broken trainer fails the chance bar + dominance)
    assert acc_n >= acc_l - 0.02, (acc_n, acc_l)
    ln, ll = float(loss_n), float(loss_l)
    assert ln <= 1.05 * ll + 1e-6, (ln, ll)


def test_planted_labels_survive_shuffle():
    """The shuffled variant must be the same learning problem — planted
    structure rides the permutation (labels/features move together)."""
    gu, xu, lu, tu = synthetic_reddit_clustered(0.01, shuffle=False)
    gs, xs, ls, ts = synthetic_reddit_clustered(0.01, shuffle=True)
    # same label histogram, same class count
    np.testing.assert_array_equal(np.bincount(lu), np.bincount(ls))
    # labels far from uniform: planted community structure shows up as
    # blockiness in the UNSHUFFLED ordering (consecutive nodes share a
    # community, hence usually a class)
    same_neighbor = float((lu[1:] == lu[:-1]).mean())
    assert same_neighbor > 0.5, same_neighbor
