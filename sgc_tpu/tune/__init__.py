"""Hyperparameter search over frozen propagated features.

Reference workflow (tuning.py:18-38): propagate ONCE, then TPE-search the
weight decay with 60 trials of cheap linear-head fits, pickling the best
value. hyperopt is not a baked dependency here, so tpe.py implements the
Tree-structured Parzen Estimator natively (same algorithm family, same
log-uniform search spaces); search.py wires it to the citation / text
training objectives.
"""

from sgc_tpu.tune.tpe import TPESampler, fmin  # noqa: F401
