"""Model registry.

Parity: reference models.py:59-72 ``get_model`` — but returns
(init_fn, apply_fn) pairs in the functional style rather than stateful
modules. Init/apply signatures:

  SGC:  init(key, nfeat, nclass, **kw) -> SGCParams;  apply(params, x)
  GCN:  init(key, nfeat, nhid, nclass) -> GCNParams;  apply(params, x, graph)
"""

from __future__ import annotations

from sgc_tpu.models.gcn import gcn_apply, init_gcn
from sgc_tpu.models.sgc import init_sgc, sgc_apply

_MODELS = {
    "SGC": (init_sgc, sgc_apply),
    "GCN": (init_gcn, gcn_apply),
}


def get_model(name: str):
    try:
        return _MODELS[name]
    except KeyError:
        raise NotImplementedError(
            f"model:{name} is not implemented! known: {sorted(_MODELS)}"
        ) from None


def register_model(name: str, init_fn, apply_fn) -> None:
    _MODELS[name] = (init_fn, apply_fn)
