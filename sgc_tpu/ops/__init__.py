from sgc_tpu.ops.spmm import spmm
from sgc_tpu.ops.propagate import propagate, sgc_precompute
from sgc_tpu.ops.scaling import fit_minmax, apply_minmax

__all__ = ["spmm", "propagate", "sgc_precompute", "fit_minmax", "apply_minmax"]

from sgc_tpu.ops.sampling import (  # noqa: F401
    sample_neighbors,
    sampled_propagate,
    sampled_sgc_infer,
)

__all__ += ["sample_neighbors", "sampled_propagate", "sampled_sgc_infer"]

from sgc_tpu.ops.propagate import (  # noqa: F401
    fetch_propagator,
    propagate_appnp,
    propagate_ssgc,
)

__all__ += ["fetch_propagator", "propagate_appnp", "propagate_ssgc"]
