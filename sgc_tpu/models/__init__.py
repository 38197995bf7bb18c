from sgc_tpu.models.sgc import SGCParams, init_sgc, sgc_apply
from sgc_tpu.models.gcn import GCNParams, init_gcn, gcn_apply
from sgc_tpu.models.registry import get_model, register_model

__all__ = [
    "SGCParams",
    "init_sgc",
    "sgc_apply",
    "GCNParams",
    "init_gcn",
    "gcn_apply",
    "get_model",
    "register_model",
]

from sgc_tpu.models.transformer import (  # noqa: F401
    TransformerConfig,
    TransformerParams,
    init_transformer,
    transformer_apply,
)

__all__ += [
    "TransformerConfig",
    "TransformerParams",
    "init_transformer",
    "transformer_apply",
]

from sgc_tpu.models.deep_gcn import (  # noqa: F401
    DeepGCNParams,
    deep_gcn_apply,
    init_deep_gcn,
    stage_layers,
)

__all__ += ["DeepGCNParams", "deep_gcn_apply", "init_deep_gcn", "stage_layers"]

from sgc_tpu.models.gat import (  # noqa: F401
    GATLayerParams,
    gat_layer_apply,
    init_gat_layer,
    init_multi_head,
    multi_head_gat,
)

__all__ += [
    "GATLayerParams",
    "gat_layer_apply",
    "init_gat_layer",
    "init_multi_head",
    "multi_head_gat",
]
