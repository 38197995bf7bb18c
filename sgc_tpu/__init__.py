"""sgc_tpu — a TPU-native graph message-passing framework.

A from-scratch JAX / XLA / Pallas re-design of the SGC ("Simplifying Graph
Convolutional Networks") model family and its biomedical TextSGC extensions
(reference: bellaj09/SGC). The expensive graph work — K repeated SpMM hops
with the augmented-normalized adjacency — is expressed as jitted XLA programs
and Pallas TPU kernels over HBM-resident sorted-COO/CSR edge lists; training
is full-batch logistic regression on the propagated features.

Layering (bottom-up):
  graph/     sparse containers (sorted-COO / CSR pytrees), normalization
  ops/       SpMM / SDDMM kernels, K-hop propagation, feature scaling
  parallel/  device mesh, edge partitioning, halo exchange over ICI
  models/    SGC linear head, GCN, model registry
  train/     optimizers (Adam, LBFGS), training loops, metrics
  data/      Planetoid / Reddit / text-corpus loaders, cross-validation
  textgraph/ corpus cleaning, PMI/TF-IDF doc-word graph builders,
             word embeddings (pretrained extraction + JAX word2vec)
  tune/      TPE hyperparameter search over frozen propagated features
  serve/     production inference engine + HTTP endpoint
  native/    C++ host-side graph preprocessing (ctypes)
  cli/       entry points (citation, reddit, textsgc, tuning, crossval,
             build_graph, embedding, word2vec, sequence, sweep, devices)
"""

__version__ = "0.1.0"


def _install_hugealloc() -> None:
    """Back all large numpy allocations with MADV_HUGEPAGE mmaps.

    Installed at import so every host pipeline (reorder, from_coo sorts,
    synthetic generators, plan builds) is immune to the first-touch
    fault wall (docs/DESIGN.md §2e) without opting in per buffer.
    SGC_TPU_NO_HUGEALLOC=1 disables; failures (no compiler, exotic
    platform) silently fall back to the default allocator.
    """
    try:
        from sgc_tpu.native import hugealloc

        hugealloc.install()
    except Exception:
        pass


_install_hugealloc()

from sgc_tpu.graph.sparse import SparseGraph  # noqa: F401,E402
from sgc_tpu.ops.propagate import sgc_precompute  # noqa: F401
