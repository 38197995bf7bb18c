"""Distributed execution: device meshes, graph partitioning, sharded ops.

The reference is single-process / single-GPU (SURVEY.md §2.5: no NCCL/MPI
anywhere; the graph lives wholly on one device, reference utils.py:84).
This package is the scaling layer the reference never had, built the TPU
way: a `jax.sharding.Mesh`, `shard_map`-expressed SPMD programs, and XLA
collectives over ICI.

  mesh.py       — mesh construction (("nodes", "feat") axes) for 1..N chips
  partition.py  — row-block edge partitioning of a SparseGraph (the GNN
                  analog of sequence parallelism: nodes are the long axis)
  spmm.py       — sharded SpMM: per-device row-segment SpMM fed by an
                  all-gather / halo exchange of column features over ICI
  train.py      — full sharded SGC training step (graph-partitioned
                  propagation + tensor-parallel linear head + data-parallel
                  gradient psum)
  halo.py       — boundary-feature all_to_all exchange plan + fused hop
  debug.py      — checksum exchange validation (race-detector analog),
                  fault injection, determinism assertions
  scaling.py    — jax.distributed bring-up, edges/s scaling-efficiency
                  harness (1 dev vs n-dev mesh)
  distributed.py— multi-process (DCN) host↔mesh data movement:
                  put_global / fetch_global hide the single- vs
                  multi-process placement difference
"""

from sgc_tpu.parallel.mesh import make_mesh  # noqa: F401
from sgc_tpu.parallel.partition import PartitionedGraph, partition_graph  # noqa: F401
from sgc_tpu.parallel.spmm import spmm_sharded  # noqa: F401
from sgc_tpu.parallel.halo import build_halo  # noqa: F401
from sgc_tpu.parallel.debug import assert_deterministic, validate_exchange  # noqa: F401
from sgc_tpu.parallel.scaling import (  # noqa: F401
    init_distributed,
    measure_spmm_scaling,
)
from sgc_tpu.parallel.distributed import (  # noqa: F401
    fetch_global,
    put_global,
)
