"""Serving: production inference for trained SGC/GCN heads.

The reference is a research repo with no serving story; this package is
the deployment layer a production user needs (the build brief's
"large-scale production deployment and serving"):

  engine.py — InferenceEngine: jitted, shape-bucketed batch forward over
              precomputed features (transductive) or sampled
              neighborhoods (inductive, unseen nodes); donated buffers,
              warmup, per-request latency stats.
  http.py   — zero-dependency stdlib HTTP JSON endpoint around an engine.
"""

from sgc_tpu.serve.engine import InferenceEngine, EngineConfig  # noqa: F401
