"""Serving CLI: load a trained head + features, expose the HTTP endpoint.

    # train and export artifacts first, e.g.:
    #   save_params("model.npz", params); np.save("feats.npy", feats)
    python -m sgc_tpu.cli.serve --params model.npz --features feats.npy \
        --port 8787

POST /predict {"node_ids": [..]} returns argmax classes; /healthz reports
latency stats. See sgc_tpu/serve/ for the engine details.
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--params", required=True,
                   help="save_params artifact (.npz + .treedef)")
    p.add_argument("--features", required=True,
                   help=".npy of precomputed S^K X features")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--max_batch", type=int, default=1024)
    a = p.parse_args()

    from sgc_tpu.serve import EngineConfig, InferenceEngine
    from sgc_tpu.serve.http import serve
    from sgc_tpu.utils.checkpoint import load_params

    params = load_params(a.params)
    feats = np.load(a.features)
    engine = InferenceEngine(
        params, features=feats, config=EngineConfig(max_batch=a.max_batch)
    )
    server = serve(engine, host=a.host, port=a.port)
    host, port = server.server_address[:2]
    print(f"serving {feats.shape[0]} nodes on http://{host}:{port} "
          f"(mode={engine._mode})", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
