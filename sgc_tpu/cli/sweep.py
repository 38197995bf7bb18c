"""Experiment sweep CLI: S^K / dataset grid with a results table.

Reproduces the reference README's results tables (README.md:29-34) as a
single command, and sweeps propagation depth K — the reference's central
hyperparameter (--degree) — reporting accuracy and the precompute/train
time split per cell.

    python -m sgc_tpu.cli.sweep --datasets cora citeseer --degrees 1 2 3

The precompute-once / train-many factorization means each added K costs
one extra SpMM hop on top of the previous depth's features: the sweep
reuses hops incrementally instead of recomputing from scratch.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from sgc_tpu.data.planetoid import load_citation
from sgc_tpu.models.sgc import init_sgc, sgc_apply
from sgc_tpu.ops.spmm import spmm
from sgc_tpu.train.loops import train_regression
from sgc_tpu.train.metrics import accuracy
from sgc_tpu.utils.config import load_tuned
from sgc_tpu.utils.seeding import set_seed


def sweep(
    datasets: list[str],
    degrees: list[int],
    epochs: int = 100,
    lr: float = 0.2,
    weight_decay: float | None = None,
    tuned: bool = True,
    seed: int = 42,
    data_path: str | None = None,
) -> list[dict]:
    rows = []
    for ds in datasets:
        key = set_seed(seed)
        data = load_citation(ds, data_path=data_path)
        wd = weight_decay
        if wd is None:
            tuned_cfg = load_tuned("citation", ds) if tuned else {}
            wd = tuned_cfg.get("weight_decay", 5e-6)

        from sgc_tpu.utils.profiling import sync

        hop = jax.jit(lambda x: spmm(data.graph, x, impl="segment"))
        x = data.features
        max_k = max(degrees)
        feats_at_k = {0: x}
        # warm-compile before the timer so per-hop timings exclude XLA
        # compile (same contract as sgc_precompute / structural features)
        hop.lower(x).compile()
        t0 = time.perf_counter()
        per_hop_t = {}
        for k in range(1, max_k + 1):
            x = hop(x)
            sync(x)   # block_until_ready can return early on this backend
            feats_at_k[k] = x
            per_hop_t[k] = time.perf_counter() - t0

        for k in sorted(degrees):
            feats = feats_at_k[k]
            params = init_sgc(key, feats.shape[1], data.n_classes)
            params, t_train = train_regression(
                params, feats[data.idx_train], data.labels[data.idx_train],
                epochs=epochs, weight_decay=wd, lr=lr,
            )
            logits = sgc_apply(params, jnp.asarray(feats))
            rows.append({
                "dataset": ds,
                "K": k,
                "val_acc": round(
                    accuracy(logits[data.idx_val], data.labels[data.idx_val]),
                    4,
                ),
                "test_acc": round(
                    accuracy(
                        logits[data.idx_test], data.labels[data.idx_test]
                    ),
                    4,
                ),
                "precompute_s": round(per_hop_t.get(k, 0.0), 4),
                "train_s": round(t_train, 4),
                "weight_decay": wd,
            })
    return rows


def print_table(rows: list[dict]) -> None:
    if not rows:
        return
    cols = list(rows[0].keys())
    widths = [
        max(len(c), max(len(str(r[c])) for r in rows)) for c in cols
    ]
    line = "  ".join(c.ljust(w) for c, w in zip(cols, widths))
    print(line)
    print("-" * len(line))
    for r in rows:
        print("  ".join(str(r[c]).ljust(w) for c, w in zip(cols, widths)))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--datasets", nargs="+", default=["cora"])
    p.add_argument("--degrees", nargs="+", type=int, default=[1, 2, 3])
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.2)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument("--no_tuned", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--data_path", default=None)
    p.add_argument("--json", action="store_true", help="jsonl output")
    a = p.parse_args()

    rows = sweep(
        a.datasets, a.degrees, epochs=a.epochs, lr=a.lr,
        weight_decay=a.weight_decay, tuned=not a.no_tuned, seed=a.seed,
        data_path=a.data_path,
    )
    if a.json:
        for r in rows:
            print(json.dumps(r))
    else:
        print_table(rows)


if __name__ == "__main__":
    main()
