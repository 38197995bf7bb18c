"""Citation-network SGC/GCN training CLI.

Usage parity with the reference entry point (citation.py / README.md:73-78):

    python -m sgc_tpu.cli.citation --dataset cora --tuned
    python -m sgc_tpu.cli.citation --dataset citeseer --tuned --epochs 150
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from sgc_tpu.data.planetoid import load_citation
from sgc_tpu.models.registry import get_model
from sgc_tpu.models.sgc import sgc_apply
from sgc_tpu.ops.propagate import sgc_precompute
from sgc_tpu.train.loops import train_regression
from sgc_tpu.train.metrics import accuracy
from sgc_tpu.utils.config import CitationConfig
from sgc_tpu.utils.seeding import set_seed


def run(
    cfg: CitationConfig,
    data_path: str | None = None,
    propagator: str = "sgc",
    sharded: bool = False,
    trainer: str = "adam",
) -> dict:
    cfg = cfg.resolve()
    key = set_seed(cfg.seed)
    data = load_citation(cfg.dataset, cfg.normalization, data_path)

    init_fn, apply_fn = get_model(cfg.model)

    if sharded:
        # multi-device training over all available chips: fit_sharded
        # (SGC: one sharded propagation + SPMD head epochs) or
        # fit_gcn_sharded (GCN: per-layer sharded SpMM inside the step)
        if propagator != "sgc":
            raise ValueError("--sharded supports the sgc propagator only")
        return _run_sharded(cfg, data, trainer=trainer)

    if cfg.model == "SGC":
        params = init_fn(key, data.features.shape[1], data.n_classes)
        if propagator == "sgc":
            features, precompute_time = sgc_precompute(
                data.features, data.graph, cfg.degree
            )
        else:  # appnp / ssgc propagation schemes, same factorization
            from time import perf_counter

            from sgc_tpu.ops.propagate import fetch_propagator
            from sgc_tpu.utils.profiling import sync

            prop = fetch_propagator(propagator)
            # warm compilation outside the timer, matching sgc_precompute's
            # contract (timing covers execution, not XLA compile)
            prop.lower(data.features, data.graph, cfg.degree).compile()
            t0 = perf_counter()
            features = prop(data.features, data.graph, cfg.degree)
            sync(features)
            precompute_time = perf_counter() - t0
        train_x = features[data.idx_train]
        train_y = data.labels[data.idx_train]
        params, train_time = train_regression(
            params, train_x, train_y, cfg.epochs, cfg.weight_decay, cfg.lr
        )
        logits_val = sgc_apply(params, features[data.idx_val])
        logits_test = sgc_apply(params, features[data.idx_test])
    else:  # GCN: propagation inside the model, no precompute
        from sgc_tpu.models.gcn import gcn_apply
        from sgc_tpu.train.loops import train_gcn

        hidden = cfg.hidden or 16
        params = init_fn(key, data.features.shape[1], hidden, data.n_classes)
        precompute_time = 0.0
        params, train_time = train_gcn(
            params, data.features, data.graph,
            jnp.asarray(data.idx_train), data.labels[data.idx_train],
            epochs=cfg.epochs, weight_decay=cfg.weight_decay, lr=cfg.lr,
            dropout=cfg.dropout, seed=cfg.seed,
        )
        logits = gcn_apply(params, data.features, data.graph)
        logits_val = logits[data.idx_val]
        logits_test = logits[data.idx_test]

    acc_val = accuracy(logits_val, data.labels[data.idx_val])
    acc_test = accuracy(logits_test, data.labels[data.idx_test])
    return {
        "val_accuracy": acc_val,
        "test_accuracy": acc_test,
        "precompute_time": precompute_time,
        "train_time": train_time,
        "total_time": precompute_time + train_time,
    }


def _run_sharded(cfg, data, trainer: str = "adam") -> dict:
    """Citation training over all available devices (the multi-chip face
    of the CLI: fit_sharded / fit_gcn_sharded)."""
    from time import perf_counter

    import numpy as np

    from sgc_tpu.ops.propagate import propagate

    feats = np.asarray(data.features)
    labels = np.asarray(data.labels)
    idx_train = np.asarray(data.idx_train)

    t0 = perf_counter()
    if cfg.model == "SGC":
        from sgc_tpu.parallel.fit import fit_sharded

        params, report = fit_sharded(
            data.graph, feats, labels, idx_train, data.n_classes,
            degree=cfg.degree, epochs=cfg.epochs, lr=cfg.lr,
            weight_decay=cfg.weight_decay, seed=cfg.seed,
            trainer=trainer,
        )
        # evaluate with the single-device propagation (params are
        # node-order independent; w sliced back to the unpadded width)
        feats_prop = propagate(data.features, data.graph, cfg.degree)
        w = jnp.asarray(np.asarray(params.w)[: feats.shape[1]])
        b = jnp.asarray(np.asarray(params.b))
        logits_val = feats_prop[data.idx_val] @ w + b
        logits_test = feats_prop[data.idx_test] @ w + b
        extra = {"formulation": report.formulation,
                 "halo_fraction": report.halo_fraction}
    else:
        from sgc_tpu.models.gcn import gcn_apply
        from sgc_tpu.parallel.gcn import fit_gcn_sharded

        params, losses = fit_gcn_sharded(
            data.graph, feats, labels, idx_train, data.n_classes,
            n_hidden=cfg.hidden or 16, epochs=cfg.epochs, lr=cfg.lr,
            weight_decay=cfg.weight_decay, seed=cfg.seed,
        )
        logits = gcn_apply(params, data.features, data.graph)
        logits_val = logits[data.idx_val]
        logits_test = logits[data.idx_test]
        extra = {"final_loss": losses[-1]}
    total = perf_counter() - t0

    return {
        "val_accuracy": accuracy(logits_val, data.labels[data.idx_val]),
        "test_accuracy": accuracy(logits_test, data.labels[data.idx_test]),
        "precompute_time": 0.0,
        "train_time": total,
        "total_time": total,
        **extra,
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="cora")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--lr", type=float, default=0.2)
    parser.add_argument("--weight_decay", type=float, default=5e-6)
    parser.add_argument("--hidden", type=int, default=0)
    parser.add_argument("--dropout", type=float, default=0.0)
    parser.add_argument("--model", default="SGC", choices=["SGC", "GCN"])
    parser.add_argument("--propagator", default="sgc",
                        choices=["sgc", "appnp", "ssgc"],
                        help="propagation scheme for the SGC path")
    parser.add_argument("--normalization", default="AugNormAdj")
    parser.add_argument("--sharded", action="store_true",
                        help="train over all available devices "
                             "(fit_sharded / fit_gcn_sharded)")
    parser.add_argument("--trainer", default="adam",
                        choices=["adam", "newton"],
                        help="--sharded SGC head trainer: adam epochs "
                             "(reference-faithful) or the newton fit "
                             "(~8 MXU steps; round-4 headline trainer)")
    parser.add_argument("--degree", type=int, default=2)
    parser.add_argument("--tuned", action="store_true")
    parser.add_argument("--data_path", default=None)
    args = parser.parse_args()

    cfg = CitationConfig(
        dataset=args.dataset,
        seed=args.seed,
        epochs=args.epochs,
        lr=args.lr,
        weight_decay=args.weight_decay,
        hidden=args.hidden,
        dropout=args.dropout,
        model=args.model,
        normalization=args.normalization,
        degree=args.degree,
        tuned=args.tuned,
    )
    if cfg.tuned:
        cfg.resolve()
        print(f"using tuned weight decay: {cfg.weight_decay}")
    res = run(cfg, args.data_path, propagator=args.propagator,
              sharded=args.sharded, trainer=args.trainer)
    print(
        "Validation Accuracy: {:.4f} Test Accuracy: {:.4f}".format(
            res["val_accuracy"], res["test_accuracy"]
        )
    )
    print(
        "Pre-compute time: {:.4f}s, train time: {:.4f}s, total: {:.4f}s".format(
            res["precompute_time"], res["train_time"], res["total_time"]
        )
    )


if __name__ == "__main__":
    main()
