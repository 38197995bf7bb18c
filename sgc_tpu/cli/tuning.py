"""Weight-decay tuning CLI (TPE over frozen propagated features).

Usage parity with the reference entry points (tuning.py,
downstream/TextSGC/tuning.py):

    python -m sgc_tpu.cli.tuning --dataset cora
    python -m sgc_tpu.cli.tuning --family text --dataset ohsumed

The expensive K-hop propagation runs ONCE; each of the 60 TPE trials is a
cheap jit-cached linear-head fit scored on validation accuracy (reference
tuning.py:18-38). Best weight decay is written to
``<output>/<dataset>.json`` and can be merged into configs/tuned.json.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax.numpy as jnp

from sgc_tpu.models.sgc import init_sgc, sgc_apply
from sgc_tpu.ops.propagate import sgc_precompute, text_structural_features
from sgc_tpu.train.loops import eval_linear, train_linear, train_regression
from sgc_tpu.train.metrics import accuracy
from sgc_tpu.tune.tpe import fmin, loguniform
from sgc_tpu.utils.seeding import set_seed


def tune_citation(dataset, degree, epochs, lr, max_evals, seed, data_path,
                  grid: int = 0):
    """TPE search (default) or, with ``grid=N``, a vmapped grid search:
    N log-spaced weight decays train as ONE batched program
    (train_regression_many) — the TPU-native alternative to the
    reference's 60 sequential trials (tuning.py:26-33)."""
    from sgc_tpu.data.planetoid import load_citation

    import numpy as _np

    key = set_seed(seed)
    data = load_citation(dataset, "AugNormAdj", data_path)
    # tuning touches only train+val rows — propagate exactly those
    # (dead-row elimination, sgc_precompute(out_rows=...); identical
    # values to full propagation + slicing)
    idx_tv = _np.concatenate(
        [_np.asarray(data.idx_train), _np.asarray(data.idx_val)]
    )
    features, _ = sgc_precompute(
        data.features, data.graph, degree, out_rows=idx_tv
    )
    n_tr = len(data.idx_train)
    train_x = features[:n_tr]
    train_y = data.labels[data.idx_train]
    val_x = features[n_tr:]
    val_y = data.labels[data.idx_val]
    nfeat, nclass = features.shape[1], data.n_classes

    # reference search space: loguniform(1e-10, 1e-4)  (tuning.py:21 uses
    # exp of uniform(log(1e-10), log(1e-4)))
    if grid:
        if grid < 2:
            raise ValueError(
                f"--grid {grid}: need >= 2 log-spaced candidates to span "
                "the search space (use TPE for single-point evaluation)"
            )
        import jax
        import numpy as np

        from sgc_tpu.train.loops import train_regression_many

        wds = np.logspace(-10, -4, grid)
        model0 = init_sgc(key, nfeat, nclass)
        many, _, _dt = train_regression_many(
            model0, train_x, train_y, wds, epochs=epochs, lr=lr
        )
        # score every head in ONE dispatch too (a per-head accuracy loop
        # would pay N device->host round-trips on the tunneled TPU)
        logits = jax.vmap(sgc_apply, in_axes=(0, None))(many, val_x)
        preds = jax.numpy.argmax(logits, axis=-1)        # (grid, n_val)
        accs = np.asarray((preds == val_y[None, :]).mean(axis=1))
        i_best = int(np.argmax(accs))
        return {"weight_decay": float(wds[i_best])}, float(accs[i_best])

    def objective(params):
        model = init_sgc(key, nfeat, nclass)
        model, _ = train_regression(
            model, train_x, train_y, epochs, params["weight_decay"], lr
        )
        return -accuracy(sgc_apply(model, val_x), val_y)

    best, loss = fmin(
        objective, {"weight_decay": loguniform(1e-10, 1e-4)},
        max_evals=max_evals, seed=seed,
    )
    return best, -loss


def tune_text(dataset, degree, epochs, max_evals, seed, data_path, subset,
              fold=None):
    """``fold`` selects a cross-validation fold — the per-fold tuning
    workflow of reference TextSGC_ref/tuningv2.py:24-67 (each fold gets
    its own TPE search; results feed crossval --per-fold wd)."""
    from sgc_tpu.data.textcorpus import load_corpus

    key = set_seed(seed)
    data = load_corpus(dataset, subset, data_path, fold=fold)
    binary = dataset == "mr"
    feat_dict, _ = text_structural_features(
        data.graph, data.index_dict, degree=degree
    )
    label_dict = {k: jnp.asarray(v) for k, v in data.label_dict.items()}
    nclass = 1 if binary else data.n_classes

    def objective(params):
        model = init_sgc(
            key, feat_dict["train"].shape[1], nclass, bias=False,
            init="xavier_normal",
        )
        model, _ = train_linear(
            model, feat_dict["train"], label_dict["train"],
            weight_decay=params["weight_decay"], epochs=epochs, binary=binary,
        )
        res = eval_linear(model, feat_dict["val"], label_dict["val"], binary)
        return -res["accuracy"]

    # reference text search space: loguniform(1e-6, 1e0)
    # (downstream/TextSGC/tuning.py:37)
    best, loss = fmin(
        objective, {"weight_decay": loguniform(1e-6, 1.0)},
        max_evals=max_evals, seed=seed,
    )
    return best, -loss


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--family", default="citation",
                        choices=["citation", "text"])
    parser.add_argument("--dataset", default="cora")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--degree", type=int, default=2)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--lr", type=float, default=0.2)
    parser.add_argument("--max_evals", type=int, default=60)
    parser.add_argument("--grid", type=int, default=0,
                        help="vmapped grid search over N log-spaced wds "
                        "(one batched program) instead of sequential TPE")
    parser.add_argument("--subset", default="BCD")
    parser.add_argument("--fold", type=int, default=None,
                        help="cross-validation fold (per-fold tuning, "
                        "reference tuningv2.py)")
    parser.add_argument("--data_path", default=None)
    parser.add_argument("--output", default="tuned")
    args = parser.parse_args()

    if args.family == "citation":
        epochs = args.epochs or 100
        best, val_acc = tune_citation(
            args.dataset, args.degree, epochs, args.lr, args.max_evals,
            args.seed, args.data_path, grid=args.grid,
        )
    else:
        if args.grid:
            raise SystemExit(
                "--grid is citation-family only (the text family's LBFGS "
                "fit is not vmapped); use TPE (--max_evals) instead"
            )
        epochs = args.epochs or 3
        best, val_acc = tune_text(
            args.dataset, args.degree, epochs, args.max_evals, args.seed,
            args.data_path, args.subset, fold=args.fold,
        )

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = (args.dataset if args.fold is None
            else f"{args.dataset}.{args.fold}")
    out_path = out_dir / f"{stem}.json"
    with open(out_path, "w") as f:
        json.dump({"weight_decay": best["weight_decay"],
                   "val_accuracy": val_acc}, f)
    print(f"best weight_decay: {best['weight_decay']:.6e} "
          f"(val acc {val_acc:.4f}) -> {out_path}")


if __name__ == "__main__":
    main()
