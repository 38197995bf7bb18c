"""TextSGC training CLI (doc-word graph text classification).

Usage parity with the reference entry point
(downstream/TextSGC/train.py, README.md:39-41):

    python -m sgc_tpu.cli.textsgc --dataset ohsumed --tuned

Pipeline: load the doc-word graph + per-phase doc ids, compute structural
features (rows of S^2 restricted to each phase's doc nodes, min-max scaled
on train — reference downstream/TextSGC/utils.py:131-152) WITHOUT the
reference's N x N densification, then fit the linear head with L-BFGS +
manual L2 (train.py:59-73). ``mr`` is binary (sigmoid + BCE, train.py:52-58).
"""

from __future__ import annotations

import argparse
import pickle

import jax
import jax.numpy as jnp

from sgc_tpu.data.textcorpus import load_corpus
from sgc_tpu.models.sgc import SGCParams, init_sgc
from sgc_tpu.ops.propagate import text_structural_features
from sgc_tpu.train.loops import eval_linear, train_linear
from sgc_tpu.utils.config import TextConfig
from sgc_tpu.utils.seeding import set_seed


def run(
    cfg: TextConfig,
    subset: str = "BCD",
    data_path: str | None = None,
    fold: int | None = None,
    class_weights: bool = False,
    feat_cache: str | None = None,
    impl: str = "auto",
    trainer: str = "lbfgs",
) -> dict:
    cfg = cfg.resolve()
    key = set_seed(cfg.seed)
    data = load_corpus(cfg.dataset, subset, data_path, fold=fold)
    binary = cfg.dataset == "mr"

    from pathlib import Path

    from sgc_tpu.utils.checkpoint import load_features, save_features

    if cfg.preprocessed and not feat_cache:
        raise ValueError("--preprocessed requires --feat_cache <path>")
    from sgc_tpu.utils.checkpoint import _npz_path

    if cfg.preprocessed and _npz_path(Path(feat_cache)).exists():
        # npz cache written by a prior run (utils.checkpoint format —
        # the reference pickles, --preprocessed train.py:104-112)
        feat_dict = load_features(feat_cache)
        precompute_time = 0.0
    else:
        feat_dict, precompute_time = text_structural_features(
            data.graph, data.index_dict, degree=cfg.degree, impl=impl
        )
        if feat_cache:
            save_features(feat_cache, feat_dict)

    label_dict = {k: jnp.asarray(v) for k, v in data.label_dict.items()}

    nclass = 1 if binary else data.n_classes
    params = init_sgc(
        key, feat_dict["train"].shape[1], nclass, bias=False,
        init="xavier_normal",
    )

    cw = None
    if class_weights and not binary:
        # inverse-frequency class weights
        # (reference TextSGC_indexing/trainv2.py:74-82)
        counts = jnp.bincount(label_dict["train"], length=nclass)
        cw = counts.sum() / jnp.maximum(counts, 1) / nclass

    # trainer="newton" runs the accelerated Böhning/MM head fit (the
    # bench headline trainer) on the text path too; "lbfgs" stays the
    # reference-parity default (train.py:59-73 closure semantics).
    # COVID end-metric parity for both is recorded in RESULTS.md.
    params, train_time = train_linear(
        params,
        feat_dict["train"],
        label_dict["train"],
        weight_decay=cfg.weight_decay,
        epochs=cfg.epochs,
        binary=binary,
        class_weights=cw,
        trainer=trainer,
    )

    res = {
        phase: eval_linear(params, feat_dict[phase], label_dict[phase], binary)
        for phase in ("train", "val", "test")
    }
    return {
        "train_accuracy": res["train"]["accuracy"],
        "val_accuracy": res["val"]["accuracy"],
        "test_accuracy": res["test"]["accuracy"],
        "predictions": res["test"]["predictions"],
        "test_labels": data.label_dict["test"],
        "precompute_time": precompute_time,
        "train_time": train_time,
        "total_time": precompute_time + train_time,
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="20ng")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--degree", type=int, default=2)
    parser.add_argument("--subset", default="BCD",
                        choices=["B", "BC", "BD", "BCD"])
    parser.add_argument("--tuned", action="store_true")
    parser.add_argument("--preprocessed", action="store_true")
    parser.add_argument("--feat_cache", default=None,
                        help="pickled feature-dict path for --preprocessed")
    parser.add_argument("--fold", type=int, default=None,
                        help="cross-validation fold index")
    parser.add_argument("--class_weights", action="store_true")
    parser.add_argument("--data_path", default=None)
    parser.add_argument("--impl", default="auto",
                        choices=["auto", "dense", "sparse", "blockdense"],
                        help="S^{K-1} hop formulation for the structural "
                             "precompute (blockdense = locality cells + "
                             "segment remainder)")
    parser.add_argument("--trainer", default="lbfgs",
                        choices=["lbfgs", "newton"],
                        help="head fit: torch-parity LBFGS (default) or "
                             "the accelerated Newton/MM trainer")
    args = parser.parse_args()

    cfg = TextConfig(
        dataset=args.dataset,
        seed=args.seed,
        epochs=args.epochs,
        weight_decay=args.weight_decay,
        degree=args.degree,
        tuned=args.tuned,
        preprocessed=args.preprocessed,
    )
    res = run(
        cfg,
        subset=args.subset,
        data_path=args.data_path,
        fold=args.fold,
        class_weights=args.class_weights,
        feat_cache=args.feat_cache,
        impl=args.impl,
        trainer=args.trainer,
    )
    print(
        "Total Time: {:2f}s, Train acc: {:.4f}, Val acc: {:.4f}, "
        "Test acc: {:.4f}".format(
            res["total_time"],
            res["train_accuracy"],
            res["val_accuracy"],
            res["test_accuracy"],
        )
    )


if __name__ == "__main__":
    main()
