"""TPE sampler + cross-validation flow tests."""

import numpy as np
import pytest

from sgc_tpu.tune.tpe import TPESampler, fmin, loguniform, uniform, choice
from sgc_tpu.data.crossval import make_crossval_ids


def test_tpe_finds_quadratic_minimum():
    best, loss = fmin(
        lambda p: (p["x"] - 0.3) ** 2,
        {"x": uniform(-1.0, 1.0)},
        max_evals=60,
        seed=0,
    )
    assert abs(best["x"] - 0.3) < 0.1
    assert loss < 0.01


def test_tpe_loguniform_spans_decades():
    # minimum at 1e-5 on a log scale spanning 1e-10..1e-2
    best, loss = fmin(
        lambda p: (np.log10(p["wd"]) + 5.0) ** 2,
        {"wd": loguniform(1e-10, 1e-2)},
        max_evals=60,
        seed=1,
    )
    assert 1e-6 < best["wd"] < 1e-4


def test_tpe_choice():
    best, _ = fmin(
        lambda p: 0.0 if p["opt"] == "b" else 1.0,
        {"opt": choice("a", "b", "c")},
        max_evals=40,
        seed=2,
    )
    assert best["opt"] == "b"


def test_tpe_beats_random_on_narrow_optimum():
    """TPE should concentrate samples near the optimum after startup."""

    def obj(p):
        return abs(np.log(p["wd"]) - np.log(3e-6))

    sampler = TPESampler({"wd": loguniform(1e-10, 1.0)}, seed=3)
    for _ in range(60):
        params = sampler.suggest()
        sampler.observe(params, obj(params))
    post_startup = [t[0]["wd"] for t in sampler.trials[sampler.n_startup:]]
    # at least half the post-startup proposals within 2 decades of optimum
    close = [w for w in post_startup if 3e-8 < w < 3e-4]
    assert len(close) >= len(post_startup) // 2


def test_crossval_ids_stratified(tmp_path):
    meta = tmp_path / "toy.txt"
    labels = ["A"] * 40 + ["B"] * 20
    meta.write_text(
        "\n".join(f"doc{i}\ttrain\t{l}" for i, l in enumerate(labels))
    )
    folds = make_crossval_ids(meta, tmp_path, "toy", n_folds=5, seed=0)
    assert len(folds) == 5
    all_test = np.concatenate([f["test"] for f in folds])
    # every doc appears in exactly one test fold
    assert sorted(all_test.tolist()) == list(range(60))
    for f in folds:
        # stratification: each test fold has ~2/3 A, ~1/3 B
        test_labels = [labels[i] for i in f["test"]]
        assert test_labels.count("A") == 8
        assert test_labels.count("B") == 4
        # no overlap between train/val/test
        assert not (set(f["train"]) & set(f["test"]))
        assert not (set(f["val"]) & set(f["test"]))
        assert not (set(f["train"]) & set(f["val"]))

    # pickles load through the textcorpus fold path
    import pickle

    with open(tmp_path / "ind.toy.0.train.x", "rb") as fh:
        ids = pickle.load(fh)
    assert set(ids) == set(int(i) for i in folds[0]["train"])
