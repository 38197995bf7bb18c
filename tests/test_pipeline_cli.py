"""End-to-end offline pipeline: clean -> build_graph CLI -> textsgc train.

Exercises the artifact contract between the graph-build export and
load_corpus (the reference's build_graph.py -> train.py handoff).
"""

import pickle
import sys

import numpy as np
import pytest


@pytest.fixture
def tiny_corpus(tmp_path):
    """Synthetic 2-class corpus with strongly class-specific vocabulary."""
    rng = np.random.default_rng(0)
    words = {
        "sci": ["enzyme", "protein", "membrane", "cell", "viral"],
        "fin": ["market", "stock", "profit", "trade", "asset"],
    }
    meta_lines, docs = [], []
    for i in range(40):
        label = "sci" if i % 2 == 0 else "fin"
        phase = "train" if i < 30 else "test"
        meta_lines.append(f"doc{i}\t{phase}\t{label}")
        docs.append(" ".join(rng.choice(words[label], 12)))
    meta = tmp_path / "tiny.txt"
    corpus = tmp_path / "tiny.clean.txt"
    meta.write_text("\n".join(meta_lines))
    corpus.write_text("\n".join(docs))
    return meta, corpus, tmp_path


def test_build_graph_cli_exports_loadable_dataset(tiny_corpus):
    meta, corpus, out = tiny_corpus
    from sgc_tpu.cli.build_graph import build_and_export
    from sgc_tpu.data.textcorpus import load_corpus

    built = build_and_export(
        str(meta), str(corpus), "tiny", str(out), window=5, val_fraction=0.2
    )
    for subset in ("B", "BC", "BD", "BCD"):
        assert (out / f"ind.tiny.{subset}.adj").exists()

    data = load_corpus("tiny", subset="BCD", data_path=str(out))
    assert data.n_classes == 2
    # doc nodes first, then word nodes
    assert data.n_nodes == 40 + len(built["vocab"])
    assert len(data.index_dict["train"]) + len(data.index_dict["val"]) == 30
    assert len(data.index_dict["test"]) == 10


def test_textsgc_train_on_built_graph(tiny_corpus):
    meta, corpus, out = tiny_corpus
    from sgc_tpu.cli.build_graph import build_and_export
    from sgc_tpu.cli.textsgc import run
    from sgc_tpu.utils.config import TextConfig

    build_and_export(
        str(meta), str(corpus), "tiny", str(out), window=5, val_fraction=0.2
    )
    res = run(
        TextConfig(dataset="tiny", epochs=3, weight_decay=0.0, degree=2),
        subset="BCD",
        data_path=str(out),
    )
    # fully class-separable vocabulary: near-perfect accuracy expected
    assert res["test_accuracy"] > 0.9


def test_build_graph_with_embeddings_and_chi2(tiny_corpus):
    meta, corpus, out = tiny_corpus
    from sgc_tpu.cli.build_graph import build_and_export
    from sgc_tpu.textgraph.embedding import hash_embedding, save_embedding_map

    # build embedding map covering the corpus vocabulary
    vocab = sorted(set(corpus.read_text().split()))
    save_embedding_map(
        out / "emb.npz", {w: hash_embedding(w, 16) for w in vocab}
    )
    built = build_and_export(
        str(meta), str(corpus), "tiny2", str(out), window=5,
        p_value=0.9, max_features=8, embeddings=str(out / "emb.npz"),
        pivoted=True,
    )
    assert len(built["vocab"]) <= 8          # chi2 cap applied
    assert built["adjs"]["BCD"].nnz > 0


def test_word2vec_cli(tiny_corpus, monkeypatch, capsys):
    meta, corpus, out = tiny_corpus
    from sgc_tpu.cli.word2vec import main

    monkeypatch.setattr(sys, "argv", [
        "word2vec", "--corpus", str(corpus), "--dim", "8", "--epochs", "1",
        "--neighbors", "2", "--out", str(out / "w2v"),
    ])
    main()
    assert (out / "w2v.tsv").exists()
    assert (out / "w2v.npz").exists()
    assert (out / "w2v.neighbors.txt").exists()
    assert "trained w2v" in capsys.readouterr().out


def test_embedding_cli_hash_backend(tiny_corpus, monkeypatch, capsys):
    meta, corpus, out = tiny_corpus
    from sgc_tpu.cli.embedding import main
    from sgc_tpu.textgraph.embedding import load_embedding_map

    vocab_file = out / "vocab.pkl"
    with open(vocab_file, "wb") as f:
        pickle.dump(["enzyme", "market", "cell"], f)
    monkeypatch.setattr(sys, "argv", [
        "embedding", "--vocab", str(vocab_file), "--backend", "hash",
        "--out", str(out / "e.npz"),
    ])
    main()
    table = load_embedding_map(out / "e.npz")
    assert set(table) == {"enzyme", "market", "cell"}


def test_sequence_cli_runs(tiny_corpus, monkeypatch, capsys):
    meta, corpus, out = tiny_corpus
    from sgc_tpu.cli.sequence import main

    monkeypatch.setattr(sys, "argv", [
        "sequence", "--metadata", str(meta), "--corpus", str(corpus),
        "--epochs", "2", "--dim", "32", "--heads", "2", "--layers", "1",
        "--max_len", "16", "--lr", "1e-3", "--batch_size", "8",
    ])
    main()
    outtext = capsys.readouterr().out
    assert "Test accuracy" in outtext


def test_export_sentences(tmp_path):
    from sgc_tpu.textgraph.clean import export_sentences

    src = tmp_path / "docs.txt"
    src.write_text(
        "First sentence here. Second one follows! Third is a question?\n"
        "Another document. Tiny.\n"
    )
    out = tmp_path / "sents.txt"
    n = export_sentences(src, out, min_tokens=3)
    lines = out.read_text().split("\n")
    assert n == 3  # "Another document." and "Tiny." have < 3 tokens
    assert "First sentence here." in lines
    assert "" in lines  # doc separator blank line


def test_clean_corpus_cli_assemble_clean_sentences(tmp_path, monkeypatch,
                                                   capsys):
    """clean_corpus CLI: metadata assembly -> cleaning -> sentence export.

    One command covering the reference's build_corpus.py + remove_words.py
    + prepare_bert.py handoff; expectations computed by hand.
    """
    from sgc_tpu.cli.clean_corpus import main

    docs_dir = tmp_path / "raw"
    docs_dir.mkdir()
    # "enzyme" appears 3x corpus-wide, "membrane" once; "the" is an NLTK
    # stopword. Newlines inside a doc must flatten to spaces.
    (docs_dir / "d0.txt").write_text(
        "The enzyme binds.\nThe enzyme folds fast today.")
    (docs_dir / "d1.txt").write_text("Enzyme and membrane interact here.")
    meta = tmp_path / "meta.txt"
    meta.write_text("d0\ttrain\tsci\nd1\ttest\tsci")

    corpus = tmp_path / "corpus.txt"
    sents = tmp_path / "sents.txt"
    monkeypatch.setattr(sys, "argv", [
        "clean_corpus", "--corpus", str(corpus),
        "--metadata", str(meta), "--doc_root", str(docs_dir),
        "--stopwords", "nltk", "--min_freq", "1",
        "--sentences", str(sents),
    ])
    main()

    assembled = corpus.read_text().split("\n")
    assert assembled == [
        "The enzyme binds. The enzyme folds fast today.",
        "Enzyme and membrane interact here.",
    ]
    cleaned = (tmp_path / "corpus.clean.txt").read_text().split("\n")
    assert len(cleaned) == 2
    joined = " ".join(cleaned).split()
    assert joined.count("enzyme") == 3          # freq 3 > min_freq 1: kept
    assert "membrane" not in joined             # freq 1: cut
    assert "the" not in joined                  # stopword
    # sentence export reads the assembled (pre-clean) corpus
    sent_lines = sents.read_text().split("\n")
    assert "The enzyme binds." in sent_lines
    out = capsys.readouterr().out
    assert "assembled 2 docs" in out
    assert "cleaned 2 docs" in out


def test_scalar_writer(tmp_path):
    import json as _json

    from sgc_tpu.utils.profiling import ScalarWriter

    p = tmp_path / "events.jsonl"
    with ScalarWriter(p) as w:
        w.scalars("train/loss", [1.0, 0.5, 0.25])
        w.scalar("val/acc", 0.8, step=2)
    events = [_json.loads(l) for l in p.read_text().splitlines()]
    assert len(events) == 4
    assert events[0]["tag"] == "train/loss" and events[0]["step"] == 0
    assert events[-1]["value"] == 0.8


def test_train_regression_writer(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sgc_tpu.models.sgc import init_sgc
    from sgc_tpu.train.loops import train_regression
    from sgc_tpu.utils.profiling import ScalarWriter

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 8), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, 3, 32), jnp.int32)
    params = init_sgc(jax.random.PRNGKey(0), 8, 3)
    p = tmp_path / "ev.jsonl"
    with ScalarWriter(p) as w:
        train_regression(params, x, y, epochs=5, writer=w)
    assert len(p.read_text().splitlines()) == 5


def test_devices_cli(capsys):
    from sgc_tpu.cli.devices import main

    main()
    out = capsys.readouterr().out
    assert "backend" in out and "smoke test: OK" in out


def test_binary_mr_path(tmp_path):
    """The 'mr' dataset triggers the binary sigmoid+BCE path end-to-end."""
    rng = np.random.default_rng(0)
    words = {0: ["dull", "boring", "flat"], 1: ["great", "moving", "superb"]}
    meta_lines, docs = [], []
    for i in range(40):
        y = i % 2
        phase = "train" if i < 30 else "test"
        meta_lines.append(f"d{i}\t{phase}\t{y}")
        docs.append(" ".join(rng.choice(words[y], 10)))
    (tmp_path / "mr.txt").write_text("\n".join(meta_lines))
    (tmp_path / "mr.clean.txt").write_text("\n".join(docs))

    from sgc_tpu.cli.build_graph import build_and_export
    from sgc_tpu.cli.textsgc import run
    from sgc_tpu.utils.config import TextConfig

    build_and_export(
        str(tmp_path / "mr.txt"), str(tmp_path / "mr.clean.txt"), "mr",
        str(tmp_path), window=4, val_fraction=0.1,
    )
    res = run(
        TextConfig(dataset="mr", epochs=3, weight_decay=0.0, degree=2),
        subset="BCD", data_path=str(tmp_path),
    )
    assert res["test_accuracy"] > 0.9  # separable vocabulary


def test_per_fold_tuning_cli(tiny_corpus, monkeypatch, capsys):
    """Per-fold TPE tuning (reference TextSGC_ref/tuningv2.py:24-67):
    each fold's search reads that fold's id pickles and writes
    <ds>.<fold>.json, consumable as crossval per-fold weight decay."""
    import json

    meta, corpus, out = tiny_corpus
    from sgc_tpu.cli.build_graph import build_and_export
    from sgc_tpu.data.crossval import make_crossval_ids

    build_and_export(
        str(meta), str(corpus), "tiny", str(out), window=5, val_fraction=0.2
    )
    make_crossval_ids(meta, out, "tiny", n_folds=3, seed=0)

    from sgc_tpu.cli import tuning as tuning_cli

    monkeypatch.setattr(sys, "argv", [
        "tuning", "--family", "text", "--dataset", "tiny", "--fold", "1",
        "--max_evals", "6", "--data_path", str(out),
        "--output", str(out / "tuned"),
    ])
    tuning_cli.main()
    line = capsys.readouterr().out
    assert "best weight_decay" in line

    with open(out / "tuned" / "tiny.1.json") as f:
        rec = json.load(f)
    assert 1e-6 <= rec["weight_decay"] <= 1.0
    assert rec["val_accuracy"] > 0.5

    # the tuned value drives the matching crossval fold
    from sgc_tpu.cli.crossval import run_crossval

    summary = run_crossval(
        "tiny", folds=2, subset="BCD", epochs=2,
        per_fold_tuned={1: rec["weight_decay"]},
        data_path=str(out), results_dir=None,
    )
    assert summary["accuracy_mean"] > 0.7


def test_textsgc_blockdense_impl_matches_sparse(tiny_corpus):
    """--impl blockdense (locality cells + segment remainder on the
    doc-word graph; VERDICT round-2 #6) reproduces the sparse path's
    structural features to bf16 cell tolerance and trains to the same
    accuracy."""
    import numpy as np

    from sgc_tpu.cli.build_graph import build_and_export
    from sgc_tpu.cli.textsgc import run
    from sgc_tpu.data.textcorpus import load_corpus
    from sgc_tpu.ops.propagate import text_structural_features
    from sgc_tpu.utils.config import TextConfig

    meta, corpus, out = tiny_corpus
    build_and_export(
        str(meta), str(corpus), "tiny", str(out), window=5, val_fraction=0.2
    )
    data = load_corpus("tiny", subset="BCD", data_path=str(out))
    f_sparse, _ = text_structural_features(
        data.graph, data.index_dict, degree=2, impl="sparse")
    f_bd, _ = text_structural_features(
        data.graph, data.index_dict, degree=2, impl="blockdense")
    for phase in f_sparse:
        a, b = np.asarray(f_sparse[phase]), np.asarray(f_bd[phase])
        assert a.shape == b.shape
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 2e-2, phase

    res = run(
        TextConfig(dataset="tiny", epochs=3, weight_decay=0.0, degree=2),
        subset="BCD", data_path=str(out), impl="blockdense",
    )
    assert res["test_accuracy"] > 0.9


def test_text_structural_features_chunked_wide_phase():
    """Phases wider than the 2048-column chunk run in exact column
    chunks (both sparse and blockdense) — COVID's 6,626-doc train phase
    crashes accelerator compiles as one program."""
    import numpy as np
    import scipy.sparse as sp

    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.ops.propagate import text_structural_features

    rng = np.random.default_rng(0)
    n = 2600
    a = sp.random(n, n, density=0.01, random_state=1, format="coo")
    a = (a + a.T).tocoo()
    g = SparseGraph.from_scipy(a)
    # train phase wider than one chunk
    idx = {"train": np.arange(2200), "val": np.arange(2200, 2400),
           "test": np.arange(2400, 2600)}
    f_sparse, _ = text_structural_features(g, idx, degree=2, impl="sparse")
    assert f_sparse["train"].shape[0] == 2200
    f_bd, _ = text_structural_features(g, idx, degree=2, impl="blockdense")
    for p in idx:
        a_, b_ = np.asarray(f_sparse[p]), np.asarray(f_bd[p])
        scale = max(np.abs(a_).max(), 1e-9)
        assert np.abs(a_ - b_).max() / scale < 2e-2, p

    # oracle: the unchunked dense-S path on the same graph
    f_dense, _ = text_structural_features(g, idx, degree=2, impl="dense")
    for p in idx:
        np.testing.assert_allclose(
            np.asarray(f_sparse[p]), np.asarray(f_dense[p]),
            rtol=2e-4, atol=2e-5)
