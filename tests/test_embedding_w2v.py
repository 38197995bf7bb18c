"""Tests: embedding extraction subsystem + JAX word2vec + sequence baseline.

Covers the TextSGC_Bio / TextSGC_indexing L9 layer equivalents
(reference run_embedding.py, word2vec.py, xlnet/xlnet.py) hermetically —
the hash backend stands in for pretrained downloads.
"""

import numpy as np
import pytest

from sgc_tpu.textgraph.embedding import (
    EmbedderConfig,
    WordEmbedder,
    hash_embedding,
    load_embedding_map,
    save_embedding_map,
)
from sgc_tpu.textgraph.word2vec import (
    Word2Vec,
    Word2VecConfig,
    build_vocab,
    skipgram_pairs,
)


class TestEmbeddingStore:
    def test_roundtrip(self, tmp_path):
        table = {"covid": np.arange(4, dtype=np.float32), "virus": np.ones(4, np.float32)}
        p = tmp_path / "emb.npz"
        save_embedding_map(p, table)
        back = load_embedding_map(p)
        assert set(back) == {"covid", "virus"}
        np.testing.assert_array_equal(back["covid"], table["covid"])

    def test_hash_embedding_deterministic_unit_norm(self):
        a = hash_embedding("protein", 32)
        b = hash_embedding("protein", 32)
        c = hash_embedding("proteins", 32)
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a, c)
        assert np.linalg.norm(a) == pytest.approx(1.0, abs=1e-5)


class TestWordEmbedder:
    def test_hash_backend_embeds_vocab(self, tmp_path):
        emb = WordEmbedder(EmbedderConfig(backend="hash", hash_dim=16))
        words = ["alpha", "beta", "gamma"]
        table = emb.embed_vocab_to_file(words, tmp_path / "v.npz")
        assert set(table) == set(words)
        assert all(v.shape == (16,) for v in table.values())
        assert set(load_embedding_map(tmp_path / "v.npz")) == set(words)

    def test_pooling_modes(self):
        emb = WordEmbedder(EmbedderConfig(backend="hash"))
        toks = np.arange(12, dtype=np.float32).reshape(3, 4)
        emb.config.pooling = "first"
        np.testing.assert_array_equal(emb._pool(toks), toks[0])
        emb.config.pooling = "mean"
        np.testing.assert_allclose(emb._pool(toks), toks.mean(0))
        emb.config.pooling = "sum"
        np.testing.assert_allclose(emb._pool(toks), toks.sum(0))
        emb.config.pooling = "none"
        np.testing.assert_array_equal(emb._pool(toks), toks)
        emb.config.pooling = "bogus"
        with pytest.raises(ValueError):
            emb._pool(toks)

    def test_feeds_graph_builder_cosine_weights(self):
        # embedding map plugs into the TextGraphBuilder cosine+PMI path
        from sgc_tpu.textgraph.graph import TextCorpus, TextGraphBuilder

        docs = [["viral", "protein", "binding"], ["protein", "binding", "assay"],
                ["viral", "assay", "binding"]]
        corpus = TextCorpus(
            doc_tokens=docs,
            phases=["train", "train", "test"],
            labels=["a", "b", "a"],
            label_names=["a", "b"],
        )
        emb = WordEmbedder(EmbedderConfig(backend="hash", hash_dim=8))
        vocab = sorted({w for d in docs for w in d})
        table = emb.embed_words(vocab)
        fused = TextGraphBuilder(
            window=2, val_fraction=0.0, embeddings=table
        ).build(corpus)
        assert fused["adjs"]["BCD"].nnz > 0
        # empty val split stays integer-indexable (regression: float64 [])
        assert fused["index_dict"]["val"].dtype.kind == "i"

        # cosine weighting applied directly over a nonempty word-word pattern
        import scipy.sparse as sp

        from sgc_tpu.textgraph.graph import embedding_cosine_graph

        pattern = sp.coo_matrix(
            (np.ones(2, np.float32), ([0, 1], [1, 0])), shape=(len(vocab),) * 2
        )
        cos = embedding_cosine_graph(vocab, table, pattern)
        expected = float(table[vocab[0]] @ table[vocab[1]])
        np.testing.assert_allclose(cos.toarray()[0, 1], expected, rtol=1e-5)


class TestSkipgram:
    def test_vocab_and_pairs(self):
        docs = [["a", "b", "c", "a"], ["b", "c"]]
        vocab, word_id, freq = build_vocab(docs)
        assert vocab == ["a", "b", "c"]
        assert freq.tolist() == [2.0, 2.0, 2.0]
        pairs = skipgram_pairs(docs, word_id, window=1)
        # doc1: 3 adjacent pairs *2 directions, doc2: 1 *2
        assert pairs.shape == (8, 2)
        # symmetric: every (a,b) has its (b,a)
        s = {tuple(p) for p in pairs.tolist()}
        assert all((b, a) in s for a, b in s)

    def test_training_brings_cooccurring_words_together(self):
        rng = np.random.default_rng(0)
        # two "topics" that never co-occur
        docs = []
        for _ in range(200):
            docs.append(list(rng.permutation(["cat", "dog", "pet"])))
            docs.append(list(rng.permutation(["stock", "bond", "fund"])))
        w2v = Word2Vec(Word2VecConfig(
            dim=16, window=2, epochs=4, batch_size=512, lr=0.02, seed=1
        )).train(docs)
        assert np.all(np.isfinite(w2v.vectors))
        sims = dict(w2v.most_similar("cat", topn=5))
        assert sims["dog"] > sims["stock"]
        assert sims["pet"] > sims["fund"]

    def test_tsv_export_and_dict(self, tmp_path):
        docs = [["x", "y"], ["y", "z"]]
        w2v = Word2Vec(Word2VecConfig(dim=8, epochs=1, batch_size=4)).train(docs)
        d = w2v.as_dict()
        assert set(d) == {"x", "y", "z"} and d["x"].shape == (8,)
        w2v.save_tsv(tmp_path / "w2v.tsv")
        lines = (tmp_path / "w2v.tsv").read_text().strip().split("\n")
        assert len(lines) == 3
        word, vec = lines[0].split("\t")
        assert len(vec.split()) == 8

    def test_empty_corpus(self):
        w2v = Word2Vec(Word2VecConfig(dim=4)).train([])
        assert w2v.vectors.shape == (0, 4)
        assert w2v.most_similar("anything") == []


def test_explicit_backend_failure_raises():
    """An explicitly requested backend must not silently degrade to hash."""
    emb = WordEmbedder(EmbedderConfig(
        backend="torch", model_name="no/such-model-xyz"
    ))
    with pytest.raises(RuntimeError, match="failed to load"):
        emb.embed_words(["word"])


def test_auto_backend_warns_then_hashes():
    emb = WordEmbedder(EmbedderConfig(
        backend="auto", model_name="no/such-model-xyz", hash_dim=8
    ))
    with pytest.warns(UserWarning, match="hash"):
        table = emb.embed_words(["word"])
    assert table["word"].shape == (8,)


def test_w2v_pretrained_init_finetune():
    """Warm-start from a pretrained map (GoogleNews fine-tune analog)."""
    pre = {"cat": np.full(8, 0.5, np.float32)}
    docs = [["cat", "dog"]] * 5
    w2v = Word2Vec(Word2VecConfig(dim=8, epochs=0, batch_size=4)).train(
        docs, init_vectors=pre
    )
    # epochs=0: vectors stay at init -> cat keeps the pretrained vector
    np.testing.assert_allclose(w2v["cat"], pre["cat"])
    assert not np.allclose(w2v["dog"], pre["cat"])


def test_w2v_finetune_moves_seeded_less_than_fresh():
    """Fine-tuning from pretrained vectors (reference
    TextSGC_indexing/word2vec.py:16-76 GoogleNews workflow): after the
    same number of SGNS epochs, a word seeded with a pretrained vector
    ends closer to its start than a randomly-initialized word — the
    warm start is genuinely used as the optimization's starting point."""
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(20)]
    docs = [[vocab[rng.integers(0, 20)] for _ in range(12)]
            for _ in range(40)]

    pre = {w: rng.standard_normal(8).astype(np.float32) * 0.1
           for w in vocab[:10]}  # seed half the vocabulary

    cfg = Word2VecConfig(dim=8, epochs=3, batch_size=16, seed=7)
    w2v = Word2Vec(cfg).train(docs, init_vectors=pre)

    fresh_cfg = Word2VecConfig(dim=8, epochs=0, batch_size=16, seed=7)
    start = Word2Vec(fresh_cfg).train(docs, init_vectors=pre)

    seeded_moves, fresh_moves = [], []
    for w in vocab:
        d = float(np.linalg.norm(w2v[w] - start[w]))
        (seeded_moves if w in pre else fresh_moves).append(d)
    # training moved everything a nonzero amount...
    assert np.mean(seeded_moves) > 0
    # ...but the seeded vectors started from structure, not noise, so
    # they end STRICTLY closer to their start than fresh ones on average
    assert np.mean(seeded_moves) < np.mean(fresh_moves)
