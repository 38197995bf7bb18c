"""Word2Vec CLI (reference TextSGC_indexing/word2vec.py entry point).

Trains the JAX skip-gram model over a cleaned one-doc-per-line corpus,
exports a tsv of vectors and optionally nearest-neighbor lists, plus an
npz embedding map for the build_graph ``--embeddings`` flag.

Usage:
    python -m sgc_tpu.cli.word2vec --corpus data/ohsumed.clean.txt \
        --dim 100 --out w2v
"""

from __future__ import annotations

import argparse
from pathlib import Path

from sgc_tpu.textgraph.embedding import save_embedding_map
from sgc_tpu.textgraph.word2vec import Word2Vec, Word2VecConfig


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--corpus", required=True)
    p.add_argument("--dim", type=int, default=100)
    p.add_argument("--window", type=int, default=5)
    p.add_argument("--negatives", type=int, default=5)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=0.025)
    p.add_argument("--min_count", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=8192)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--neighbors", type=int, default=0,
                   help="export top-N nearest neighbors per word")
    p.add_argument("--out", required=True, help="output stem")
    a = p.parse_args()

    docs = [
        line.split()
        for line in Path(a.corpus).read_text(
            encoding="utf-8", errors="ignore"
        ).splitlines()
        if line.strip()
    ]
    w2v = Word2Vec(Word2VecConfig(
        dim=a.dim, window=a.window, negatives=a.negatives, lr=a.lr,
        epochs=a.epochs, batch_size=a.batch_size, min_count=a.min_count,
        seed=a.seed,
    )).train(docs)

    w2v.save_tsv(f"{a.out}.tsv")
    save_embedding_map(f"{a.out}.npz", w2v.as_dict())
    if a.neighbors > 0:
        # nearest-neighbor export (reference word2vec.py:128-150)
        with open(f"{a.out}.neighbors.txt", "w") as f:
            for w in w2v.vocab:
                nn = ", ".join(
                    f"{x}:{s:.3f}" for x, s in w2v.most_similar(w, a.neighbors)
                )
                f.write(f"{w}\t{nn}\n")
    print(f"trained w2v: {len(w2v.vocab)} words dim {a.dim} -> {a.out}.tsv/.npz")


if __name__ == "__main__":
    main()
