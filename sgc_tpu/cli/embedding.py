"""Word-embedding extraction CLI (reference run_embedding.py entry point).

Extracts one pooled vector per vocabulary word from a pretrained encoder
(flax on TPU when available, torch CPU fallback, deterministic hash
fallback for hermetic runs) and writes an npz word->vector map for
``--embeddings`` of the build_graph CLI.

Usage:
    python -m sgc_tpu.cli.embedding --vocab data/ind.ohsumed.vocab \
        --model dmis-lab/biobert-v1.1 --pooling mean --out emb.npz
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

from sgc_tpu.textgraph.embedding import EmbedderConfig, WordEmbedder


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vocab", required=True,
                   help="pickled word list (ind.<ds>.vocab) or plain text, "
                        "one word per line")
    p.add_argument("--model", default="bert-base-uncased")
    p.add_argument("--pooling", default="mean",
                   choices=("none", "first", "mean", "sum"))
    p.add_argument("--layer", type=int, default=-1)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--max_length", type=int, default=16)
    p.add_argument("--backend", default="auto",
                   choices=("auto", "flax", "torch", "hash"))
    p.add_argument("--out", required=True)
    a = p.parse_args()

    path = Path(a.vocab)
    try:
        with open(path, "rb") as f:
            words = list(pickle.load(f))
    except (pickle.UnpicklingError, UnicodeDecodeError):
        words = [w.strip() for w in path.read_text().splitlines() if w.strip()]

    emb = WordEmbedder(EmbedderConfig(
        model_name=a.model, pooling=a.pooling, layer=a.layer,
        batch_size=a.batch_size, max_length=a.max_length, backend=a.backend,
    ))
    table = emb.embed_vocab_to_file(words, a.out)
    dim = len(next(iter(table.values()))) if table else 0
    print(f"embedded {len(table)} words (dim {dim}) -> {a.out}")


if __name__ == "__main__":
    main()


def _mp_fn(index):
    """xla_spawn multi-process hook (reference run_embedding.py:275-277)."""
    main()
