"""Transformer sequence-classifier CLI (reference xlnet/xlnet.py baseline).

Trains the JAX encoder classifier on a text dataset's metadata + cleaned
corpus (same inputs as the build_graph CLI) and reports test accuracy and
a per-class report — the TextSGC-vs-transformer baseline comparison the
reference runs with XLNet (xlnet.py:301 classification_report).

Usage:
    python -m sgc_tpu.cli.sequence --metadata data/ohsumed.txt \
        --corpus data/ohsumed.clean.txt --epochs 4
"""

from __future__ import annotations

import argparse

import numpy as np

from sgc_tpu.models.transformer import TransformerConfig
from sgc_tpu.textgraph.graph import TextCorpus
from sgc_tpu.train.metrics import f1_weighted
from sgc_tpu.train.sequence import (
    SeqTrainConfig,
    predict_sequence,
    train_sequence_classifier,
)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--metadata", required=True)
    p.add_argument("--corpus", required=True)
    p.add_argument("--max_len", type=int, default=256)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--vocab_size", type=int, default=30000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--head_only", action="store_true",
                   help="freeze encoder, train classifier head only")
    p.add_argument("--seed", type=int, default=42)
    a = p.parse_args()

    tc = TextCorpus.from_files(a.metadata, a.corpus)
    label_to_idx = {l: i for i, l in enumerate(tc.label_names)}
    y = np.asarray([label_to_idx[l] for l in tc.labels], np.int32)
    is_train = np.asarray([ph == "train" for ph in tc.phases])

    train_docs = [d for d, t in zip(tc.doc_tokens, is_train) if t]
    test_docs = [d for d, t in zip(tc.doc_tokens, is_train) if not t]
    y_train, y_test = y[is_train], y[~is_train]

    model_cfg = TransformerConfig(
        vocab_size=a.vocab_size, n_classes=len(tc.label_names),
        max_len=a.max_len, dim=a.dim, n_heads=a.heads, n_layers=a.layers,
        dropout=a.dropout,
    )
    params, vocab = train_sequence_classifier(
        train_docs, y_train, model_cfg,
        SeqTrainConfig(
            lr=a.lr, epochs=a.epochs, batch_size=a.batch_size,
            dropout=a.dropout, head_only=a.head_only, seed=a.seed,
        ),
    )
    preds = predict_sequence(params, test_docs, vocab, a.max_len)
    acc = float((preds == y_test).mean())
    weighted = f1_weighted(preds, y_test)
    print(f"Test accuracy: {acc:.4f}  weighted-F1: {weighted:.4f}")


if __name__ == "__main__":
    main()
