"""Pretrained-encoder fine-tune path with locally-built flax BERT."""

import numpy as np
import pytest

pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_bert(tmp_path_factory):
    from transformers import BertConfig, BertTokenizer
    from transformers.models.bert.modeling_flax_bert import (
        FlaxBertForSequenceClassification,
    )

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "aa", "bb", "cc", "xx", "yy", "zz"]
    vf = tmp_path_factory.mktemp("bert") / "vocab.txt"
    vf.write_text("\n".join(vocab))
    tok = BertTokenizer(vocab_file=str(vf))
    cfg = BertConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, num_labels=2,
    )
    model = FlaxBertForSequenceClassification(cfg, seed=0)
    return tok, model


def _toy_task(n=48, seed=0):
    rng = np.random.default_rng(seed)
    words = {0: ["aa", "bb", "cc"], 1: ["xx", "yy", "zz"]}
    texts, labels = [], []
    for _ in range(n):
        y = int(rng.integers(0, 2))
        texts.append(" ".join(rng.choice(words[y], 4)))
        labels.append(y)
    return texts, np.asarray(labels)


def test_finetune_learns_toy_task(tiny_bert):
    from sgc_tpu.train.finetune import FinetuneConfig, finetune_pretrained

    tok, model = tiny_bert
    texts, labels = _toy_task()
    predict, _ = finetune_pretrained(
        texts, labels, 2,
        FinetuneConfig(lr=5e-3, epochs=8, batch_size=16, max_length=8),
        tokenizer=tok, model=model,
    )
    acc = float((predict(texts) == labels).mean())
    assert acc > 0.9, f"toy fine-tune accuracy {acc}"


def test_head_only_mask_structure(tiny_bert):
    from sgc_tpu.train.finetune import _head_mask

    _, model = tiny_bert
    mask = _head_mask(model.params)
    import jax

    leaves_with_path = jax.tree_util.tree_flatten_with_path(mask)[0]
    head = [v for p, v in leaves_with_path if "classifier" in str(p).lower()]
    enc = [v for p, v in leaves_with_path if "classifier" not in str(p).lower()]
    assert head and all(float(np.ravel(v)[0]) == 1.0 for v in head)
    assert enc and all(float(np.ravel(v)[0]) == 0.0 for v in enc)


def test_head_mask_rejects_unrecognized_structure():
    from sgc_tpu.train.finetune import _head_mask

    with pytest.raises(ValueError, match="no classification-head"):
        _head_mask({"encoder": {"w": np.zeros(2)}})


def test_head_mask_recognizes_xlnet_style_names():
    from sgc_tpu.train.finetune import _head_mask

    params = {
        "transformer": {"w": np.zeros(2)},
        "logits_proj": {"kernel": np.zeros(2)},
    }
    mask = _head_mask(params)
    assert float(np.ravel(mask["logits_proj"]["kernel"])[0]) == 1.0
    assert float(np.ravel(mask["transformer"]["w"])[0]) == 0.0
