"""Tests: COVID-19 Scopus dataset preparation pipeline."""

import csv

import numpy as np

from sgc_tpu.data.covid import (
    CovidPrepConfig,
    parse_subject_areas,
    prepare_covid_dataset,
)


def test_parse_subject_areas():
    raw = "('Virology', 'Medicine all', 'Public Health')"
    assert parse_subject_areas(raw) == [
        "Virology", "Medicine all", "Public Health"
    ]
    assert parse_subject_areas("('None',)") == []


def _write_csv(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["id", "title", "abstract", "subject_areas"]
        )
        w.writeheader()
        w.writerows(rows)


def test_full_prep(tmp_path):
    rows = []
    # 10 virology papers, 5 immunology, 1 rare-label paper, 1 null row
    for i in range(10):
        rows.append({
            "id": f"v{i}", "title": f"virus study {i}",
            "abstract": f"about viruses {i}",
            "subject_areas": "('Virology', 'Medicine all')",
        })
    for i in range(5):
        rows.append({
            "id": f"i{i}", "title": f"immune study {i}",
            "abstract": f"about immunity {i}",
            "subject_areas": "('Immunology',)",
        })
    rows.append({
        "id": "r0", "title": "rare", "abstract": "rare topic",
        "subject_areas": "('Astrophysics',)",
    })
    rows.append({
        "id": "n0", "title": "no abstract", "abstract": "",
        "subject_areas": "('Virology',)",
    })
    src = tmp_path / "scopus.csv"
    _write_csv(src, rows)

    res = prepare_covid_dataset(
        src, tmp_path / "out", dataset_name="covid_test",
        config=CovidPrepConfig(top_n=2), write_doc_files=True,
    )
    # top-2 labels keep Virology(10) + Immunology(5); rare + null dropped
    assert res.label_counts == {"Virology": 10, "Immunology": 5}
    # ceil(0.8*10)=8 train, ceil(0.8*5)=4 train
    assert res.n_train == 12 and res.n_test == 3

    meta = res.metadata_path.read_text().strip().split("\n")
    corpus = res.corpus_path.read_text().strip().split("\n")
    assert len(meta) == 15 and len(corpus) == 15
    cols = [l.split("\t") for l in meta]
    assert all(len(c) == 3 for c in cols)
    assert {c[1] for c in cols} == {"train", "test"}
    # "Medicine all" never becomes a label even though it's in every row
    assert all(c[2] != "Medicine all" for c in cols)
    # per-doc files written where the metadata paths point
    assert (tmp_path / "out" / "data" / "covid_test" / "train").exists()

    # metadata resolves directly against out_dir (no rewrite hook needed)
    from sgc_tpu.textgraph.clean import build_corpus_file

    docs2 = build_corpus_file(
        res.metadata_path, tmp_path / "roundtrip.txt",
        doc_root=tmp_path / "out",
    )
    assert len(docs2) == 15

    # deterministic: rerun produces identical metadata
    res2 = prepare_covid_dataset(
        src, tmp_path / "out2", dataset_name="covid_test",
        config=CovidPrepConfig(top_n=2),
    )
    assert res2.metadata_path.read_text() == res.metadata_path.read_text()


def test_feeds_build_graph(tmp_path):
    rows = []
    rng = np.random.default_rng(0)
    for i in range(20):
        lab = "Virology" if i % 2 == 0 else "Immunology"
        word = "virus" if i % 2 == 0 else "antibody"
        rows.append({
            "id": f"p{i}", "title": f"{word} paper",
            "abstract": " ".join([word] * 8),
            "subject_areas": f"('{lab}',)",
        })
    src = tmp_path / "scopus.csv"
    _write_csv(src, rows)
    res = prepare_covid_dataset(src, tmp_path, dataset_name="cvd")

    from sgc_tpu.cli.build_graph import build_and_export

    built = build_and_export(
        str(res.metadata_path), str(res.corpus_path), "cvd", str(tmp_path),
        window=4, val_fraction=0.0,
    )
    assert built["adjs"]["BCD"].nnz > 0
    assert len(built["label_names"]) == 2
