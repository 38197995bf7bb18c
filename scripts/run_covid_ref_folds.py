"""Apples-to-apples COVID 5-fold CV on the reference's archived fold ids.

VERDICT round-1 #4: the r1 5-fold number (0.5905) used our own fold ids.
This run uses the reference's exact archived per-fold id pickles
(/root/reference/downstream/TextSGC_ref/data/ind.covid_19_production.<k>.*)
and per-fold tuned weight decays (TextSGC_ref/tuned_result/), so the
result is directly comparable to the archived 0.5804 +/- 0.0196
(scored by sgc_tpu.cli.score_results over the archived results files).

Usage: python scripts/run_covid_ref_folds.py [--run_dir DIR]
The corpus+graph build (~4 min) is cached in run_dir across invocations.
"""
import argparse
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

META = Path("/root/reference/downstream/TextSGC/data/covid_19_production.txt")
DOCS = Path("/root/reference/my_data/COVID-19 Production")
REF_FOLDS = Path("/root/reference/downstream/TextSGC_ref/data")
REF_TUNED = Path("/root/reference/downstream/TextSGC_ref/tuned_result")
DS = "covid_19_production"


def build_graph(run_dir: Path, best: bool = False) -> Path:
    """Corpus clean + graph build (cached). ``best`` switches from the
    reference-faithful config (window 20, plain TF-IDF) to the improved
    one (window 15, chi-squared selection p<0.10, pivoted TF-IDF) that
    beat the reference by +1.5pp on the fixed split (RESULTS.md)."""
    data_dir = run_dir / "data"
    # stamp encodes the build config: a faithful-config cache must never
    # be silently reused for --best (and vice versa)
    tag = "best" if best else "faithful"
    stamp = data_dir / f".build_complete.{tag}"
    if stamp.exists():
        print(f"reusing {tag} graph build in {data_dir}", flush=True)
        return data_dir
    if data_dir.exists():
        import sys

        other = data_dir / (".build_complete."
                            + ("faithful" if best else "best"))
        if other.exists():
            sys.exit(f"{data_dir} holds a {other.suffix[1:]} build; use a "
                     f"different --run_dir for the {tag} config")

    from sgc_tpu.cli.build_graph import build_and_export
    from sgc_tpu.textgraph.clean import build_corpus_file, clean_corpus

    run_dir.mkdir(parents=True, exist_ok=True)
    corpus = run_dir / "covid.corpus.txt"
    clean = run_dir / "covid.clean.txt"

    def rewrite(p):
        return "/".join(p.split("/")[-2:])

    t0 = time.perf_counter()
    docs = build_corpus_file(META, corpus, doc_root=DOCS, rewrite=rewrite)
    assert len(docs) == 9187, f"corpus drifted: {len(docs)} docs"
    clean_corpus(corpus, clean, min_freq=5)
    if best:
        build_and_export(
            str(META), str(clean), DS, str(data_dir),
            window=15, pivoted=True, p_value=0.10,
            val_fraction=0.1, seed=42,
        )
    else:
        build_and_export(
            str(META), str(clean), DS, str(data_dir),
            window=20, val_fraction=0.1, seed=42,
        )
    stamp.touch()
    print(f"graph build: {time.perf_counter()-t0:.0f}s", flush=True)
    return data_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", default="/tmp/covid_ref_folds")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--best", action="store_true",
                    help="chi2+pivoted+window15 build instead of faithful")
    args = ap.parse_args()

    run_dir = Path(args.run_dir)
    data_dir = build_graph(run_dir, best=args.best)

    # reference's exact fold ids
    for f in REF_FOLDS.glob(f"ind.{DS}.*.*.x"):
        shutil.copy(f, data_dir / f.name)
    for f in REF_FOLDS.glob(f"ind.{DS}.*.*.y"):
        shutil.copy(f, data_dir / f.name)

    # reference's per-fold tuned weight decays (plain floats)
    per_fold = {}
    for k in range(5):
        p = REF_TUNED / f"{DS}.{k}.SGC_ref.tuning.txt"
        per_fold[k] = float(p.read_text().strip())
    print("per-fold tuned wd:", per_fold, flush=True)

    from sgc_tpu.cli.crossval import run_crossval

    summary = run_crossval(
        DS, folds=5, subset="BCD", epochs=args.epochs,
        per_fold_tuned=per_fold, data_path=str(data_dir),
        results_dir=str(run_dir / "results"),
    )
    print(json.dumps({
        k: v for k, v in summary.items() if k != "folds"
    }, indent=2))
    print(
        "REFERENCE-FOLD CV: acc {:.4f} ± {:.4f} (archived reference: "
        "0.5804 ± 0.0196)".format(
            summary["accuracy_mean"], summary["accuracy_std"]
        )
    )


if __name__ == "__main__":
    main()
