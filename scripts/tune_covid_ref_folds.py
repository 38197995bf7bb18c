"""Per-fold wd tuning + CV on the reference's archived folds (best graph).

Mirrors the reference's own two-step protocol (tuningv2.py per-fold TPE
-> trainv2.py CV with tuned wds), but on the improved chi²+pivoted+w15
graph: the fairest "our full pipeline on their folds" number.

Usage: python scripts/tune_covid_ref_folds.py [--run_dir /tmp/covid_ref_folds_best]
Requires the graph build + reference fold pickles already in run_dir
(scripts/run_covid_ref_folds.py --best does both).
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DS = "covid_19_production"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", default="/tmp/covid_ref_folds_best")
    ap.add_argument("--max_evals", type=int, default=60)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    data_dir = Path(args.run_dir) / "data"
    if not (data_dir / f"ind.{DS}.0.train.x").exists():
        sys.exit(f"run scripts/run_covid_ref_folds.py --best first "
                 f"({data_dir} lacks fold pickles)")

    from sgc_tpu.cli.crossval import run_crossval
    from sgc_tpu.cli.tuning import tune_text

    per_fold = {}
    for k in range(5):
        best, val_acc = tune_text(
            DS, degree=2, epochs=args.epochs, max_evals=args.max_evals,
            seed=42, data_path=str(data_dir), subset="BCD", fold=k,
        )
        per_fold[k] = best["weight_decay"]
        print(f"fold {k}: tuned wd {best['weight_decay']:.4e} "
              f"(val acc {val_acc:.4f})", flush=True)

    summary = run_crossval(
        DS, folds=5, subset="BCD", epochs=args.epochs,
        per_fold_tuned=per_fold, data_path=str(data_dir),
        results_dir=str(Path(args.run_dir) / "results_retuned"),
    )
    print(json.dumps(
        {k: v for k, v in summary.items() if k != "folds"}, indent=2))
    print(
        "RETUNED REFERENCE-FOLD CV (best graph): acc {:.4f} ± {:.4f} "
        "(archived reference 0.5804 ± 0.0196)".format(
            summary["accuracy_mean"], summary["accuracy_std"]
        )
    )


if __name__ == "__main__":
    main()
