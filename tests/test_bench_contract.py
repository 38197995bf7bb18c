"""The bench stdout contract: ONE compact JSON line the driver's bounded
tail capture always parses (VERDICT round-4 #1 — BENCH_r04's 4.1k-char
line overflowed the 2k tail and the round's headline was lost).

``bench.compact_summary`` projects the fat audit dict onto the compact
line; the fat dict itself goes to ``bench_details.json``. The test feeds
a payload shaped like the real round-4 output (comm sweep, roofline,
sharded-plan stats all populated) and pins the serialized length.
"""

import json

import bench


def _fat_out() -> dict:
    """Synthetic dict mirroring the real BENCH_r04 payload's bulk."""
    sweep_rows = [
        {"devices": d, "fabric": f, "gbps": g, "halo_width": 7288,
         "ici_bytes_per_hop_halo": 544034624,
         "ici_bytes_per_hop_allgather": 544034624,
         "efficiency_halo": 0.41, "efficiency_allgather": 0.24,
         "winner": "halo"}
        for d in (2, 4, 8, 16, 32, 64)
        for f, g in (("ici", 180.0), ("dcn", 25.0))
    ]
    return {
        "metric": "reddit_sgc_precompute_train_s",
        "value": 0.1674,
        "unit": "s",
        "vs_baseline": 16.129,
        "edges_per_s": 145_000_000,
        "ici_bytes_per_hop": 544034624,
        "projected_scaling": {
            "comm_sweep": {"rows": sweep_rows,
                           "first_below_target": sweep_rows[-1],
                           "sweep_build_s": 3.5},
            "sharded_blockdense_plan": {
                "n_parts": 8, "dense_fraction": 0.823, "n_cells": 4141,
                "cells_interior_width": 512, "cells_boundary_width": 128,
                "build_s": 19.9, "partition_s": 2.1, "halo_s": 1.4,
                "cells_s": 16.4,
                "fault_probe": {"rate_before": 1.54, "rate_after": 1.54,
                                "compacted": False}},
            "rate_formulation": "blockdense_pallas",
        },
        "data": ("synthetic clustered (85% intra, 50 communities, "
                 "shuffled ids; lpa reorder + blockdense_pallas MXU/XLA "
                 "split — real Reddit's regime)"),
        "formulation": "blockdense_pallas",
        "dense_frac": 0.851,
        "host_prep_s": 26.3,
        "prep_seconds": {
            "fault_mrate_before": 1.54, "fault_mrate_after": 1.54,
            "order_s": 4.6, "apply_s": 0.0, "subgraph_s": 0.47,
            "split_s": 21.15, "order_minflt_m": 0.91, "split_minflt_m": 1.62,
            "split_rss_gb": 3.1, "order_rss_gb": 1.2,
        },
        "native_available": True,
        "hugealloc_installed": True,
        "trainer": "newton",
        "train_parity": {
            "trainer": "newton", "newton_loss": 3.63408,
            "lbfgs_loss": 3.63417, "newton_train_acc": 0.5549,
            "lbfgs_train_acc": 0.5549, "chance_acc": 0.0244,
        },
        "nproc": 4,
        "admission_rates": {"blockdense_eff_flops": 3.59e13,
                            "xla_edges_per_s": 3.55e7, "probed": True},
        "roofline": {
            "form": "pallas", "dispatch_s": 0.024,
            "dense": {"seconds": 0.0411, "bytes": 6402768896.0,
                      "achieved_gbps": 375.1, "hbm_frac": 0.458,
                      "mxu_frac_padded": 0.481, "mxu_frac_useful": 0.0036},
            "remainder": {"seconds": 0.073, "edges": 1746317,
                          "bytes": 4787066860.0, "achieved_gbps": 97.6,
                          "hbm_frac": 0.119, "edges_per_s": 35621488},
            "peaks": {"hbm_gbps": 819.0, "bf16_tflops": 197.0},
        },
        "uniform_segment_s": 0.643,
        "vs_baseline_uniform_segment": 4.199,
        "uniform_edges_per_s": 37750858,
        "vs_baseline_uniform": 4.869,
        "uniform_auto_s": 0.5545,
        "uniform_auto_formulation": "blockdense_pallas",
        "uniform_auto_dense_frac": 0.071,
    }


def test_compact_line_fits_driver_tail():
    out = _fat_out()
    line = json.dumps(bench.compact_summary(out, "bench_details.json"))
    assert len(line) <= bench.COMPACT_MAX_CHARS, (
        f"compact line {len(line)} chars exceeds the driver budget")
    # and comfortably inside a 2000-char tail capture even with a
    # trailing newline + json indent drift
    assert len(line) <= 1500


def test_compact_line_carries_driver_fields():
    out = _fat_out()
    c = json.loads(json.dumps(bench.compact_summary(out, "d.json")))
    assert c["metric"] == "reddit_sgc_precompute_train_s"
    assert c["value"] == 0.1674
    assert c["unit"] == "s"
    assert c["vs_baseline"] == 16.129
    assert c["edges_per_s"] == 145_000_000
    assert c["host_prep_s"] == 26.3
    assert c["uniform_auto_s"] == 0.5545
    assert c["vs_baseline_uniform"] == 4.869
    # per-stage prep attribution (incl. the fault counters) must ride in
    # the compact line — the ≤15 s bar is judged from it
    assert c["prep_seconds"]["split_s"] == 21.15
    assert c["prep_seconds"]["fault_mrate_before"] == 1.54
    assert c["prep_seconds"]["split_minflt_m"] == 1.62
    assert c["train_parity"]["newton_train_acc"] == 0.5549
    assert c["details"] == "d.json"
    # the audit bulk must NOT be on the line
    assert "projected_scaling" not in c
    assert "roofline" not in c
    assert "comm_sweep" not in json.dumps(c)


def test_compact_line_minimal_input():
    # uniform-only run: no clustered fields at all
    out = {"metric": "m", "value": 1.0, "unit": "s", "vs_baseline": 2.7,
           "edges_per_s": 1}
    c = bench.compact_summary(out, "bench_details.json")
    assert c["value"] == 1.0 and "prep_seconds" not in c
