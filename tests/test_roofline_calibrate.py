"""Roofline accounting + admission-rate calibration (round 3)."""

import numpy as np
import pytest

from sgc_tpu.graph.sparse import SparseGraph
from sgc_tpu.ops.roofline import (
    default_peaks,
    dense_term_cost,
    remainder_cost,
    roofline_report,
)
from sgc_tpu.ops.spmm_blockdense import split_block_dense


def _split(min_edges=0):
    rng = np.random.default_rng(0)
    n, e = 512, 6000
    r = rng.integers(0, 128, e)   # one dense corner
    c = rng.integers(0, 128, e)
    g = SparseGraph.from_coo(r, c, rng.random(e).astype(np.float32),
                             n, n, device=False)
    return split_block_dense(g, 64, row_block=128, stripe=128,
                             min_edges=min_edges)


def test_dense_term_cost_arithmetic():
    split = _split()
    d = dense_term_cost(split, 64, feature_tile=128, form="pallas")
    n_cells = int(split.cells.shape[0])
    # one f-tile (64 -> pad 128): cells bf16 + bf16 stripes + f32 out
    expect = (n_cells * 128 * 128 * 2 + n_cells * 128 * 128 * 2
              + split.n_row_blocks * 128 * 128 * 4)
    assert d["bytes"] == float(expect)
    assert d["flops_useful"] == 2.0 * split.dense_edges * 64
    # scan form moves strictly more bytes
    assert dense_term_cost(split, 64, 128, form="scan")["bytes"] > d["bytes"]


def test_roofline_report_sane_fractions():
    split = _split()
    rep = roofline_report(split, 64, dense_s=0.01, rest_s=0.005,
                          dispatch_s=0.001)
    assert rep["dense"]["bytes"] > 0   # tiny split: GB/s rounds to 0.0
    assert 0 <= rep["dense"]["hbm_frac"] < 10
    assert rep["dense"]["mxu_frac_useful"] <= rep["dense"]["mxu_frac_padded"]
    assert rep["remainder"]["edges"] == (split.rest.nnz
                                         if split.rest else 0)
    assert rep["peaks"] == default_peaks()


def test_roofline_zero_cells_guarded():
    split = _split(min_edges=1e9)
    assert split.n_cells == 0
    rep = roofline_report(split, 64, dense_s=0.0, rest_s=0.004,
                          dispatch_s=0.001)
    assert rep["dense"]["achieved_gbps"] == 0.0
    assert rep["dense"]["bytes"] == 0.0
    assert rep["remainder"]["edges_per_s"] > 0


def test_measured_rates_fallback_and_cache(monkeypatch, tmp_path):
    import sgc_tpu.ops.calibrate as cal

    monkeypatch.setenv("SGC_TPU_NO_CALIBRATE", "1")
    r = cal.measured_rates()
    assert not r["probed"]
    from sgc_tpu.ops.spmm_blockdense import BLOCKDENSE_EFF_FLOPS
    assert r["blockdense_eff_flops"] == BLOCKDENSE_EFF_FLOPS

    # disk cache round-trip (no probing: pre-seeded file)
    monkeypatch.delenv("SGC_TPU_NO_CALIBRATE")
    monkeypatch.setenv("SGC_TPU_CALIBRATE_CACHE", str(tmp_path))
    monkeypatch.setattr(cal, "_RATES", None)
    import json
    with open(cal._cache_path(), "w") as f:
        json.dump({"blockdense_eff_flops": 1e13, "xla_edges_per_s": 5e7,
                   "probed": True}, f)
    r2 = cal.measured_rates()
    assert r2["xla_edges_per_s"] == 5e7 and r2["probed"]
    monkeypatch.setattr(cal, "_RATES", None)


def test_calibrated_rates_probe_on_cpu(monkeypatch, tmp_path):
    """The actual probes run (CPU backend, tiny): rates positive, cached
    to disk, and min_edges_for consumes them."""
    import sgc_tpu.ops.calibrate as cal
    from sgc_tpu.ops.spmm_blockdense import min_edges_for

    monkeypatch.setenv("SGC_TPU_CALIBRATE_CACHE", str(tmp_path))
    monkeypatch.setattr(cal, "_RATES", None)
    monkeypatch.setattr(cal, "PROBE_CELLS", (4, 16))
    monkeypatch.setattr(cal, "PROBE_EDGES", (20_000, 120_000))
    monkeypatch.setattr(cal, "PROBE_F", 64)
    r = cal.measured_rates(force=True)
    if not r["probed"]:
        pytest.skip("probe not separable on this CI machine")
    assert r["blockdense_eff_flops"] > 0
    assert r["xla_edges_per_s"] > 0
    me = min_edges_for(128, 128, 64,
                       eff_flops=r["blockdense_eff_flops"],
                       xla_edges_per_s=r["xla_edges_per_s"])
    assert me > 0
    monkeypatch.setattr(cal, "_RATES", None)
