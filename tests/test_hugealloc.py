"""Hugepage numpy-allocator handler (sgc_tpu/native/hugealloc.cpp).

The handler fixes the first-touch fault wall that made host prep
irreproducible (docs/DESIGN.md §2e; VERDICT round-3 #1): every numpy
allocation >= 64 MB is backed by an MADV_HUGEPAGE anonymous mmap.
These tests pin the allocator-contract behavior — routing by size,
data integrity across realloc paths in both threshold directions,
idempotent install/uninstall — against numpy's own handler-name
introspection (an independent oracle: numpy records which handler
allocated each array).
"""

from __future__ import annotations

import numpy as np
import pytest

from sgc_tpu.native import hugealloc

pytestmark = pytest.mark.skipif(
    not hugealloc.installed() and not hugealloc.install(),
    reason="hugealloc extension unavailable (no compiler?)",
)


def _handler_name(arr) -> str:
    import numpy._core.multiarray as m

    return m.get_handler_name(arr)


def test_large_allocations_use_handler():
    thresh = hugealloc.stats()["threshold_bytes"]
    big = np.zeros(thresh // 8 + 16, np.float64)
    assert _handler_name(big) == "sgc_tpu_hugepage_allocator"
    # mmap-backed allocations are zero-filled without an explicit memset
    assert big[:100].sum() == 0.0 and big[-100:].sum() == 0.0


def test_small_allocations_also_route_but_malloc_backed():
    small = np.arange(128)
    # same handler name (routing is internal), contents intact
    assert _handler_name(small) == "sgc_tpu_hugepage_allocator"
    assert small.sum() == 128 * 127 // 2


def test_huge_alloc_counter_moves():
    before = hugealloc.stats()["huge_total_allocs"]
    a = np.empty(100 * 2**20, np.uint8)  # 100 MB > 64 MB threshold
    after = hugealloc.stats()
    assert after["huge_total_allocs"] > before
    assert after["huge_live"] >= 1
    del a


def test_resize_shrink_across_threshold_preserves_data():
    a = np.zeros(100 * 2**20, np.uint8)
    a[:64] = np.arange(64, dtype=np.uint8)
    a.resize(4096, refcheck=False)  # huge -> small realloc
    assert (a[:64] == np.arange(64, dtype=np.uint8)).all()


def test_resize_grow_across_threshold_preserves_and_zeroes():
    a = np.zeros(4096, np.uint8)
    a[:64] = np.arange(64, dtype=np.uint8)
    a.resize(100 * 2**20, refcheck=False)  # small -> huge realloc
    assert (a[:64] == np.arange(64, dtype=np.uint8)).all()
    # numpy zero-fills the grown tail
    assert a[4096:].sum() == 0


def test_resize_within_huge_uses_mremap_path():
    a = np.zeros(80 * 2**20, np.uint8)
    a[:8] = 7
    a.resize(160 * 2**20, refcheck=False)  # huge -> huge
    assert (a[:8] == 7).all() and a[8 : 2**20].sum() == 0
    assert _handler_name(a) == "sgc_tpu_hugepage_allocator"


def test_install_idempotent_and_uninstall_restores():
    assert hugealloc.install() is False  # already active
    assert hugealloc.uninstall() is True
    try:
        fresh = np.zeros(70 * 2**20, np.uint8)
        assert _handler_name(fresh) != "sgc_tpu_hugepage_allocator"
        # arrays allocated while active still free through the old
        # handler (numpy tracks per-array) — exercised implicitly by gc
    finally:
        assert hugealloc.install() is True
