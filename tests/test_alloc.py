"""Hugepage-backed staging buffers (utils/alloc.py)."""

import numpy as np

from sgc_tpu.utils.alloc import zeros_hugepage


def test_zeros_hugepage_small_and_large():
    small = zeros_hugepage(1024, np.float32)
    assert small.shape == (1024,) and (small == 0).all()
    big = zeros_hugepage(80 << 20, np.dtype("bfloat16"))  # 160 MB
    assert big.nbytes == (80 << 20) * 2
    assert big.flags.c_contiguous and big.flags.writeable
    v = big.view(np.uint16)
    assert (v[:: 1 << 16] == 0).all()
    v[7] = 0x8000                 # writable through the view
    assert v[7] == 0x8000


def test_zeros_hugepage_feeds_split_block_dense():
    from sgc_tpu.graph.sparse import SparseGraph
    from sgc_tpu.ops.spmm_blockdense import split_block_dense

    rng = np.random.default_rng(0)
    n, e = 512, 4000
    g = SparseGraph.from_coo(
        rng.integers(0, n, e), rng.integers(0, n, e),
        rng.standard_normal(e).astype(np.float32), n, n, device=False)
    split = split_block_dense(g, 16, row_block=128, stripe=128, min_edges=0)
    assert split.n_cells > 0
    assert split.cells.dtype == np.dtype("bfloat16")


def test_zeros_hugepage_pool_reuses_freed_buffers():
    import sgc_tpu.utils.alloc as alloc

    n = (70 << 20)  # 140 MB of uint16 — above the pooling threshold
    a = alloc.zeros_hugepage(n, np.uint16)
    a[5] = 3
    base_id = id(a.base)
    del a
    b = alloc.zeros_hugepage(n, np.uint16)
    # same backing mmap reused, and rezeroed
    assert id(b.base) == base_id
    assert b[5] == 0

    # a LIVE array must never be handed out again
    c = alloc.zeros_hugepage(n, np.uint16)
    assert id(c.base) != id(b.base)
    # views keep the weakref target alive (reshape chain)
    view = b.reshape(-1, 1 << 10)
    del b
    d = alloc.zeros_hugepage(n, np.uint16)
    assert id(d.base) != id(view.base.base if view.base.base is not None
                            else view.base)
    assert view[0, 0] == 0  # still valid memory


def test_prefault_leaves_buffer_zero():
    """Parallel pre-fault touches every page but the buffer must still
    read as zeros (it writes zero bytes) across all chunk boundaries."""
    import sgc_tpu.utils.alloc as alloc

    a = alloc.zeros_hugepage(96 << 20, np.uint8)  # 96 MB, > pool floor
    assert a[::4096].max() == 0                   # the touched bytes
    assert a[:4096].max() == 0 and a[-4096:].max() == 0
    stride = a.nbytes // 17
    assert all(int(a[i]) == 0 for i in range(0, a.nbytes, stride))


def test_fault_rate_probe_and_ensure():
    import sgc_tpu.utils.alloc as alloc

    r = alloc.fault_rate_probe(16 << 20)
    assert r > 0
    # probe-only path must never write to /proc (env gate). Reset the
    # module probe cache: earlier suite tests (fit_sharded/staging) may
    # have left a recent probe — the RATE may be reused but the verdict
    # must be recomputed against THIS call's args (round-4 advisor).
    import os

    alloc._LAST_PROBE = None
    alloc._COMPACT_TS = 0.0
    os.environ["SGC_TPU_NO_COMPACT"] = "1"
    try:
        out = alloc.ensure_fault_rate(min_mfaults=1e9)  # force "degraded"
        assert out["compacted"] is False
        assert out["rate_before"] == out["rate_after"] > 0
    finally:
        del os.environ["SGC_TPU_NO_COMPACT"]


def test_ensure_fault_rate_cached_verdict_honors_caller_args():
    """A cached probe must never leak the PREVIOUS caller's verdict:
    with a fresh rate cached, a NO_COMPACT caller and a healthy-threshold
    caller must both get compacted=False even if an earlier call (other
    args) compacted (round-4 advisor, order-dependent full-suite fail)."""
    import os

    import sgc_tpu.utils.alloc as alloc

    alloc._LAST_PROBE = None
    alloc._COMPACT_TS = 0.0
    first = alloc.ensure_fault_rate(min_mfaults=0.0)   # always healthy
    assert first["compacted"] is False
    # cached rate is reused, but each call's gate is its own
    os.environ["SGC_TPU_NO_COMPACT"] = "1"
    try:
        again = alloc.ensure_fault_rate(min_mfaults=1e9)
        assert again["compacted"] is False
        assert again["rate_before"] == first["rate_before"]
    finally:
        del os.environ["SGC_TPU_NO_COMPACT"]


def test_prewarm_pool_distinct_arenas_and_reuse_caps():
    """prewarm_pool must leave one FREE arena per requested size (an
    early release let the next size slice the previous arena — the pool
    then came up one arena short and the real cell buffer faulted fresh
    inside the timed prep, round-5 bench trace), and loose reuse is
    capped at 4x waste so a small buffer cannot steal a big arena."""
    import sgc_tpu.utils.alloc as alloc

    # isolate from buffers pooled by earlier tests
    old_pool = alloc._POOL[:]
    alloc._POOL.clear()
    try:
        alloc.prewarm_pool([256 << 20, 128 << 20, 1 << 20])  # 1MB skipped
        free = sorted(e[1] for e in alloc._POOL if e[2]() is None)
        assert free == [128 << 20, 256 << 20], free

        # 72MB request: 128MB arena is within 2x -> reused
        a = alloc.zeros_hugepage(72 << 20, np.uint8)
        assert a.base is not None and len(a.base) == (128 << 20)
        # 65MB request: only the 256MB arena is free, but 256/65 < 4 ->
        # loose reuse takes it
        b = alloc.zeros_hugepage(65 << 20, np.uint8)
        assert len(b.base) == (256 << 20)
        del a, b
        # >4x waste is refused: with only a 300MB arena free, a 70MB
        # request (300/70 = 4.3x) takes a FRESH mmap instead of
        # stealing the arena prewarmed for a bigger buffer
        alloc._POOL.clear()
        alloc.prewarm_pool([300 << 20])
        c = alloc.zeros_hugepage(70 << 20, np.uint8)
        assert len(c.base) == (70 << 20), len(c.base)
        assert any(e[1] == (300 << 20) and e[2]() is None
                   for e in alloc._POOL)
        del c
    finally:
        alloc._POOL.clear()
        alloc._POOL.extend(old_pool)


def test_mem_counters_deltas_attribute_fresh_faults():
    """mem_counters minflt deltas must see a fresh multi-MB first-touch
    (the per-stage attribution mechanism for host prep; VERDICT r4 #2)."""
    import sgc_tpu.utils.alloc as alloc

    before = alloc.mem_counters()
    assert before["rss_gb"] > 0          # /proc parsed
    nbytes = 64 << 20                    # 64 MB = 16384 pages
    a = np.empty(nbytes, np.uint8)
    a[::4096] = 1                        # touch every page
    after = alloc.mem_counters()
    d_m = after["minflt_m"] - before["minflt_m"]
    # >= half the touched pages must show as minor faults (THP merges
    # some 4 KiB faults into 2 MiB ones, so allow slack)
    assert d_m * 1e6 >= (nbytes / 4096) / 512 - 64, d_m
    del a
