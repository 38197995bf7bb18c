"""Hugepage-backed zero buffers for multi-GB host staging arrays.

Measured on the round-3 build machine (4-vCPU VM, 125 GB): once a
process holds a few GB of RSS, anonymous-memory first-touch faults slow
from ~1 us to ~27 us per 4 KiB page — a fresh 2.7 GB cell buffer then
costs ~15-30 s just to fault in (the entire round-2 "host prep 50 s vs
12 s" irreproducibility, VERDICT round-2 #2: the cost depended on how
much memory the process happened to hold). Two levers fix it:

* madvise(MADV_HUGEPAGE): 2 MiB pages cut the fault count 512x — THP is
  madvise-mode on standard kernels, so plain np.zeros never gets huge
  pages and the hint is required. First allocation: ~30 s -> ~1.5 s.
* a buffer POOL: even hugepage faults degrade once memory fragments
  (compaction stalls on later allocations). Re-zeroing an
  already-faulted buffer runs at memset bandwidth (~0.4 s for 2.7 GB
  here), so freed buffers are kept (weakref-tracked) and reused instead
  of round-tripping pages through the kernel.

Used for the block-dense cell buffers (ops/spmm_blockdense.py,
parallel/blockdense.py). Falls back to np.zeros when mmap/madvise is
unavailable (non-Linux, exotic kernels) — behavior is identical, only
fault cost differs. SGC_TPU_ALLOC_POOL_GB caps pooled bytes (default 8;
0 disables pooling).
"""

from __future__ import annotations

import ctypes
import mmap
import os
import weakref

import numpy as np

MADV_HUGEPAGE = 14  # linux/mman.h

_libc = None
# (mmap, nbytes, weakref-to-last-returned-array); an entry is reusable
# once its array has been garbage collected
_POOL: list = []

import threading as _threading

_POOL_LOCK = _threading.Lock()


def _get_libc():
    global _libc
    if _libc is None:
        try:
            _libc = ctypes.CDLL(None, use_errno=True)
        except OSError:
            _libc = False
    return _libc


def _pool_cap_bytes() -> int:
    return int(float(os.environ.get("SGC_TPU_ALLOC_POOL_GB", "8")) * 2**30)


def _mmap_hugepage(nbytes: int):
    m = mmap.mmap(-1, nbytes)  # anonymous private, zero-filled
    libc = _get_libc()
    if libc:
        addr = ctypes.addressof(ctypes.c_char.from_buffer(m))
        libc.madvise(ctypes.c_void_p(addr), ctypes.c_size_t(nbytes),
                     MADV_HUGEPAGE)
    return m


_COMPACT_TS = 0.0
_LAST_PROBE = None   # (monotonic_ts, result dict) — probe result reuse


def fault_rate_probe(nbytes: int = 256 << 20) -> float:
    """Measured first-touch fault throughput (M faults/s) on a fresh
    anonymous region — the health probe for DESIGN §2e's fault wall.
    Healthy: ~1 M/s (1 us/page). Degraded: ~0.04-0.2 M/s (5-27 us/page)
    — a fresh 2.7 GB buffer then costs ~4-20 s to touch.

    256 MB default: the degradation is SIZE-dependent (small regions
    stay fast while multi-GB regions crawl — measured 1.6 M/s on a
    64 MB probe in the same minute a 2 GB touch ran at 0.05 M/s), so a
    small probe reports healthy while the multi-GB prep buffers pay the
    wall. The root cause is (at least partly) OUTSIDE the guest:
    /proc/buddyinfo showed 40 GB of free order-10 blocks while the wall
    was active, and guest compaction did not move it — consistent with
    hypervisor-side memory pressure on this VM. The probe therefore
    MEASURES and reports; it cannot always fix (see ensure_fault_rate).
    """
    import time

    a = np.empty(nbytes, np.uint8)
    t0 = time.perf_counter()
    a[::4096] = 1
    return nbytes / 4096 / (time.perf_counter() - t0) / 1e6


def ensure_fault_rate(min_mfaults: float = 0.8,
                      min_interval_s: float = 60.0) -> dict:
    """Probe the fault rate; if degraded, trigger kernel memory
    compaction (``/proc/sys/vm/compact_memory`` — root-only, best-effort)
    and re-probe.

    The degraded state is MACHINE-wide and time-varying. Compaction
    helps when GUEST-side fragmentation starves THP of 2 MiB pages; on
    this build VM the wall was also observed with 40 GB of free
    order-10 blocks (hypervisor-side pressure), where compaction cannot
    help — the probe's value then is ATTRIBUTION: the measured rates
    ride in prep_seconds / the bench plan block, so a slow driver run
    is explainable from the JSON instead of looking like a regression.

    Returns {"rate_before", "rate_after", "compacted"} for logging.
    SGC_TPU_NO_COMPACT=1 disables the write (probe only).
    """
    import time
    global _COMPACT_TS, _LAST_PROBE

    # the probe itself costs ~0.05-0.3 s (256 MB of fresh faults) —
    # callers like build_halo run in tight test loops, so reuse a recent
    # verdict instead of re-faulting every call
    now = time.monotonic()
    if _LAST_PROBE is not None and now - _LAST_PROBE[0] < min_interval_s:
        return dict(_LAST_PROBE[1])
    rate = fault_rate_probe()
    out = {"rate_before": round(rate, 3), "rate_after": round(rate, 3),
           "compacted": False}
    _LAST_PROBE = (now, dict(out))
    if rate >= min_mfaults or os.environ.get("SGC_TPU_NO_COMPACT") == "1":
        return out
    if now - _COMPACT_TS < min_interval_s:
        return out
    try:
        with open("/proc/sys/vm/compact_memory", "w") as f:
            f.write("1")
    except OSError:
        return out
    _COMPACT_TS = time.monotonic()
    out["compacted"] = True
    out["rate_after"] = round(fault_rate_probe(), 3)
    _LAST_PROBE = (now, dict(out))
    return out


def _prefault_parallel(m, nbytes: int) -> None:
    """Touch one byte per 4 KiB page, split across threads.

    Lazily-faulting a multi-GB buffer from the CONSUMER (e.g. the native
    cell scatter) serializes the fault cost into whatever loop touches
    it first; in the degraded high-RSS state (27 us/page, DESIGN §2e)
    that is ~20 s for 2.7 GB even with MADV_HUGEPAGE advised, because a
    fragmented kernel falls back to 4 KiB pages. Faulting up front in
    parallel bounds that worst case at (pages x 27 us / threads) and
    costs only a strided pass (~0.1 s) when THP is healthy.
    """
    import concurrent.futures as cf

    buf = np.frombuffer(m, dtype=np.uint8)
    n_workers = min(os.cpu_count() or 1, 8)
    chunk = max(nbytes // n_workers, 1 << 20)

    def touch(lo):
        buf[lo:min(lo + chunk, nbytes):4096] = 0

    starts = range(0, nbytes, chunk)
    if len(starts) <= 1:
        touch(0)
        return
    with cf.ThreadPoolExecutor(max_workers=n_workers) as ex:
        list(ex.map(touch, starts))


def zeros_hugepage(n_elems: int, dtype) -> np.ndarray:
    """Zero-initialized 1-D array backed by MADV_HUGEPAGE'd anonymous
    mmap, reusing pooled buffers when available; falls back to
    ``np.zeros`` if anything is unavailable.

    The returned array keeps its mmap alive via ``.base``; it is
    writable, C-contiguous, and page-aligned (mmap guarantees).
    """
    dtype = np.dtype(dtype)
    nbytes = int(n_elems) * dtype.itemsize
    if nbytes < (64 << 20):  # small buffers don't hit the fault wall
        return np.zeros(n_elems, dtype)

    # reuse: smallest free pooled buffer that fits without >2x waste
    # (_POOL_LOCK: prewarm_pool_async races the real request)
    with _POOL_LOCK:
        best = None
        for entry in _POOL:
            m, size, ref = entry
            if ref() is None and nbytes <= size <= 2 * nbytes:
                if best is None or size < best[1]:
                    best = entry
        if best is not None:
            m, size, _ = best
            arr = np.frombuffer(m, dtype=dtype, count=n_elems)
            best[2] = weakref.ref(arr)
    if best is not None:
        arr[:] = dtype.type(0)   # memset-speed: pages already faulted
        return arr

    try:
        m = _mmap_hugepage(nbytes)
        arr = np.frombuffer(m, dtype=dtype, count=n_elems)
        _prefault_parallel(m, nbytes)
    except (OSError, ValueError):
        return np.zeros(n_elems, dtype)

    if _pool_cap_bytes() > 0:
        with _POOL_LOCK:
            _POOL.append([m, nbytes, weakref.ref(arr)])
            # evict oldest dead entries beyond the cap (live entries are
            # owned by their arrays and cost the pool nothing extra)
            total = sum(e[1] for e in _POOL)
            for e in list(_POOL):
                if total <= _pool_cap_bytes():
                    break
                if e[2]() is None:
                    _POOL.remove(e)
                    total -= e[1]
    return arr
