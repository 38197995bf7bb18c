"""Observability: structured timers, throughput counters, device profiling.

The reference's tracing is bare perf_counter prints (SURVEY.md §5:
utils.py:93-96, citation.py:43-51). Here the same timing contract
(precompute / train / total seconds) is kept but made structured, and
per-op hardware-meaningful counters are added: SpMM edges/s, effective
HBM GB/s, and optional jax.profiler traces for Perfetto/XProf.

On asynchronous backends (TPU through a dispatch tunnel)
``block_until_ready`` can return before execution completes; ``sync()``
forces completion by reducing to a scalar and fetching it — use it around
anything you time.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


def sync(tree) -> None:
    """Force execution of every array in ``tree`` (fetches 1 scalar each)."""
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "dtype"):
            jnp.sum(leaf).item() if leaf.dtype != bool else bool(jnp.any(leaf))


def bench_timeit(name: str, fn, reps: int = 5, emit=print):
    """Warm once, run ``reps`` sync-closed repetitions, print min/median.

    The canonical micro-timing discipline for this backend (one untimed
    warm call absorbs compile; every timed region is closed by ``sync``
    because ``block_until_ready`` can return early here — module
    docstring). Returns the last output so callers can chain results.
    Shared by the scripts/exp_*.py measurement harnesses.
    """
    out = fn()
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    emit(f"{name:32s} min {min(ts) * 1e3:7.1f} ms  "
         f"med {sorted(ts)[len(ts) // 2] * 1e3:7.1f} ms")
    return out


@dataclass
class Metrics:
    """Accumulates named timings and counters; printable / JSON-able."""

    timings: dict = field(default_factory=dict)
    counters: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def timer(self, name: str):
        """Time a block. Yields a holder: assign the block's output to
        ``holder.result`` and the exit syncs it (async backends) — a
        ``result=`` parameter evaluated at entry could never see a value
        computed inside the block.

        Usage::

            with metrics.timer("precompute") as t:
                t.result = spmm(graph, x)
        """
        import types

        holder = types.SimpleNamespace(result=None)
        t0 = time.perf_counter()
        yield holder
        if holder.result is not None:
            sync(holder.result)
        self.timings[name] = self.timings.get(name, 0.0) + (
            time.perf_counter() - t0
        )

    def count(self, name: str, value: float) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    def spmm_rate(self, nnz: int, hops: int, timing_key: str = "precompute"):
        """edges/s for ``hops`` SpMM passes recorded under ``timing_key``."""
        t = self.timings.get(timing_key, 0.0)
        return (nnz * hops / t) if t > 0 else 0.0

    def report(self) -> dict:
        return {"timings_s": dict(self.timings), "counters": dict(self.counters)}

    def __str__(self) -> str:
        return json.dumps(self.report(), indent=2, default=float)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace context (no-op when log_dir is None).

    View with XProf / TensorBoard profile plugin, or convert to Perfetto.
    """
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def effective_bandwidth_gbs(bytes_moved: float, seconds: float) -> float:
    return bytes_moved / seconds / 1e9 if seconds > 0 else 0.0


class ScalarWriter:
    """Append-only scalar event log (the SummaryWriter analog).

    The reference logs train-loss scalars to TensorBoard
    (TextSGC_Bio/trainv2.py:62,82,107-108); here events are one JSON line
    each — {"step", "tag", "value", "wall"} — trivially greppable and
    importable into TensorBoard/Perfetto offline.
    """

    def __init__(self, path):
        from pathlib import Path

        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(
            json.dumps(
                {"step": step, "tag": tag, "value": float(value),
                 "wall": time.time()}
            ) + "\n"
        )

    def scalars(self, tag: str, values, start_step: int = 0) -> None:
        for i, v in enumerate(values):
            self.scalar(tag, v, start_step + i)

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class stack_sampler:
    """Low-tech sampling profiler: a daemon thread snapshots the MAIN
    thread's stack every ``interval`` seconds; ``report()`` returns the
    most common (file, line, function) leaves. For attributing
    wall-clock inside opaque host-side regions (no perf/py-spy in this
    environment)."""

    def __init__(self, interval: float = 0.2):
        self.interval = interval
        self.samples: list = []
        self._stop = False
        self._main_id = None
        self._thread = None

    def __enter__(self):
        import threading

        self._main_id = threading.main_thread().ident

        def run():
            import sys
            import time

            while not self._stop:
                frames = sys._current_frames()
                f = frames.get(self._main_id)
                stack = []
                while f is not None and len(stack) < 12:
                    stack.append((f.f_code.co_filename.rsplit("/", 2)[-1],
                                  f.f_lineno, f.f_code.co_name))
                    f = f.f_back
                self.samples.append(tuple(stack))
                time.sleep(self.interval)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop = True
        self._thread.join(timeout=2.0)

    def report(self, top: int = 10) -> list:
        from collections import Counter

        leaves = Counter(s[0] for s in self.samples if s)
        total = max(len(self.samples), 1)
        return [
            {"where": f"{f}:{ln} {fn}", "frac": round(c / total, 3)}
            for (f, ln, fn), c in leaves.most_common(top)
        ]
