"""Build the native host-side libraries.

    python -m sgc_tpu.native.build

Compiles two artifacts next to this file with g++ -O3:

* ``libgraphprep.so`` — flat-C-ABI graph preprocessing kernels
  (graphprep.cpp), loaded via ctypes by ``sgc_tpu.native``.
* ``_hugealloc.so`` — a CPython extension installing a NumPy
  data-memory handler that backs large allocations with
  MADV_HUGEPAGE anonymous mmaps (hugealloc.cpp).

No external build system needed; cmake/bazel users can wrap this in
their own rules.
"""

from __future__ import annotations

import subprocess
import sys
import sysconfig
from pathlib import Path

HERE = Path(__file__).resolve().parent
SRC = HERE / "graphprep.cpp"
OUT = HERE / "libgraphprep.so"
ALLOC_SRC = HERE / "hugealloc.cpp"
ALLOC_OUT = HERE / "_hugealloc.so"

_COMMON = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-pthread"]


def build(verbose: bool = True) -> Path:
    cmd = [*_COMMON, str(SRC), "-o", str(OUT)]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


def build_hugealloc(verbose: bool = True) -> Path:
    import numpy as np

    cmd = [
        *_COMMON,
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        str(ALLOC_SRC), "-o", str(ALLOC_OUT),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return ALLOC_OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}", file=sys.stderr)
    build_hugealloc()
    print(f"built {ALLOC_OUT}", file=sys.stderr)
