"""Build the native graph-preprocessing library.

    python -m sgc_tpu.native.build

Compiles graphprep.cpp to ``libgraphprep.so`` next to this file with g++
-O3. No external build system needed; cmake/bazel users can wrap this in
their own rules — the library is a flat C ABI.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
SRC = HERE / "graphprep.cpp"
OUT = HERE / "libgraphprep.so"


def build(verbose: bool = True) -> Path:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", str(SRC), "-o", str(OUT),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}", file=sys.stderr)
