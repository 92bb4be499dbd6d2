"""Build the native library (g++ -O3 shared object) next to this file.

Usage: python -m relightableavatar_tpu.native.build
The loader (native/__init__.py) builds lazily on first use when a compiler is
available and falls back to the numpy implementations otherwise.
"""
from __future__ import annotations

import os
import subprocess
import sys
from os.path import dirname, exists, getmtime, join

HERE = dirname(os.path.abspath(__file__))
SO = join(HERE, "libra_native.so")
SRC = [join(HERE, "marching.cpp"), join(HERE, "decimate.cpp")]


def build(force: bool = False) -> str | None:
    if not force and exists(SO) and all(getmtime(SO) >= getmtime(s) for s in SRC):
        return SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-o", SO, *SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return SO
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"native build failed: {msg}", file=sys.stderr)
        return None


if __name__ == "__main__":
    path = build(force=True)
    print(f"built: {path}")
