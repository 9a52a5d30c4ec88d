#!/usr/bin/env python
"""Build the native C++ components (native/*.cc → scade_tpu/data/_native.so).

Usage: python tools/build_native.py
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "scene_cache.cc")
OUT = os.path.join(ROOT, "scade_tpu", "data", "_native.so")


def build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        SRC, "-o", OUT,
    ]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    print(f"built {OUT}")


if __name__ == "__main__":
    build()
