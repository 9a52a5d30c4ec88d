#!/usr/bin/env python
"""Build the native C++ components (native/scene_cache.cc →
scade_tpu/data/_native.so).

Usage: python tools/build_native.py

The g++ command lives in scade_tpu.data.native_cache.build() — the same
function the library uses for its lazy auto-build, so manual and automatic
builds can never diverge.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scade_tpu.data.native_cache import _LIB_PATH, build  # noqa: E402

if __name__ == "__main__":
    if build():
        print(f"built {_LIB_PATH}")
    else:
        sys.exit("build failed (g++ missing, source missing, or compile error)")
