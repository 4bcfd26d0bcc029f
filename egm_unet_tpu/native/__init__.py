"""Native (C++) components, built on demand with g++ and bound via ctypes.

``load_library(name)`` compiles ``egm_unet_tpu/native/<name>.cpp`` into a
shared object next to it (cached by mtime) and returns the ctypes CDLL, or
None when no toolchain is available — callers fall back to pure Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(__file__)


def load_library(name: str):
    src = os.path.join(_DIR, f"{name}.cpp")
    lib = os.path.join(_DIR, f"lib{name}.so")
    try:
        if (not os.path.exists(lib)
                or os.path.getmtime(lib) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", src, "-o", lib],
                check=True, capture_output=True)
        return ctypes.CDLL(lib)
    except (OSError, subprocess.CalledProcessError):
        return None
