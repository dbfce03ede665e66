"""On-demand g++ builds for the csrc/ native components.

One shared recipe for every ctypes-loaded library (criteo parser, batch
stager, serving queue): rebuild when the source is newer than the .so,
compile to a private temp file, and atomically publish with os.replace —
concurrent processes racing the compile must never dlopen a half-written
library."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_CSRC = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "csrc"))


def build_native_lib(src_basename: str) -> Optional[ctypes.CDLL]:
    """Build (if stale) and load csrc/<src_basename>; None on failure."""
    src = os.path.join(_CSRC, src_basename)
    build_dir = os.path.join(_CSRC, "_build")
    stem = os.path.splitext(src_basename)[0]
    so_path = os.path.join(build_dir, f"lib{stem}.so")
    try:
        if not os.path.exists(so_path) or (
            os.path.getmtime(so_path) < os.path.getmtime(src)
        ):
            os.makedirs(build_dir, exist_ok=True)
            tmp = f"{so_path}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
                 src, "-o", tmp],
                check=True, capture_output=True,
            )
            os.replace(tmp, so_path)
        return ctypes.CDLL(so_path)
    except Exception:
        return None
