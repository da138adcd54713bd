"""Build the native C++ runtime library (g++ -O3 -shared)."""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "src", "chnative.cpp")
LIB = os.path.join(HERE, "libchnative.so")


def build(force: bool = False) -> str:
    """Compile if missing or stale; returns the .so path."""
    if not force and os.path.exists(LIB) \
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC):
        return LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", SRC, "-o", LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        raise RuntimeError(f"native build failed: {e}")
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
