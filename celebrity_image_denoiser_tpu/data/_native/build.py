"""Build the native loader (g++ → _cidnative.so).  Idempotent: rebuilds only
when loader.cpp is newer than the .so.  Used by native.py on first import;
can also be run directly: python -m celebrity_image_denoiser_tpu.data._native.build
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "loader.cpp")
OUT = os.path.join(_DIR, "_cidnative.so")


def build(force: bool = False) -> str:
    if (not force and os.path.exists(OUT)
            and os.path.getmtime(OUT) >= os.path.getmtime(SRC)):
        return OUT
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", SRC, "-o", OUT,
    ]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
