"""Build the native bbox kernel: g++ -O3 -shared -fPIC bbox.cpp -> libbbox.so.

Invoked automatically (and cached) by mmnas_tpu.utils.bbox on first import;
can also be run directly: python -m mmnas_tpu.native.build
(replaces the reference's `python3 setup.py build` Cython step,
docs/dataset_setup.md:95-101).
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "bbox.cpp")
LIB = os.path.join(_DIR, "libbbox.so")


def build(force: bool = False) -> str:
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", SRC, "-o", LIB]
    subprocess.run(cmd, check=True, capture_output=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
