"""Build the native tokenizer shared library (g++, no external deps).

The .so is compiled on demand next to the sources and rebuilt whenever the
sources are newer (cheap mtime check) — `python -m
tiny_mp2v_dec_tpu.tokenizer.build` forces a rebuild.
"""
from __future__ import annotations

import os
import subprocess
import sys

CSRC = os.path.join(os.path.dirname(__file__), "csrc")
SRC = os.path.join(CSRC, "tokenizer.cpp")
INC = os.path.join(CSRC, "vlc_tables.inc")
LIB = os.path.join(CSRC, "_tokenizer.so")

CXXFLAGS = ["-O3", "-std=c++17", "-shared", "-fPIC", "-Wall", "-march=native"]


def ensure_tables() -> None:
    if not os.path.exists(INC):
        from subprocess import run
        gen = os.path.join(os.path.dirname(__file__), "..", "..", "tools",
                           "gen_vlc_inc.py")
        run([sys.executable, gen], check=True)


def build(force: bool = False) -> str:
    ensure_tables()
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) > max(os.path.getmtime(SRC),
                                            os.path.getmtime(INC))):
        return LIB
    cmd = ["g++", *CXXFLAGS, SRC, "-o", LIB, "-lpthread"]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
