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


def build(force: bool = False, asan: bool = False) -> str:
    ensure_tables()
    lib = LIB[:-3] + "_asan.so" if asan else LIB
    if (not force and os.path.exists(lib)
            and os.path.getmtime(lib) > max(os.path.getmtime(SRC),
                                            os.path.getmtime(INC))):
        return lib
    flags = CXXFLAGS + (["-fsanitize=address", "-g", "-fno-omit-frame-pointer"]
                        if asan else [])
    cmd = ["g++", *flags, SRC, "-o", lib, "-lpthread"]
    subprocess.run(cmd, check=True)
    return lib


def libasan_path() -> str | None:
    """Path to the ASan runtime to LD_PRELOAD when loading the asan build
    into a non-instrumented python."""
    out = subprocess.run(["g++", "-print-file-name=libasan.so"],
                         capture_output=True, text=True)
    p = out.stdout.strip()
    return p if p and os.path.sep in p and os.path.exists(p) else None


if __name__ == "__main__":
    print(build(force=True))
