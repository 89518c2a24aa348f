"""Build the reference decoder (/root/reference) with a geometry-configurable
driver, for the in-repo bit-exactness harness and baseline measurement.

The upstream CMake tree fetches gtest from the network at configure time
(reference: test/gtest/CMakeLists.txt:1-9), which is unavailable here, so we
compile the production library sources (the same 7 .cpp files that
src/CMakeLists.txt:14-23 globs) plus tools/refbuild/ref_driver.cpp directly
with g++, using the reference's own Unix release flags (-Ofast, C++11 —
src/CMakeLists.txt:30-35).

Returns the cached binary path; raises RuntimeError when no toolchain or no
reference checkout is present (tests skip in that case).
"""
from __future__ import annotations

import os
import shutil
import subprocess

REFERENCE = os.environ.get("TINY_MP2V_REFERENCE", "/root/reference")
_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
BUILD_DIR = os.path.join(_REPO, ".refbuild")

_REF_SOURCES = [
    "core/decoder.cpp", "core/mb_decoder.cpp", "core/mp2v_vlc.cpp",
    "core/mp2v_hdr.cpp", "core/scan_c.cpp", "core/threads.cpp",
    "core/mc.cpp",
]


def reference_available() -> bool:
    return (os.path.isdir(os.path.join(REFERENCE, "src", "core"))
            and shutil.which("g++") is not None)


def build_reference_decoder(force: bool = False) -> str:
    """Compile (once) and return the path to the ref_decoder binary."""
    binary = os.path.join(BUILD_DIR, "ref_decoder")
    stamp = os.path.join(BUILD_DIR, "ref_decoder.ok")
    if not force and os.path.exists(binary) and os.path.exists(stamp):
        return binary
    if not reference_available():
        raise RuntimeError("reference sources or g++ not available")
    os.makedirs(BUILD_DIR, exist_ok=True)
    srcs = [os.path.join(REFERENCE, "src", s) for s in _REF_SOURCES]
    cmd = [
        "g++", "-std=c++11", "-Ofast", "-g0", "-w", "-msse2",
        "-I", os.path.join(REFERENCE, "src"),
        "-I", os.path.join(REFERENCE, "src", "core"),
        "-o", binary,
        os.path.join(_HERE, "ref_driver.cpp"), *srcs,
        "-lpthread",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"reference build failed:\n{proc.stderr[-4000:]}")
    with open(stamp, "w") as f:
        f.write(" ".join(cmd) + "\n")
    return binary


def run_reference(binary: str, stream_path: str, out_path: str, width: int,
                  height: int, chroma_format: int, threads: int = 0,
                  reps: int = 1, timeout: float = 300.0) -> dict:
    """Run the reference decoder; returns {frames, time_ms, fps}."""
    cmd = [binary, "-v", stream_path, "-o", out_path, "-w", str(width),
           "-h", str(height), "-c", str(chroma_format), "-r", str(reps)]
    if threads:
        cmd += ["-t", str(threads)]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(f"reference run failed: {proc.stderr[-2000:]}")
    stats = {}
    for tok in proc.stdout.split():
        if "=" in tok:
            k, v = tok.split("=", 1)
            stats[k] = float(v)
    return stats


if __name__ == "__main__":
    print(build_reference_decoder(force=True))
