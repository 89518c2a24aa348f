"""Kernel perf gate wrapper (reference: mc_test.cpp:86-87's >25% SIMD gate).

The suite itself runs on a forced-CPU virtual mesh (conftest), so the gate
executes in a clean subprocess with the CPU forcing stripped; it self-skips
when that subprocess finds no TPU.  Opt in with MP2V_TPU_PERF_GATE=1 (CI
runs tools/perf_gate.py directly on TPU hosts)."""
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get("MP2V_TPU_PERF_GATE") != "1",
                    reason="TPU perf gate is opt-in (MP2V_TPU_PERF_GATE=1); "
                           "needs exclusive access to the real chip")
def test_pallas_mc_beats_xla_gathers():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run([sys.executable, os.path.join(_REPO, "tools", "perf_gate.py")],
                       env=env, capture_output=True, text=True, timeout=2400)
    if r.returncode == 2:
        pytest.skip("no TPU backend in subprocess")
    assert r.returncode == 0, r.stdout + r.stderr
