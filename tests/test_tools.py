"""Smoke coverage for the operational tools (tools/tpu_health.py).

The probe must run on any backend (it is the thing you reach for when
the TPU is suspect, so it cannot itself require a healthy TPU): on the
CPU platform it should print one JSON line with every probe it ran and
exit 0.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tpu_health_probe_cpu_smoke():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tpu_health.py"),
         "--alloc_gb", "0.01"],
        capture_output=True, text=True, timeout=120, env=env)
    assert out.returncode == 0, out.stderr[-500:]
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["healthy"] is True
    assert line["init_s"] < 30.0 and line["small_matmul_s"] < 30.0
    assert line["alloc_0.01gb_s"] is not None
    assert "attention_probe_s" not in line  # --big not requested
