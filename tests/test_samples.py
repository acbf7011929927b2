"""Every sample under samples/ must run clean (the reference treats its
75 sample programs as living documentation AND smoke tests; same policy
here).  Samples honor BMTPU_PLATFORM=cpu so the suite does not need a
TPU; sample 07 builds its own virtual mesh."""
import glob
import os
import subprocess
import sys

import pytest

SAMPLES = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "samples", "*.py")))


@pytest.mark.parametrize("path", SAMPLES,
                         ids=[os.path.basename(p) for p in SAMPLES])
def test_sample_runs(path):
    env = dict(os.environ,
               BMTPU_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    res = subprocess.run([sys.executable, path], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert res.stdout.strip(), "sample produced no output"


TOOLS = {"svutil.py": ["--demo"], "range_idx.py": ["--demo"],
         "lnkutil.py": ["--demo"],
         "bench_tpch.py": ["--customers", "20000", "--nations", "20",
                           "--json"]}


@pytest.mark.parametrize("name", sorted(TOOLS))
def test_tool_demo_runs(name):
    path = os.path.join(os.path.dirname(__file__), "..", "tools", name)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run([sys.executable, path] + TOOLS[name], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert res.stdout.strip()


def test_multihost_check_two_processes():
    """Cross-process (DCN-analog) collectives: 2 jax.distributed processes
    over Gloo run the sharded scan / pipeline / popcount programs."""
    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "multihost_check.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    res = subprocess.run([sys.executable, path, "2"], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "multihost OK" in res.stdout
