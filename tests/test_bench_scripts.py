"""Smoke tests for the benchmark/analysis drivers (tiny CPU configs) —
keeps the measurement harness from rotting."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def _run(args, timeout=240):
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=ENV, timeout=timeout,
        capture_output=True, text=True,
    )


def test_bench_py_smoke():
    r = _run(["bench.py"])
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["metric"] == "maxwell_spmm_nnz_per_s"
    assert d["value"] > 0 and d["vs_baseline"] > 0


@pytest.mark.slow
def test_sweep_driver_smoke(tmp_path):
    csv = str(tmp_path / "bl.csv")
    r = _run(["benchmarks/sweep_lanczos.py", "--block", "--n-col", "2",
              "--n-min", "4", "--n-max", "5", "--m1", "2", "--m2", "4",
              "--csv", csv])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(csv)
    assert len(open(csv).read().splitlines()) >= 2


def test_weak_scaling_smoke(tmp_path):
    out = str(tmp_path / "ws.json")
    r = _run(["benchmarks/weak_scaling.py", "--cpu-mesh", "2",
              "--devices", "1", "2", "--n-xy", "4", "--z-per-device", "8",
              "--p", "2", "--json", out])
    assert r.returncode == 0, r.stderr[-2000:]
    rows = json.load(open(out))
    assert len(rows) == 2 and rows[0]["efficiency"] == 1.0


@pytest.mark.slow
def test_kernel_bench_smoke(tmp_path):
    out = str(tmp_path / "k.json")
    r = _run(["benchmarks/kernel_bench.py", "--only", "sqrtm",
              "--json", out])
    assert r.returncode == 0, r.stderr[-2000:]
    d = json.load(open(out))
    assert len(d["sqrtm"]) == 9
