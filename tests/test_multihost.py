"""Multi-host (multi-process) simulation: the sharded frame update over a
global mesh spanning two or four processes must match the single-process
result bitwise."""
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
DEMO = os.path.join(ROOT, "examples", "multihost_demo.py")


@pytest.fixture(scope="module")
def single_npz(tmp_path_factory):
    """The single-process baseline, computed once for all topologies."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = str(tmp_path_factory.mktemp("multihost") / "single.npz")
    r = subprocess.run(
        [sys.executable, "-u", DEMO, "0", "1", "--devices-per-proc", "1",
         "--out", out],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return out


def _run_procs(n_procs, devices_per_proc, coordinator, out):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", DEMO, str(i), str(n_procs),
             "--devices-per-proc", str(devices_per_proc),
             "--coordinator", coordinator, "--out", out],
            cwd=ROOT, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(n_procs)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o


def _assert_equal(single, multi):
    a, b = np.load(single), np.load(multi)
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@pytest.mark.slow
def test_two_process_matches_single(single_npz, tmp_path):
    multi = str(tmp_path / "multi.npz")
    _run_procs(2, 2, "127.0.0.1:45699", multi)
    _assert_equal(single_npz, multi)


@pytest.mark.slow
def test_four_process_matches_single(single_npz, tmp_path):
    """4 processes x 1 device each (a 4-'host' topology: every collective
    crosses the process boundary) must also match single-process bitwise."""
    multi = str(tmp_path / "multi4.npz")
    _run_procs(4, 1, "127.0.0.1:45701", multi)
    _assert_equal(single_npz, multi)
