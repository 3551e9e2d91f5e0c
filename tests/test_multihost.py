"""Multi-host (2-process) simulation: the sharded frame update over a global
mesh spanning two processes must match the single-process result bitwise."""
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
DEMO = os.path.join(ROOT, "examples", "multihost_demo.py")


@pytest.mark.slow
def test_two_process_matches_single(tmp_path):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)

    single = str(tmp_path / "single.npz")
    r = subprocess.run(
        [sys.executable, "-u", DEMO, "0", "1", "--devices-per-proc", "1",
         "--out", single],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    multi = str(tmp_path / "multi.npz")
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", DEMO, str(i), "2", "--devices-per-proc", "2",
             "--coordinator", "127.0.0.1:45699", "--out", multi],
            cwd=ROOT, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    a, b = np.load(single), np.load(multi)
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@pytest.mark.slow
def test_four_process_matches_single(tmp_path):
    """4 processes x 1 device each (a 4-'host' topology: every collective
    crosses the process boundary) must also match single-process bitwise."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)

    single = str(tmp_path / "single.npz")
    r = subprocess.run(
        [sys.executable, "-u", DEMO, "0", "1", "--devices-per-proc", "1",
         "--out", single],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    multi = str(tmp_path / "multi4.npz")
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", DEMO, str(i), "4", "--devices-per-proc", "1",
             "--coordinator", "127.0.0.1:45701", "--out", multi],
            cwd=ROOT, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(4)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    a, b = np.load(single), np.load(multi)
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
