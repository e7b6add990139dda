"""End-to-end CLI tests (subprocess, CPU backend)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, timeout=240):
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, "-m", "tpufluids.cli", *args, "--cpu"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=timeout)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_base_dam_cli(tmp_path):
    rec = run_cli("base_dam", "--steps", "10", "--particles", "500",
                  "--out", str(tmp_path / "anim"), "--snapshot-every", "5",
                  "--metrics", str(tmp_path / "m.jsonl"))
    assert rec["particles"] == 500
    assert rec["bin_overflow"] == 0
    frames = sorted(os.listdir(tmp_path / "anim"))
    assert frames and frames[0].endswith(".vtk")
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert lines[0]["n_alive"] == 500


def test_base_dam_boundary_lattice():
    """The base driver's inert boundary-seeding block (solver.cu:122-128,
    nbpts=000 in the shipped config): nb particles on a 30-wide lattice
    at z=-0.24, spacing 0.06, boundary-flagged and immobile."""
    import numpy as np
    from tpufluids.scenes import base_dam

    s = base_dam(n=100, nb=60)
    assert int(np.sum(np.asarray(s.alive))) == 160
    b = np.asarray(s.boundary)
    assert b.sum() == 60
    bp = np.asarray(s.pos)[b]
    np.testing.assert_allclose(bp[:, 2], -0.24)
    np.testing.assert_allclose(bp[0], [-0.96, -0.96, -0.24])
    np.testing.assert_allclose(bp[31], [-0.96 + 0.06, -0.96 + 0.06,
                                        -0.24], rtol=1e-6)
    rec = run_cli("base_dam", "--steps", "4", "--particles", "200",
                  "--boundary-particles", "50")
    assert rec["particles"] == 250


def test_unidyn_checkpoint_resume_cli(tmp_path):
    ck = str(tmp_path / "ck.npz")
    rec1 = run_cli("base_dam", "--steps", "6", "--particles", "300",
                   "--checkpoint", ck)
    assert os.path.exists(ck)
    rec2 = run_cli("base_dam", "--steps", "4", "--particles", "300",
                   "--resume", ck)
    assert rec2["particles"] == 300


def test_grid3d_cli():
    rec = run_cli("grid3d", "--size", "24", "--steps", "5", "--red-black",
                  "--vorticity", "2.0")
    assert rec["poisson_residual"] < 1.0
    assert rec["steps_per_sec"] > 0


def test_grid3d_sharded_cli():
    rec = run_cli("grid3d_sharded", "--size", "16", "--steps", "2",
                  "--devices", "4")
    assert rec["poisson_residual"] < 1.0
