"""Checkpoint/resume, snapshot writer and diagnostics tests."""

import json
import os

import numpy as np
import pytest

from tpufluids import diagnostics
from tpufluids.config import BASE_CONFIG, UNIDYN_CONFIG
from tpufluids.io import checkpoint
from tpufluids.io.snapshots import SnapshotWriter
from tpufluids.oracle import state_to_dict
from tpufluids.scenes import random_blob
from tpufluids.step import run_chunk


def test_checkpoint_roundtrip_bit_exact(tmp_path):
    cfg = BASE_CONFIG
    state = random_blob(50, seed=0, cfg=cfg)
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, state, cfg, step=7, extra={"note": "hi"})
    loaded, meta = checkpoint.load(path)
    assert meta["step"] == 7
    assert meta["extra"]["note"] == "hi"
    for k, v in state_to_dict(state).items():
        np.testing.assert_array_equal(v, np.asarray(getattr(loaded, k)),
                                      err_msg=k)
    cfg2 = checkpoint.load_config(path)
    assert cfg2 == cfg


def test_resume_continues_bit_exact(tmp_path):
    """Checkpoint at step 5, resume, and match an uninterrupted run."""
    cfg = BASE_CONFIG.replace(max_per_cell=32)
    state = random_blob(80, seed=1, span=0.12)
    full, _ = run_chunk(state, cfg, 10)
    half, _ = run_chunk(state, cfg, 5)
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, half, cfg, step=5)
    resumed, _ = checkpoint.load(path)
    done, _ = run_chunk(resumed, cfg, 5)
    for k, v in state_to_dict(full).items():
        np.testing.assert_array_equal(v, np.asarray(getattr(done, k)),
                                      err_msg=k)


def test_checkpoint_template_roundtrip(tmp_path):
    from tpufluids.grid import stam
    cfg = stam.StamConfig(n=8)
    s = stam.make_grid3d(cfg)
    s = s.replace(dens=s.dens + 1.0)
    path = str(tmp_path / "grid.npz")
    checkpoint.save(path, s, step=3)
    loaded, meta = checkpoint.load(path, template=s)
    np.testing.assert_array_equal(np.asarray(loaded.dens), np.asarray(s.dens))


def test_snapshot_writer_async(tmp_path):
    cfg = UNIDYN_CONFIG
    state = random_blob(30, seed=2, cfg=cfg)
    snap = SnapshotWriter(str(tmp_path), prefix="f_", cfg=cfg)
    import jax
    snap(0, jax.device_get(state))
    snap(20, jax.device_get(state))
    snap.close()
    files = sorted(os.listdir(tmp_path))
    assert files == ["f_0.vtk", "f_1.vtk"]
    text = (tmp_path / "f_0.vtk").read_text()
    assert text.startswith("# vtk DataFile Version 2.0")


def test_metrics_logger(tmp_path):
    cfg = BASE_CONFIG.replace(max_per_cell=32)
    state = random_blob(40, seed=3, span=0.12)
    state, metrics = run_chunk(state, cfg, 3)
    path = str(tmp_path / "metrics.jsonl")
    log = diagnostics.MetricsLogger(path)
    rec = log.log(3, metrics, wall_s=0.5)
    log.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 3
    assert lines[0]["n_alive"] == 40
    assert "max_speed" in lines[0]
    assert "dens_residual" in lines[0]


def test_blowup_guard(tmp_path):
    cfg = BASE_CONFIG
    state = random_blob(10, seed=4)
    diagnostics.check_state(state, cfg)  # healthy: no raise
    bad = state.replace(vel=np.full((10, 3), np.nan, np.float32))
    dump = str(tmp_path / "dump.npz")
    with pytest.raises(diagnostics.BlowUpError) as e:
        diagnostics.check_state(bad, cfg, dump_path=dump)
    assert "non-finite velocities" in str(e.value)
    assert os.path.exists(dump)
