"""The shipped examples run end-to-end: the generic framework surface is
usable for models other than hiPSC (SURVEY §2.1 F2 — the base class is a
real framework, not the model's plumbing)."""

import importlib.util
import os
import sys

import numpy as np
import pytest
import yaml

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _load(module_name, filename):
    spec = importlib.util.spec_from_file_location(
        module_name, os.path.join(EXAMPLES, filename)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = mod
    spec.loader.exec_module(mod)
    return mod


def _templates(tmp_path, n=40, steps=2, box=300):
    tdir = tmp_path / "templates"
    tdir.mkdir()
    (tdir / "general.yaml").write_text(yaml.dump({
        "num_to_start": n, "cuda": False, "end_step": steps,
        "size": [box, box, 0], "output_values": True, "output_images": False,
        "record_initial_step": False, "image_quality": 100,
        "video_quality": 80, "fps": 5, "seed": 0,
    }))
    (tdir / "experimental.yaml").write_text(yaml.dump({
        "num_gata6": 4, "output_tda": False, "output_gradients": False,
        "group": 0, "dox_step": 1, "guye_move": False, "lonely_thresh": 2,
        "color_mode": True,
    }))
    out = tmp_path / "outputs"
    out.mkdir()
    return out


def test_minimal_abm_example(tmp_path, monkeypatch):
    mod = _load("example_minimal_abm", "minimal_abm.py")
    monkeypatch.chdir(tmp_path)
    out = _templates(tmp_path)
    sim = mod.RandomWalkers.start(str(out) + os.sep, argv=["-n", "rw", "-m", "0"])
    assert sim.number_agents == 40
    assert sim.stuck.shape == (40,)
    vals = out / "rw" / "rw_values" / "rw_values_2.csv"
    assert vals.is_file()


def test_chemotaxis_example(tmp_path, monkeypatch):
    mod = _load("example_chemotaxis", "chemotaxis.py")
    monkeypatch.chdir(tmp_path)
    out = _templates(tmp_path, steps=3)
    sim = mod.Chemotaxis.start(str(out) + os.sep, argv=["-n", "fg", "-m", "0"])
    assert sim.number_agents == 40
    # the source fed the field and the foragers ate from it
    field = np.asarray(sim.attractant)
    assert field.max() > 0.0 and np.isfinite(field).all()
    assert float(sim.food.sum()) > 0.0
    # agents stayed in the dish
    assert (sim.locations >= 0.0).all()
    assert (sim.locations[:, :2] <= 300.0).all()
    vals = out / "fg" / "fg_values" / "fg_values_3.csv"
    assert vals.is_file()
    # food is a registered agent array -> it rides the standard CSV output
    header = vals.read_text().splitlines()[0]
    assert "food" in header


def test_spheroid_3d_example(tmp_path):
    mod = _load("example_spheroid_3d", "spheroid_3d.py")
    out = tmp_path / "out3d"
    eng, state, stats = mod.run(n_cells=220, n_gata6=36, steps=3,
                                out_dir=str(out), seed=0)
    assert eng.cfg.two_d is False
    assert stats["population"] >= 220  # death needs 144 lonely steps
    # the over-packed ball relaxed outward but stayed a 3D cloud
    assert 0.0 < stats["z_extent_um"] < mod.BOX / 2.0
    assert stats["mean_radius_um"] > 0.0
    locs = np.asarray(state.arrays["locations"])[np.asarray(state.alive)]
    assert (locs >= 0.0).all() and (locs <= mod.BOX).all()
    assert (out / "spheroid_xy.png").is_file()
    assert (out / "spheroid_xz.png").is_file()


def test_replicate_study_example(tmp_path):
    mod = _load("example_replicate_study", "replicate_study.py")
    out_csv = tmp_path / "study.csv"
    rows = mod.main(R=3, steps=2, out_path=str(out_csv))
    assert len(rows) == 2
    header = out_csv.read_text().splitlines()
    assert header[0].startswith("step,n_mean,n_sd")
    assert len(header) == 3
    # populations stay plausible and the stats are finite
    for row in rows:
        assert row[1] > 0 and np.isfinite(row[3]) and 0.0 <= row[5] <= 1.0
