"""CLI flags, text-UI guards, and YAML config loaders."""

import os

import pytest
import yaml

from hipsc_abm_tpu.utils import cli
from hipsc_abm_tpu.utils.config import check_direct, check_output_dir, template_params


def test_commandline_param():
    argv = ["prog", "-n", "mysim", "-m", "2", "-fs", "300"]
    assert cli.commandline_param("-n", str, argv) == "mysim"
    assert cli.commandline_param("-m", int, argv) == 2
    assert cli.commandline_param("-fs", int, argv) == 300
    with pytest.raises(Exception):
        cli.commandline_param("-x", str, argv)
    with pytest.raises(Exception):
        cli.commandline_param("-fs", int, ["prog", "-fs"])  # missing value


def test_get_name_mode_and_final_step():
    assert cli.get_name_mode(["p", "-n", "a", "-m", "0"]) == ("a", 0)
    assert cli.get_final_step(["p", "-fs", "7"]) == 7


def test_check_new_sim_creates_and_guards(tmp_path):
    out = str(tmp_path) + os.sep
    name = cli.check_new_sim("fresh", out)
    assert name == "fresh" and os.path.isdir(tmp_path / "fresh")
    # existing dir, non-interactive, no overwrite permission -> raises
    with pytest.raises(Exception):
        cli.check_new_sim("fresh", out)
    # explicit overwrite clears contents
    (tmp_path / "fresh" / "junk.txt").write_text("x")
    cli.check_new_sim("fresh", out, overwrite=True)
    assert os.listdir(tmp_path / "fresh") == []


def test_check_previous_sim(tmp_path):
    out = str(tmp_path) + os.sep
    os.mkdir(tmp_path / "old")
    assert cli.check_previous_sim("old", out) == "old"
    with pytest.raises(Exception):
        cli.check_previous_sim("nope", out)


def test_template_params_and_output_dir(tmp_path, monkeypatch):
    p = tmp_path / "t.yaml"
    p.write_text(yaml.dump({"a": 1, "size": [10, 20, 0]}))
    keys = template_params(str(p))
    assert keys["a"] == 1 and keys["size"] == [10, 20, 0]

    monkeypatch.chdir(tmp_path)
    (tmp_path / "paths.yaml").write_text(yaml.dump({"output_dir": str(tmp_path / "outs")}))
    out = check_output_dir(interactive=False)
    assert os.path.isdir(tmp_path / "outs") and out.endswith(os.path.sep)

    check_direct(str(tmp_path / "deep"))
    assert os.path.isdir(tmp_path / "deep")


def test_params_dataclass_roundtrip():
    from hipsc_abm_tpu.models.params import ExperimentalParams, GeneralParams

    g = GeneralParams.from_dict({
        "num_to_start": 10, "cuda": False, "end_step": 5, "size": [100, 100, 0],
        "output_values": True, "output_images": False, "record_initial_step": True,
        "image_quality": 50, "video_quality": 40, "fps": 2,
    })
    assert g.num_to_start == 10 and g.is_2d
    x = ExperimentalParams.from_dict({
        "num_gata6": 3, "output_tda": False, "output_gradients": False, "group": 0,
        "dox_step": 9, "guye_move": False, "lonely_thresh": 1, "color_mode": False,
    })
    assert x.dox_step == 9 and not x.guye_move
