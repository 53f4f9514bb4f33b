"""The scripts/open_source recipes must parse end-to-end: every command
line they issue goes through config.parse_config with the reference's
underscored argparse spellings, bare boolean flags, and the -p shorthand
(reference script/open_source/*.sh driven through utils/common.py:359)."""

import json
import os
import shlex
import stat
import subprocess

import pytest

from mulactseg_tpu.config import parse_config

SCRIPT_DIR = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "open_source")


def record_script_commands(script, tmp_path):
    """Run a recipe script with a stub `python` that records its argv."""
    rec = tmp_path / "argv.jsonl"
    stub = tmp_path / "bin" / "python"
    stub.parent.mkdir()
    stub.write_text("#!/bin/bash\n"
                    "python3 - \"$@\" <<'EOF'\n"
                    "import json, sys\n"
                    f"open({str(rec)!r}, 'a').write("
                    "json.dumps(sys.argv[1:]) + '\\n')\n"
                    "EOF\n")
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    env = dict(os.environ, PATH=f"{stub.parent}:{os.environ['PATH']}",
               DATA_ROOT="/tmp/recipe_data")
    subprocess.run(["bash", os.path.join(SCRIPT_DIR, script)], check=True,
                   env=env, capture_output=True)
    return [json.loads(l) for l in rec.read_text().splitlines()]


@pytest.mark.parametrize("script,n_cmds", [
    ("train_city_mul_res50.sh", 11),   # stage1 + 5x(plbl gen + stage2)
    ("train_voc_mul_res50.sh", 11),
    ("eval_city_mul_res50.sh", 5),
])
def test_recipe_commands_parse(script, n_cmds, tmp_path):
    cmds = record_script_commands(script, tmp_path)
    assert len(cmds) == n_cmds
    for argv in cmds:
        assert argv[0] == "-m"
        cfg = parse_config(argv[2:])  # strip -m <module>
        assert cfg.model and cfg.nseg > 0


def test_city_stage1_fields(tmp_path):
    argv = record_script_commands("train_city_mul_res50.sh", tmp_path)[0]
    cfg = parse_config(argv[2:])
    # -p shorthand
    assert cfg.model_save_dir == "checkpoint/city_mul_res50"
    # bare boolean flags (reference store_true style)
    assert cfg.or_labeling and cfg.fair_counting and cfg.separable_conv
    assert cfg.start_over and cfg.trim_multihot_boundary
    # underscored reference spellings
    assert cfg.method == "active_joint_multi_predignore_lossdecomp"
    assert cfg.active_method == "my_bvsb_predclsbal_pwr_banignore"
    assert cfg.train_lr == pytest.approx(2e-5)
    assert (cfg.coeff, cfg.coeff_mc, cfg.coeff_gm) == (16.0, 8.0, 1.0)
    assert cfg.cls_weight_coeff == 6.0 and cfg.val_start == 0
    # TPU additions ride the dashed spellings in the same command
    assert cfg.steps_per_dispatch == 32 and cfg.dtype == "bfloat16"


def test_voc_stage2_fields(tmp_path):
    cmds = record_script_commands("train_voc_mul_res50.sh", tmp_path)
    cfg = parse_config(cmds[2][2:])  # round-1 stage-2 retrain
    assert cfg.dataset == "voc" and cfg.num_classes == 21
    assert cfg.crop_size == (513, 513)
    assert cfg.method == "active" and cfg.loader == "region_voc_plbl"
    assert cfg.plbl_type == "cosprop_includeonehot"
    assert cfg.dominant_labeling and cfg.stage2
    assert cfg.init_iteration == 1 and cfg.train_lr == pytest.approx(1e-5)


def test_underscore_and_bare_bool_equivalence():
    a = parse_config(["--train_lr", "0.5", "--separable_conv",
                      "--or_labeling", "true", "--use_wandb", "false"])
    b = parse_config(["--train-lr", "0.5", "--separable-conv", "true",
                      "--or-labeling", "--use-wandb", "false"])
    assert a.train_lr == b.train_lr == 0.5
    assert a.separable_conv and b.separable_conv
    assert a.or_labeling and b.or_labeling
    assert not a.use_wandb and not b.use_wandb


def test_wandb_tags_nargs():
    cfg = parse_config(["--wandb_tags", "50k", "base", "cos"])
    assert list(cfg.wandb_tags) == ["50k", "base", "cos"]
