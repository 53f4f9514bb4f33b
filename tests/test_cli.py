"""CLI smoke tests on the synthetic loader: stage-1 AL loop and config
round-trip through the argparse shim."""

import json
import os

import pytest

from mulactseg_tpu.config import parse_config


def test_parse_config_reference_flags():
    cfg = parse_config([
        "--dataset", "cityscapes", "--nseg", "2048",
        "--train-lr", "2e-5", "--cls-lr-scale", "10",
        "--coeff", "16", "--coeff-mc", "8", "--coeff-gm", "1",
        "--ce-temp", "0.1", "--fair-counting", "true",
        "--active-selection-size", "100000",
        "--method", "active_joint_multi_predignore_lossdecomp",
    ])
    assert cfg.nseg == 2048 and cfg.coeff == 16.0
    assert cfg.num_model_classes == 20  # predignore adds undefined class
    assert cfg.trg_datalist.endswith("train_seed2048.txt")


@pytest.mark.slow
def test_train_al_cli_synthetic(tmp_path):
    from mulactseg_tpu.cli.train_al import main
    results = main([
        "--loader", "synthetic", "--num-classes", "5", "--nseg", "16",
        "--crop-size", "32", "32", "--train-batch-size", "2",
        "--finetune-itrs", "4", "--val-period", "100",
        "--max-iterations", "2", "--active-selection-size", "10",
        "--val-batch-size", "2", "--dtype", "float32",
        "--model-save-dir", str(tmp_path / "run"),
        "--model", "deeplabv3plus_mobilenet",  # CLI plumbing test: small model
        "--active-method", "my_random",
    ])
    assert set(results.keys()) == {1, 2}
    run = tmp_path / "run"
    assert (run / "metrics.jsonl").exists()
    assert (run / "datalist_02.json").exists()
    with open(run / "metrics.jsonl") as f:
        lines = [json.loads(l) for l in f]
    assert any("eval_miou" in l for l in lines)
