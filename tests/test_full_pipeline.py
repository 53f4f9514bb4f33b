"""Full reference workflow through the CLIs with real-format files on
disk: stage-1 AL training -> cosine-prototype pseudo-label generation ->
stage-2 retraining (the train_AL + eval_AL + train_stage2_AL chain,
SURVEY.md sections 3.1-3.3)."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from mulactseg_tpu.data.synthetic import grid_superpixels
from mulactseg_tpu.tools.label_assignment import generate_multi_hot_dataset


@pytest.fixture()
def disk_dataset(tmp_path):
    rng = np.random.RandomState(0)
    H = W = 24
    S, C = 16, 19
    root = tmp_path / "data"
    root.mkdir()
    spx_map = grid_superpixels(H, W, S)
    rows, region, gts = [], {}, []
    for i in range(3):
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        gt = rng.randint(0, C, (H, W)).astype(np.uint8)
        gt[rng.rand(H, W) < 0.05] = 255
        gts.append(gt)
        Image.fromarray(img).save(root / f"img_{i}.png")
        Image.fromarray(gt).save(root / f"lbl_{i}.png")
        with open(root / f"spx_{i}.pkl", "wb") as f:
            pickle.dump({"labels": spx_map}, f)
        rows.append(f"img_{i}.png\tlbl_{i}.png\tspx_{i}.pkl")
        region[f"spx_{i}.pkl"] = [S, []]
    (root / "train.txt").write_text("\n".join(rows))
    (root / "train.dict").write_text(json.dumps(region))
    (root / "val.txt").write_text(
        "\n".join("\t".join(r.split("\t")[:2]) for r in rows))

    # multi-hot tensors at the reference path convention
    mh_dir = (root / "superpixel_seed" / "cityscapes" / f"seeds_{S}" /
              "train" / "gtFine_multi_tensor_trim_5x5")
    generate_multi_hot_dataset([(g, spx_map) for g in gts], S, C,
                               str(mh_dir), trim=True, trim_kernel=5)
    return root, S, C


def _common_args(root, S, run_dir):
    return [
        "--dataset", "cityscapes", "--num-classes", "19",
        "--data-root", str(root),
        "--datalist-dir", str(root),
        "--trg-datalist", str(root / "train.txt"),
        "--region-dict", str(root / "train.dict"),
        "--nseg", str(S), "--crop-size", "24", "24",
        "--label-encoding", "identity",
        "--train-batch-size", "2", "--val-batch-size", "1",
        "--finetune-itrs", "3", "--val-period", "100",
        "--dtype", "float32", "--num-workers", "2",
        "--val-num-workers", "2",
        "--model-save-dir", str(run_dir),
        # pipeline plumbing test: the flagship is covered by the parity
        # suites + the verify drive; the small model cuts ~6 min of CPU
        # compiles from the suite
        "--model", "deeplabv3plus_mobilenet",
    ]


@pytest.mark.slow
def test_stage1_plbl_stage2_chain(disk_dataset, tmp_path):
    root, S, C = disk_dataset
    run_dir = tmp_path / "run"

    # --- stage 1: one AL round with the paper selector -----------------------
    from mulactseg_tpu.cli.train_al import main as train_main
    results = train_main(_common_args(root, S, run_dir) + [
        "--max-iterations", "1",
        "--active-method", "my_bvsb_predclsbal_pwr_banignore",
        "--init-active-method", "my_random",
        "--active-selection-size", "30",
        "--method", "active_joint_multi_predignore_lossdecomp",
    ])
    assert 1 in results
    ckpt = run_dir / "checkpoint01"
    assert ckpt.exists()
    assert (run_dir / "datalist_01.json").exists()

    # --- pseudo-label generation ---------------------------------------------
    from mulactseg_tpu.cli.eval_al import main as eval_main
    miou = eval_main(_common_args(root, S, run_dir) + [
        "--init-iteration", "1",
        "--resume-checkpoint", str(ckpt),
        "--plbl-type", "cosprop_includeonehot",
        "--datalist-path", str(run_dir / "datalist_01.json"),
        "--method", "active_joint_multi_predignore_lossdecomp",
    ])
    plbl_dir = run_dir / "plbl_gen_cosprop_includeonehot" / "round_01"
    pngs = sorted(os.listdir(plbl_dir))
    assert pngs and all(p.endswith(".png") for p in pngs)
    assert 0 <= miou <= 100

    # --- stage 2: CE retrain on the pseudo labels ----------------------------
    from mulactseg_tpu.cli.train_stage2 import main as stage2_main
    s2_miou = stage2_main(_common_args(root, S, run_dir) + [
        "--stage2", "true", "--init-iteration", "1",
        "--method", "active_predignore", "--loader", "region_plbl",
        "--train-lr", "4e-5",
        "--resume-checkpoint", str(ckpt),
        "--plbl-type", "cosprop_includeonehot",
        "--datalist-path", str(run_dir / "datalist_01.json"),
    ])
    assert (run_dir / "stage2_checkpoint01").exists()
    assert 0 <= s2_miou <= 100
