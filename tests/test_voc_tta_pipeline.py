"""VOC chain on disk: stage-1 partial-label training then 10-view TTA
cosine-prototype pseudo-label generation through the reference's
`--method eval_save_cosplbl_prop_includeonehot_voc_ms` command line
(train_voc_mul_res50.sh's plbl step; TTA views per engine/tta.py =
ExtTestTimeAugmentation's 5 scales x flip)."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from mulactseg_tpu.data.synthetic import grid_superpixels
from mulactseg_tpu.tools.label_assignment import generate_multi_hot_dataset

S, C = 9, 21  # VOC classes
H = W = 24


@pytest.fixture()
def voc_disk(tmp_path):
    rng = np.random.RandomState(0)
    root = tmp_path / "data"
    root.mkdir()
    spx_map = grid_superpixels(H, W, S)
    rows, region, gts = [], {}, []
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
            root / f"img_{i}.png")
        gt = rng.randint(0, C, (H, W)).astype(np.uint8)
        gts.append(gt)
        Image.fromarray(gt).save(root / f"lbl_{i}.png")
        with open(root / f"spx_{i}.pkl", "wb") as f:
            pickle.dump({"labels": spx_map}, f)
        rows.append(f"img_{i}.png\tlbl_{i}.png\tspx_{i}.pkl")
        region[f"spx_{i}.pkl"] = [S, []]
    (root / "train.txt").write_text("\n".join(rows))
    (root / "train.dict").write_text(json.dumps(region))
    # voc multi-hot path convention (region_voc_or_tensor.py:38-43)
    mh_dir = (root / "superpixels" / "pascal_voc_seg" / f"seeds_{S}" /
              "train" / "gtFine_multi_tensor_trim_3x3")
    generate_multi_hot_dataset([(g, spx_map) for g in gts], S, C,
                               str(mh_dir), trim=True, trim_kernel=3)
    return root


@pytest.mark.slow
def test_voc_stage1_then_tta_plbl(voc_disk, tmp_path, monkeypatch):
    # every TTA scale is a distinct full-model compile (~2 min each on
    # this CPU); two scales x flip prove the mechanism
    import mulactseg_tpu.engine.tta as tta

    monkeypatch.setattr(tta, "TTA_SCALES", (0.75, 1.0))
    root = voc_disk
    run = tmp_path / "run"
    args = [
        "--dataset", "voc", "--num-classes", "21",
        "--data-root", str(root), "--datalist-dir", str(root),
        "--trg-datalist", str(root / "train.txt"),
        "--region-dict", str(root / "train.dict"),
        "--nseg", str(S), "--crop-size", "24", "24",
        "--label-encoding", "identity", "--trim-kernel-size", "3",
        "--train-transform", "rescale_513_multi_notrg",
        "--train-batch-size", "2", "--val-batch-size", "1",
        "--finetune-itrs", "2", "--val-period", "100",
        "--dtype", "float32", "--num-workers", "0",
        "--val-num-workers", "0", "--model-save-dir", str(run),
        "--model", "deeplabv3plus_mobilenet",  # chain test: small model
        "--max-iterations", "1", "--active-selection-size", "60",
        "--active-method", "my_random", "--init-active-method", "my_random",
    ]
    from mulactseg_tpu.cli.train_al import main as train_main

    train_main(args + ["--method", "active_joint_multi_lossdecomp"])
    assert (run / "checkpoint01").exists()

    from mulactseg_tpu.cli.eval_al import main as eval_main

    miou = eval_main(args + [
        "--method", "eval_save_cosplbl_prop_includeonehot_voc_ms",
        "--resume-checkpoint", str(run / "checkpoint01"),
        "--datalist-path", str(run / "datalist_01.json"),
        "--init-iteration", "1",
    ])
    assert np.isfinite(miou)
    import glob

    pngs = glob.glob(str(run / "plbl_gen_cosprop_includeonehot" /
                         "round_01" / "*.png"))
    assert len(pngs) == 2  # both images selected under the 60-click budget
    plbl = np.asarray(Image.open(pngs[0]))
    assert plbl.shape == (H, W)
    assert set(np.unique(plbl)) <= set(range(C)) | {255}
