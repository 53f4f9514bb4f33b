"""Mixed-superpixel-scale (mseg) path: loss parity against a numpy
brute-force transcription of the reference loops
(trainer/active_joint_multi_predignore_mseg.py:16-112), the merged-list
dataset reader, and an end-to-end mini AL round through
MsegRegionActiveSet."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from mulactseg_tpu.config import Config
from mulactseg_tpu.data.synthetic import grid_superpixels

EPS = 1e-8


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def ref_mseg_mc(logits_nhwc, targets_by_level, spx_levels, spmask_levels,
                temp):
    """MultisegMultiChoiceCE (_mseg.py:70-112): every spmask pixel counts."""
    B, H, W, C = logits_nhwc.shape
    probs = _softmax(logits_nhwc.astype(np.float64) / temp, axis=-1)
    probs = probs.reshape(B, H * W, C)
    loss, num_valid = 0.0, 1
    for b in range(B):
        for s in range(spx_levels.shape[1]):
            mask = spmask_levels[b, s].reshape(-1)
            if not mask.any():
                continue
            vout = probs[b][mask]
            vspx = spx_levels[b, s].reshape(-1)[mask]
            trg_pixel = targets_by_level[s][b][vspx]
            pos = (vout * trg_pixel).sum(-1)
            num_valid += pos.shape[0]
            loss += -np.log(pos + EPS).sum()
    return loss / num_valid


def ref_mseg_group(logits_nhwc, targets_by_level, spx_levels, spmask_levels,
                   nseg_list, temp):
    """MultisegGroupMultiLabelCE (_mseg.py:16-62)."""
    B, H, W, C = logits_nhwc.shape
    probs = _softmax(logits_nhwc.astype(np.float64) / temp, axis=-1)
    probs = probs.reshape(B, H * W, C)
    loss, num_valid = 0.0, 1
    for b in range(B):
        for s, nseg in enumerate(nseg_list):
            mask = spmask_levels[b, s].reshape(-1)
            if not mask.any():
                continue
            vout = probs[b][mask]
            vspx = spx_levels[b, s].reshape(-1)[mask]
            mx = np.zeros((nseg, C))
            for seg in np.unique(vspx):
                mx[seg] = vout[vspx == seg].max(0)
            top_one = mx * targets_by_level[s][b]
            nz = top_one[top_one > 0]
            num_valid += nz.shape[0]
            loss += -np.log(nz + EPS).sum()
    return loss / num_valid


def test_mseg_loss_parity():
    rng = np.random.RandomState(7)
    B, H, W, C = 2, 12, 12, 6
    nseg_list = (5, 11)
    logits = rng.randn(B, H, W, C).astype(np.float32)
    spx = np.stack([rng.randint(0, n, (B, H, W)) for n in nseg_list],
                   axis=1).astype(np.int32)
    mask = rng.rand(B, 2, H, W) < 0.6
    mask[1, 1] = False  # image 1 has only the coarse level present
    targets = [
        (rng.rand(B, n, C) < 0.4).astype(np.float32) for n in nseg_list]

    from mulactseg_tpu.losses.mseg import (mseg_group_multi_label_ce,
                                           mseg_joint_loss,
                                           mseg_multi_choice_ce)

    got_mc = float(mseg_multi_choice_ce(logits, targets, spx, mask, temp=0.1))
    want_mc = ref_mseg_mc(logits, targets, spx, mask, temp=0.1)
    assert got_mc == pytest.approx(want_mc, rel=1e-4)

    got_g = float(mseg_group_multi_label_ce(
        logits, targets, spx, mask, nseg_list=nseg_list, temp=1.0))
    want_g = ref_mseg_group(logits, targets, spx, mask, nseg_list, temp=1.0)
    assert got_g == pytest.approx(want_g, rel=1e-4)

    total, aux = mseg_joint_loss(logits, targets, spx, mask,
                                 nseg_list=nseg_list, coeff=16.0,
                                 multi_ce_temp=0.1, group_ce_temp=1.0)
    assert float(total) == pytest.approx(16.0 * want_mc + want_g, rel=1e-4)


@pytest.fixture()
def mseg_disk(tmp_path):
    """Two-level fixture following the mseg path templates
    (mseg_region_active_dataset.py:10-12 tree, synthetic content)."""
    rng = np.random.RandomState(0)
    H = W = 24
    C = 5
    levels = (4, 9)
    root = tmp_path / "data"
    file_ids = ["cityA_000000_000019", "cityA_000001_000019"]
    img_dir = root / "leftImg8bit" / "train" / "cityA"
    img_dir.mkdir(parents=True)
    datalists, region_dicts, mh = {}, {}, {}
    gts = []
    for i, fid in enumerate(file_ids):
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        Image.fromarray(img).save(img_dir / f"{fid}_leftImg8bit.png")
        gt = rng.randint(0, C, (H, W)).astype(np.uint8)
        gts.append(gt)
    from mulactseg_tpu.tools.label_assignment import generate_multi_hot_dataset

    for nseg in levels:
        seed_dir = root / "superpixel_seed" / "cityscapes" / f"seeds_{nseg}"
        lbl_dir = seed_dir / "train" / "gtFine_dominant_ignore"
        spx_dir = seed_dir / "train" / "label"
        lbl_dir.mkdir(parents=True)
        spx_dir.mkdir(parents=True)
        spx_map = grid_superpixels(H, W, nseg)
        rows, region = [], {}
        for i, fid in enumerate(file_ids):
            Image.fromarray(gts[i]).save(lbl_dir / f"{fid}.png")
            with open(spx_dir / f"{fid}.pkl", "wb") as f:
                pickle.dump({"labels": spx_map}, f)
            rows.append("\t".join([
                f"leftImg8bit/train/cityA/{fid}_leftImg8bit.png",
                f"superpixel_seed/cityscapes/seeds_{nseg}/train/"
                f"gtFine_dominant_ignore/{fid}.png",
                f"superpixel_seed/cityscapes/seeds_{nseg}/train/label/"
                f"{fid}.pkl"]))
            region[f"superpixel_seed/cityscapes/seeds_{nseg}/train/label/"
                   f"{fid}.pkl"] = [nseg, []]
        dl = root / f"train_seed{nseg}.txt"
        dl.write_text("\n".join(rows))
        rd = root / f"train_seed{nseg}.dict"
        rd.write_text(json.dumps(region))
        datalists[nseg] = str(dl)
        region_dicts[nseg] = str(rd)
        mh_dir = seed_dir / "train" / "gtFine_multi_tensor"
        generate_multi_hot_dataset([(g, spx_map) for g in gts], nseg, C,
                                   str(mh_dir), trim=False)
        mh[nseg] = np.load(str(mh_dir / "multi_hot_cls.npy"))
    return root, levels, C, datalists, region_dicts, mh, file_ids


@pytest.mark.slow
def test_mseg_end_to_end_round(mseg_disk, tmp_path):
    root, levels, C, datalists, region_dicts, mh, file_ids = mseg_disk
    cfg = Config(num_classes=C, nseg=levels[-1], nseg_list=levels,
                 crop_size=(24, 24), data_root=str(root),
                 method="active_joint_multi_predignore_mseg",
                 loader="mseg_region_cityscapes_or_tensor",
                 model_save_dir=str(tmp_path / "run"), dtype="float32",
                 train_batch_size=2, finetune_itrs=2, num_workers=0,
                 trim_multihot_boundary=False)
    from mulactseg_tpu.active.mseg_active_set import MsegRegionActiveSet
    from mulactseg_tpu.data.datasets import RegionDatasetMseg
    from mulactseg_tpu.data.loader import DataProvider, collate

    pool = RegionDatasetMseg(cfg, datalists, region_dicts,
                             split="active-ulabel", multi_hot_by_nseg=mh)
    label = RegionDatasetMseg(cfg, datalists, region_dicts,
                              split="active-label", multi_hot_by_nseg=mh)
    assert len(pool) == len(file_ids)
    active = MsegRegionActiveSet(cfg, pool, label, root=str(root))

    # select a few superpixels at both granularities
    rows = [(0.9, f"{levels[0]}/{file_ids[0]}", 1),
            (0.8, f"{levels[1]}/{file_ids[0]}", 3),
            (0.7, f"{levels[0]}/{file_ids[1]}", 2),
            (0.6, f"{levels[1]}/{file_ids[1]}", 5)]
    active.expand_training_set(rows, selection_count=10,
                               selection_method="test")
    assert len(label.im_idx) == 2
    assert len(label.im_idx[0][1]) == 2  # both levels on image 0

    sample = label[0]
    S = len(levels)
    assert sample["mseg_spx"].shape == (S, 24, 24)
    assert sample["nseg_lbl"].all()
    assert sample["mseg_spmask"][0].sum() > 0

    # datalist dump/load roundtrip
    active.dump_datalist()
    label2 = RegionDatasetMseg(cfg, datalists, region_dicts,
                               split="active-label", multi_hot_by_nseg=mh)
    active2 = MsegRegionActiveSet(cfg, pool, label2, root=str(root))
    active2.load_datalist()
    assert [e[0] for e in label2.im_idx] == [e[0] for e in label.im_idx]

    # one jitted training step through the registered criterion
    import jax
    import jax.numpy as jnp

    from mulactseg_tpu.engine.state import create_train_state
    from mulactseg_tpu.engine.train import make_train_step
    from mulactseg_tpu.models import get_model

    batch = collate([label[0], label[1]])
    model = get_model("deeplabv3plus_mobilenet",
                      num_classes=cfg.num_model_classes, output_stride=16,
                      dtype=jnp.float32)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (2, 24, 24, 3))
    step = make_train_step(model, cfg, donate=False)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k != "fnames" and not isinstance(v, list)}
    state2, aux = step(state, dev_batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["train_loss"]))
