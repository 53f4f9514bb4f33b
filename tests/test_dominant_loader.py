"""Dominant-labeling baseline loader family (RegionDatasetDominant) —
the paper's 'Dominant' query arm: datalist substitution, raw-trainId
loading, unselected masking, predignore / withgt variants, pool split,
and the or_labeling=False dispatch (region_cityscapes.py:15-135,
_predignore.py:38-57, _withgt.py:103-137, dataloader/__init__.py:143-145).
"""

import json
import pickle

import numpy as np
import pytest
from PIL import Image

from mulactseg_tpu.config import Config

H = W = 32
S, C = 9, 19


@pytest.fixture()
def dom_root(tmp_path):
    rng = np.random.RandomState(0)
    from mulactseg_tpu.data.synthetic import grid_superpixels

    spx = grid_superpixels(H, W, S)
    # dominant map: whole superpixels painted with one trainId (or 255)
    sp_cls = rng.randint(0, C, S).astype(np.uint8)
    sp_cls[2] = 255
    dom = sp_cls[spx]
    # precise GT as LABEL IDS (cityscapes LUT: labelId 7 -> trainId 0)
    gt_ids = np.full((H, W), 7, np.uint8)
    gt_ids[: H // 2] = 26  # 'car' labelId -> trainId 13

    img = rng.randint(0, 255, (H, W, 3), np.uint8)
    Image.fromarray(img).save(tmp_path / "img_0.png")
    # only the *_ignore variant exists on disk: proves the known_ignore
    # substitution runs (the plain path would 404)
    (tmp_path / "gtFine_dominant_ignore").mkdir()
    Image.fromarray(dom).save(
        tmp_path / "gtFine_dominant_ignore" / "city_000000.png")
    (tmp_path / "gtFine" / "train" / "city").mkdir(parents=True)
    Image.fromarray(gt_ids).save(
        tmp_path / "gtFine" / "train" / "city" /
        "city_000000_gtFine_labelIds.png")
    with open(tmp_path / "spx_0.pkl", "wb") as f:
        pickle.dump({"labels": spx}, f)
    (tmp_path / "train.txt").write_text(
        "img_0.png\tgtFine_dominant/city_000000.png\tspx_0.pkl")
    (tmp_path / "train.dict").write_text(
        json.dumps({"spx_0.pkl": [S, []]}))
    return tmp_path, spx, dom, sp_cls


def _cfg(root, **kw):
    return Config(num_classes=C, nseg=S, data_root=str(root),
                  or_labeling=False, dominant_labeling=True,
                  loader="region_cityscapes", **kw)


def test_dominant_substitution_mask_and_raw_labels(dom_root):
    from mulactseg_tpu.data.datasets import RegionDatasetDominant

    root, spx, dom, _ = dom_root
    cfg = _cfg(root)
    ds = RegionDatasetDominant(cfg, str(root / "train.txt"),
                               str(root / "train.dict"),
                               full_supervision=True)
    assert "gtFine_dominant_ignore" in ds.im_idx[0][1]
    item = ds[0]
    # dominant_labeling -> labels load RAW (no encode), all selected here
    np.testing.assert_array_equal(item["labels"], dom.astype(np.int32))
    # partial selection masks the rest to 255
    ds.suppix[ds.im_idx[0][2]] = [0, 3]
    item = ds[0]
    m = np.isin(spx, [0, 3])
    np.testing.assert_array_equal(item["labels"][m], dom[m])
    assert (item["labels"][~m] == 255).all()


def test_dominant_predignore_and_withgt(dom_root):
    from mulactseg_tpu.data.datasets import RegionDatasetDominant

    root, spx, dom, _ = dom_root
    cfg = _cfg(root)
    ds = RegionDatasetDominant(cfg, str(root / "train.txt"),
                               str(root / "train.dict"),
                               pred_ignore=True, with_gt=True,
                               full_supervision=True)
    item = ds[0]
    # predignore: discovered-ignore (255 inside selection) -> class C
    want = np.where(dom == 255, C, dom)
    np.testing.assert_array_equal(item["labels"], want.astype(np.int32))
    # withgt: precise GT rides along, LUT-encoded, 255 -> C too
    gt = item["target"]
    assert (gt[H // 2:] == 0).all()   # labelId 7 -> trainId 0
    assert (gt[: H // 2] == 13).all()  # labelId 26 -> trainId 13


def test_dominant_pool_split_and_known_ignore(dom_root):
    from mulactseg_tpu.data.datasets import RegionDatasetDominant

    root, spx, _, _ = dom_root
    cfg = _cfg(root)
    pool = RegionDatasetDominant(cfg, str(root / "train.txt"),
                                 str(root / "train.dict"),
                                 split="active-ulabel")
    item = pool[0]
    assert set(item) == {"images", "spx", "fnames"}
    np.testing.assert_array_equal(item["spx"], spx)
    # known_ignore keeps the plain gtFine_dominant path (no file there)
    cfg_ki = _cfg(root, known_ignore=True)
    ds = RegionDatasetDominant(cfg_ki, str(root / "train.txt"),
                               str(root / "train.dict"),
                               full_supervision=True)
    assert "gtFine_dominant/" in ds.im_idx[0][1].replace("\\", "/")


def test_build_active_datasets_dominant_dispatch(dom_root, monkeypatch):
    from mulactseg_tpu.cli.common import build_active_datasets
    from mulactseg_tpu.data.datasets import RegionDatasetDominant

    root, _, _, _ = dom_root
    cfg = _cfg(root, trg_datalist=str(root / "train.txt"),
               region_dict=str(root / "train.dict"),
               datalist_dir=str(root), crop_size=(16, 16))
    active, _ = build_active_datasets(cfg)
    assert isinstance(active.trg_label_dataset, RegionDatasetDominant)
    assert len(active.trg_label_dataset) == 0      # starts empty
    assert len(active.trg_pool_dataset) == 1
    # expansion moves a superpixel across; the item then trains via CE
    active.expand_training_set(
        [(0.5, ",".join(active.trg_pool_dataset.im_idx[0]), 1)], 10,
        "my_random")
    item = active.trg_label_dataset[0]
    assert item["labels"].shape == (16, 16)
    assert set(np.unique(item["labels"])) <= (
        set(range(C)) | {255})


def test_stats_loader_dispatch_under_dominant_arm(dom_root):
    """The reference selects dom_w_gt etc. with or_labeling UNSET (figure7
    Dom scripts): the stats wrapper must dispatch before the dominant
    early-return and ride the dominant base."""
    from mulactseg_tpu.cli.common import build_active_datasets
    from mulactseg_tpu.data.stats import RegionStatsDataset

    root, spx, _, _ = dom_root
    cfg = _cfg(root, trg_datalist=str(root / "train.txt"),
               region_dict=str(root / "train.dict"),
               datalist_dir=str(root), crop_size=(16, 16))
    cfg.loader = "region_cityscapes_dom_w_gt"
    active, _ = build_active_datasets(cfg)
    label = active.trg_label_dataset
    assert isinstance(label, RegionStatsDataset)
    # the wrapper rides the dominant base's (empty-start) bookkeeping
    assert len(label) == 0
    label.im_idx = [active.trg_pool_dataset.im_idx[0]]
    label.suppix = {active.trg_pool_dataset.im_idx[0][2]: [0, 3]}
    item = label[0]
    assert item["target"].shape == (16, 16)
    assert item["spmask"].shape == (16, 16)


def test_voc_dominant_single_column_datalist(tmp_path):
    """VOC dominant datalists are bare ids; paths construct VOC-style with
    the seeds dir keyed by cfg.nseg (region_voc_dominant_16.py:81-91,
    un-hardcoding the reference's seeds_16)."""
    from mulactseg_tpu.data.datasets import RegionDatasetDominant
    from mulactseg_tpu.data.synthetic import grid_superpixels

    rng = np.random.RandomState(3)
    spx = grid_superpixels(H, W, S)
    dom = rng.randint(0, 21, S).astype(np.uint8)[spx]
    (tmp_path / "VOC2012" / "JPEGImages").mkdir(parents=True)
    seeds = tmp_path / "superpixels" / "pascal_voc_seg" / f"seeds_{S}"
    (seeds / "train" / "gtFine_dominant_ignore").mkdir(parents=True)
    (seeds / "train" / "label").mkdir(parents=True)
    Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
        tmp_path / "VOC2012" / "JPEGImages" / "2007_000032.jpg")
    Image.fromarray(dom).save(
        seeds / "train" / "gtFine_dominant_ignore" / "2007_000032.png")
    with open(seeds / "train" / "label" / "2007_000032.pkl", "wb") as f:
        pickle.dump({"labels": spx}, f)
    (tmp_path / "train.txt").write_text("2007_000032")
    (tmp_path / "train.dict").write_text(
        json.dumps({"2007_000032": [S, []]}))

    cfg = Config(num_classes=21, nseg=S, data_root=str(tmp_path),
                 dataset="voc", or_labeling=False, dominant_labeling=True,
                 loader="region_voc_dominant_16")
    ds = RegionDatasetDominant(cfg, str(tmp_path / "train.txt"),
                               str(tmp_path / "train.dict"),
                               full_supervision=True)
    item = ds[0]
    np.testing.assert_array_equal(item["labels"], dom.astype(np.int32))


def test_config_dominant_datalist_substitution():
    cfg = Config(dominant_labeling=True, or_labeling=False)
    cfg.derive_paths()
    assert cfg.trg_datalist.endswith("_dominant.txt")
