"""Stat/vis loaders (data/stats.py): vectorized implementations match
brute-force transcriptions of the reference per-superpixel loops."""

import numpy as np
import pytest

from mulactseg_tpu.data.stats import (
    sample_dominant_map,
    superpixel_composition,
    superpixel_count_stats,
)

H = W = 32
S, C = 11, 6


@pytest.fixture()
def fixture():
    rng = np.random.RandomState(0)
    from mulactseg_tpu.data.synthetic import grid_superpixels

    spx = grid_superpixels(H, W, S)
    gt = rng.randint(0, C, (H, W)).astype(np.int64)
    gt[rng.rand(H, W) < 0.1] = 255
    selected = [0, 2, 5, 7, 10]
    return gt, spx, selected


def test_count_stats_matches_reference_loop(fixture):
    """region_cityscapes_count_all.py:40-50 transcription."""
    gt, spx, selected = fixture
    size_bin, ncls_bin = superpixel_count_stats(gt, spx, S, C, selected)

    np.testing.assert_array_equal(
        size_bin, np.unique(spx.reshape(-1), return_counts=True)[1])
    t = gt.reshape(-1)
    sp = spx.reshape(-1)
    for sdx, p in enumerate(selected):
        m = (sp == p) & (t != 255)
        u, c = np.unique(t[m], return_counts=True)
        want = u.size if c.size else 0
        assert ncls_bin[sdx] == want, (sdx, p)


def test_composition_matches_reference_loop(fixture):
    """region_cityscapes_visualize_minor.py:47-75 transcription."""
    gt, spx, selected = fixture
    cls, size = superpixel_composition(gt, spx, S, C, selected)
    t = gt.reshape(-1)
    sp = spx.reshape(-1)
    for p in range(S):
        if p not in selected:
            assert not cls[p].any()
            assert (size[p] == -1).all()
            continue
        m = sp == p
        u, c = np.unique(t[m], return_counts=True)
        for ui, ci in zip(u, c):
            col = C if ui == 255 else ui
            assert cls[p, col] == 1
            assert size[p, col] == ci
        absent = np.setdiff1d(np.arange(C + 1),
                              np.where(u == 255, C, u))
        assert not cls[p, absent].any()
        assert (size[p, absent] == -1).all()


def test_sample_dominant_distribution(fixture):
    """dominant_all_sample: the sampled label is always a class present
    in the superpixel, ignore pixels are restored, and over many draws
    the sampling tracks the pixel-count distribution."""
    gt, spx, selected = fixture
    rng = np.random.RandomState(1)
    t = gt.reshape(-1)
    sp = spx.reshape(-1)

    p = selected[1]
    m = (sp == p) & (t != 255)
    u, c = np.unique(t[m], return_counts=True)
    probs = c / c.sum()
    draws = []
    for _ in range(300):
        dom = sample_dominant_map(gt, spx, S, C, [p], rng)
        dm = dom.reshape(-1)
        vals = np.unique(dm[m])
        assert vals.size == 1 and vals[0] in u
        # ignore pixels restored
        assert (dom.reshape(-1)[(sp == p) & (t == 255)] == 255).all()
        # unselected superpixels untouched
        assert (dom.reshape(-1)[sp != p] == t[sp != p]).all()
        draws.append(vals[0])
    freq = np.array([np.mean(np.array(draws) == ui) for ui in u])
    np.testing.assert_allclose(freq, probs, atol=0.12)


def test_region_stats_dataset_modes(tmp_path, fixture):
    """RegionStatsDataset item contracts for all four modes on a disk
    fixture."""
    import json
    import pickle

    from PIL import Image

    from mulactseg_tpu.config import Config
    from mulactseg_tpu.data.datasets import RegionDatasetOr, encode_identity
    from mulactseg_tpu.data.stats import RegionStatsDataset
    from mulactseg_tpu.tools.label_assignment import generate_multi_hot_dataset

    gt, spx, selected = fixture
    root = tmp_path
    img = np.random.RandomState(2).randint(0, 255, (H, W, 3), np.uint8)
    Image.fromarray(img).save(root / "img_0.png")
    Image.fromarray(gt.astype(np.uint8)).save(root / "lbl_0.png")
    with open(root / "spx_0.pkl", "wb") as f:
        pickle.dump({"labels": spx}, f)
    (root / "train.txt").write_text("img_0.png\tlbl_0.png\tspx_0.pkl")
    (root / "train.dict").write_text(json.dumps({"spx_0.pkl": [S, []]}))
    mh, _ = generate_multi_hot_dataset([(gt.astype(np.uint8), spx)], S, C,
                                       str(root / "mh"), trim=False)
    cfg = Config(num_classes=C, nseg=S, data_root=str(root),
                 or_labeling=True, loader="region_or_tensor")
    base = RegionDatasetOr(cfg, str(root / "train.txt"),
                           str(root / "train.dict"),
                           split="active-label", encode_fn=encode_identity,
                           multi_hot_cls=mh)
    base.suppix = {base.im_idx[0][2]: selected}

    item = RegionStatsDataset(cfg, base, "count_all")[0]
    assert item["num_class_bin"].shape == (S,)
    item = RegionStatsDataset(cfg, base, "visualize_minor")[0]
    cls, size = item["superpixel_info"]
    assert cls.shape == (S, C + 1) and size.shape == (S, C + 1)
    item = RegionStatsDataset(cfg, base, "dominant_sample")[0]
    assert item["labels"].shape == (H, W)
    item = RegionStatsDataset(cfg, base, "dom_w_gt", pred_ignore=True)[0]
    assert (item["target"][~item["spmask"]] == cfg.ignore_idx).all()
    assert (item["labels"] != 255).all()  # 255 -> C under pred_ignore

    # train-loader modes apply the base's transform (reference order:
    # transform BEFORE masking/sampling — region_cityscapes_dom_w_gt.py:65,
    # region_cityscapes_dominant_all_sample.py:31); sampling ADVANCES per
    # call (fresh label noise each epoch, the point of the 'sample' arm)
    from mulactseg_tpu.data.transforms import PairedTransform

    base.transform = PairedTransform(crop_size=(16, 16), seed=3)
    # same seed -> same streams from a fresh instance (deterministic runs)
    a = RegionStatsDataset(cfg, base, "dominant_sample", seed=7)[0]
    b = RegionStatsDataset(cfg, base, "dominant_sample", seed=7)[0]
    assert a["images"].shape == (16, 16, 3)
    assert a["labels"].shape == (16, 16)
    np.testing.assert_array_equal(a["labels"], b["labels"])
    item = RegionStatsDataset(cfg, base, "dom_w_gt", pred_ignore=True)[0]
    assert item["target"].shape == (16, 16)
    assert item["spmask"].shape == (16, 16)
    assert (item["target"][~item["spmask"]] == cfg.ignore_idx).all()
    sp = item["spx"]
    want_mask = np.isin(sp, np.asarray(selected))
    np.testing.assert_array_equal(item["spmask"], want_mask)

    # ...but repeated reads RE-SAMPLE: a 50/50 two-class superpixel must
    # see both labels within 12 epochs (P[all same] ~ 2^-11)
    gt5050 = np.zeros((H, W), np.int64)
    gt5050[:, W // 2:] = 1
    Image.fromarray(gt5050.astype(np.uint8)).save(root / "lbl_0.png")
    from mulactseg_tpu.data.datasets import _decode_cache
    _decode_cache.clear()
    base.transform = None
    ds = RegionStatsDataset(cfg, base, "dominant_sample", seed=7)
    spx_map = np.asarray(fixture[1])
    straddling = [p for p in range(S)
                  if len(np.unique(gt5050[spx_map == p])) == 2]
    assert straddling
    base.suppix[base.im_idx[0][2]] = straddling
    seen = set()
    for _ in range(12):
        lab = ds[0]["labels"]
        seen.add(int(lab[spx_map == straddling[0]][0]))
    assert seen == {0, 1}
