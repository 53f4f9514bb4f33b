"""Research-loader multi-hot rewrites (data/research_filters.py) against
numpy transcriptions of the reference loaders
(region_cityscapes_or_tensor_{tinyfilter,ratiofilter,ratiosample,
dominantsample,toponebase}_gt.py), plus sp_gt_size generation and the
SYNTHIA/GTA5 val-dataset encodings."""

import numpy as np
import pytest

from mulactseg_tpu.data.research_filters import (
    dominantsample,
    ratiofilter,
    ratiosample,
    tinyfilter,
    toponebase,
)

N, S, C = 2, 6, 5


@pytest.fixture()
def fixture():
    rng = np.random.RandomState(0)
    sizes = rng.randint(0, 40, (N, S, C)).astype(np.int32)
    sizes[0, 3] = -1  # absent superpixel row
    mh = (sizes > 10).astype(np.uint8)
    return mh, sizes


def test_tinyfilter_parity(fixture):
    mh, sizes = fixture
    got = tinyfilter(mh, sizes, filter_size=20)
    # transcription of filter_tiny_cls_wgt (tinyfilter_gt.py:33-50)
    want = np.where(sizes < 20, 0, mh)
    flat = want.reshape(-1, C).copy()
    top = sizes.reshape(-1, C).argmax(1)
    flat[np.arange(N * S), top] = 1
    assert (got == flat.reshape(N, S, C)).all()
    # untouched input
    assert (mh == fixture[0]).all()


def test_ratiofilter_parity(fixture):
    mh, sizes = fixture
    got = ratiofilter(mh, sizes, filter_ratio=0.3)
    sz = np.where(sizes == -1, 0, sizes).astype(np.float64)
    ratio = sz / (sz.sum(-1, keepdims=True) + 1e-12)
    want = np.where(ratio < 0.3, 0, mh)
    assert (got == want).all()


def test_toponebase_is_onehot_at_max(fixture):
    mh, sizes = fixture
    got = toponebase(mh, sizes)
    assert (got.sum(-1) == 1).all()
    assert (got.argmax(-1) == sizes.argmax(-1)).all()


def test_ratiosample_invariants(fixture):
    mh, sizes = fixture
    rng = np.random.RandomState(7)
    got = ratiosample(mh, sizes, filter_ratio=0.2, rng=rng)
    sz = np.where(sizes == -1, 0, sizes).astype(np.float64)
    ratio = sz / (sz.sum(-1, keepdims=True) + 1e-12)
    # a class newly turned ON must have positive GT share
    turned_on = (got == 1) & (mh == 0)
    assert (ratio[turned_on] > 0).all()
    # absent superpixels (zero total share) never gain labels
    empty = sz.sum(-1) == 0
    assert got[empty].sum() == 0


def test_dominantsample_one_class_max(fixture):
    mh, sizes = fixture
    got = dominantsample(mh, sizes, rng=np.random.RandomState(3))
    assert (got.sum(-1) <= 1).all()
    sz = np.where(sizes == -1, 0, sizes).astype(np.float64)
    empty = sz.sum(-1) == 0
    assert got[empty].sum() == 0
    on = got.reshape(-1, C).argmax(1)[got.reshape(-1, C).sum(1) == 1]
    # deterministic forced case: one class holds all mass
    forced_sizes = np.zeros((1, 1, C), np.int32)
    forced_sizes[0, 0, 2] = 100
    forced = dominantsample(np.ones((1, 1, C), np.uint8), forced_sizes,
                            rng=np.random.RandomState(0))
    assert forced[0, 0].argmax() == 2 and forced[0, 0].sum() == 1


def test_sp_gt_size_generation(tmp_path):
    from mulactseg_tpu.data.synthetic import grid_superpixels
    from mulactseg_tpu.tools.label_assignment import (
        generate_multi_hot_dataset, multi_hot_for_image)

    rng = np.random.RandomState(1)
    H = W = 12
    spx = grid_superpixels(H, W, S)
    gt = rng.randint(0, C, (H, W))
    mh, sz, cs = multi_hot_for_image(gt, spx, S, C, trim=False,
                                     return_class_sizes=True)
    # brute force counts
    for s in range(S):
        m = spx == s
        for c in range(C):
            want = int(((gt == c) & m).sum())
            if m.sum() == 0:
                assert cs[s, c] == -1
            else:
                assert cs[s, c] == want, (s, c)
    generate_multi_hot_dataset([(gt, spx)], S, C, str(tmp_path / "mh"),
                               trim=False)
    import os

    assert os.path.exists(tmp_path / "mh" / "sp_gt_size.npy")


def test_region_dataset_multihot_transform(tmp_path):
    """RegionDatasetOr applies the named rewrite at construction."""
    import json
    import pickle

    from PIL import Image

    from mulactseg_tpu.config import Config
    from mulactseg_tpu.data.datasets import RegionDatasetOr
    from mulactseg_tpu.data.synthetic import grid_superpixels

    rng = np.random.RandomState(0)
    H = W = 12
    root = tmp_path
    spx = grid_superpixels(H, W, S)
    Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
        root / "img_0.png")
    Image.fromarray(rng.randint(0, C, (H, W)).astype(np.uint8)).save(
        root / "lbl_0.png")
    with open(root / "spx_0.pkl", "wb") as f:
        pickle.dump({"labels": spx}, f)
    (root / "train.txt").write_text("img_0.png\tlbl_0.png\tspx_0.pkl")
    (root / "train.dict").write_text(json.dumps({"spx_0.pkl": [S, []]}))

    mh = (rng.rand(1, S, C + 1) < 0.5).astype(np.uint8)
    sizes = rng.randint(0, 30, (1, S, C + 1)).astype(np.int32)
    cfg = Config(num_classes=C, nseg=S, data_root=str(root),
                 label_encoding="identity", multihot_filter_size=15,
                 loader="region_cityscapes_or_tensor_tinyfilter_gt")
    ds = RegionDatasetOr(cfg, str(root / "train.txt"),
                         str(root / "train.dict"), split="active-label",
                         multi_hot_cls=mh.copy(),
                         multihot_transform="tinyfilter", sp_gt_size=sizes)
    want = tinyfilter(mh, sizes, 15)
    assert (ds.multi_hot_cls == want).all()


def test_encode_synthia():
    from mulactseg_tpu.data.datasets import encode_synthia

    raw = np.array([[3, 1, 0], [21, 34, 40]], np.int64)
    out = encode_synthia(raw)
    # syn_id_to_train_id: 3->0, 1->10, 0->255, 21->3, 34->255, oob->255
    assert out.tolist() == [[0, 10, 255], [3, 255, 255]]


def test_tinyfilter_recommend_parity(fixture):
    from mulactseg_tpu.data.research_filters import tinyfilter_recommend

    mh, sizes = fixture
    got = tinyfilter_recommend(mh, sizes, filter_size=20)
    # transcription of tinyfilter_recommend_gt.py:33-58
    small = sizes < 20
    dominant = np.logical_not(small).sum(-1) < 2
    want = np.where(small & dominant[..., None], 0, mh)
    flat = want.reshape(-1, C).copy()
    top = sizes.reshape(-1, C).argmax(1)
    flat[np.arange(N * S), top] = 1
    assert (got == flat.reshape(N, S, C)).all()


def test_oracle_labels_masking(tmp_path):
    """region_cityscapes_or_oracle.py:29-45: GT inside selected spx with
    255 -> extra class, everything unselected -> 255."""
    import json
    import pickle

    from PIL import Image

    from mulactseg_tpu.config import Config
    from mulactseg_tpu.data.datasets import RegionDatasetOr, encode_identity
    from mulactseg_tpu.data.synthetic import grid_superpixels

    rng = np.random.RandomState(0)
    H = W = 12
    root = tmp_path
    spx = grid_superpixels(H, W, S)
    gt = rng.randint(0, C, (H, W)).astype(np.uint8)
    gt[0, 0] = 255
    Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
        root / "img_0.png")
    Image.fromarray(gt).save(root / "lbl_0.png")
    with open(root / "spx_0.pkl", "wb") as f:
        pickle.dump({"labels": spx}, f)
    (root / "train.txt").write_text("img_0.png\tlbl_0.png\tspx_0.pkl")
    (root / "train.dict").write_text(json.dumps({"spx_0.pkl": [S, []]}))

    mh = np.ones((1, S, C + 1), np.uint8)
    cfg = Config(num_classes=C, nseg=S, data_root=str(root),
                 label_encoding="identity")
    ds = RegionDatasetOr(cfg, str(root / "train.txt"),
                         str(root / "train.dict"), split="active-label",
                         multi_hot_cls=mh, oracle_labels=True,
                         encode_fn=encode_identity)
    ds.suppix = {str(root / "spx_0.pkl"): [0, 2]}
    s = ds[0]
    sel = np.isin(spx, [0, 2])
    assert (s["labels"][~sel] == 255).all()
    inside = s["labels"][sel]
    want = np.where(gt == 255, C, gt)[sel]
    assert (inside == want).all()
