"""Round-trip tests of the reference on-disk formats: datalist txt +
region dict json + multi_hot npy + spx pkl/png + plbl PNGs, plus the
offline label-assignment tools."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from mulactseg_tpu.config import Config
from mulactseg_tpu.data import (
    EvalRegionDatasetAll,
    RegionDatasetOr,
    RegionDatasetPlbl,
    ValDataset,
    encode_identity,
    load_region_dict,
    open_spx,
)
from mulactseg_tpu.data.synthetic import grid_superpixels
from mulactseg_tpu.tools.label_assignment import (
    dominant_label_for_image,
    generate_multi_hot_dataset,
    multi_hot_for_image,
)


@pytest.fixture()
def disk_fixture(tmp_path):
    """Write a 2-image dataset in the reference's layout."""
    rng = np.random.RandomState(0)
    H = W = 24
    S, C = 16, 5
    root = tmp_path
    rows = []
    region = {}
    gts = []
    spx_map = grid_superpixels(H, W, S)
    for i in range(2):
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        gt = rng.randint(0, C, (H, W)).astype(np.uint8)
        gt[0, :4] = 255
        gts.append(gt)
        Image.fromarray(img).save(root / f"img_{i}.png")
        Image.fromarray(gt).save(root / f"lbl_{i}.png")
        if i == 0:
            with open(root / f"spx_{i}.pkl", "wb") as f:
                pickle.dump({"labels": spx_map}, f)
            spx_name = f"spx_{i}.pkl"
        else:
            Image.fromarray(spx_map.astype(np.int32), mode="I").save(
                root / f"spx_{i}.png")
            spx_name = f"spx_{i}.png"
        rows.append(f"img_{i}.png\tlbl_{i}.png\t{spx_name}")
        region[spx_name] = [S, [3]]  # id 3 missing
    datalist = root / "train.txt"
    datalist.write_text("\n".join(rows))
    (root / "train.dict").write_text(json.dumps(region))

    mh, sizes = generate_multi_hot_dataset(
        [(g, spx_map) for g in gts], S, C, str(root / "mh"), trim=False)
    cfg = Config(num_classes=19, nseg=S, data_root=str(root),
                 or_labeling=True, loader="region_or_tensor")
    return cfg, root, datalist, gts, spx_map, mh, S, C


def test_region_dataset_or_roundtrip(disk_fixture):
    cfg, root, datalist, gts, spx_map, mh, S, C = disk_fixture
    ds = RegionDatasetOr(cfg, str(datalist), str(root / "train.dict"),
                         split="active-label", encode_fn=encode_identity,
                         multi_hot_cls=mh)
    assert len(ds) == 2
    assert ds.suppix[ds.im_idx[0][2]] == [i for i in range(S) if i != 3]
    # select a couple of spxs, check spmask
    ds.suppix[ds.im_idx[0][2]] = [0, 5]
    s = ds[0]
    assert s["images"].shape == (24, 24, 3)
    assert s["target"].shape == (S, C + 1)
    want_mask = np.isin(spx_map, [0, 5])
    np.testing.assert_array_equal(s["spmask"], want_mask)
    # pool item
    ds.split = "active-ulabel"
    p = ds[1]
    assert "spx" in p and p["spx"].dtype == np.int32


def test_eval_all_and_plbl_roundtrip(disk_fixture, tmp_path):
    cfg, root, datalist, gts, spx_map, mh, S, C = disk_fixture
    ds = RegionDatasetOr(cfg, str(datalist), str(root / "train.dict"),
                         split="active-label", encode_fn=encode_identity,
                         multi_hot_cls=mh)
    suppix = {ds.im_idx[0][2]: [0, 1]}
    ev = EvalRegionDatasetAll(cfg, ds, suppix)
    assert len(ev) == 1
    item = ev[0]
    # 255 GT pixels remapped to the extra class (num_classes)
    assert (item["labels"] == cfg.num_classes).sum() == 4
    assert item["spmask"].sum() == np.isin(spx_map, [0, 1]).sum()

    # stage-2 plbl loader
    plbl_dir = tmp_path / "plbl"
    plbl_dir.mkdir()
    fake = np.full((24, 24), 7, np.uint8)
    Image.fromarray(fake).save(plbl_dir / "lbl_0.png")
    s2 = RegionDatasetPlbl(cfg, [ds.im_idx[0]], str(plbl_dir))
    item = s2[0]
    assert (item["labels"] == 7).all()


def test_or_plbl_loader(disk_fixture, tmp_path):
    """or_plbl: multi-hot sample + previous-round plbl map as 'labels'
    (region_cityscapes_or_plbl.py:26-60)."""
    cfg, root, datalist, gts, spx_map, mh, S, C = disk_fixture
    plbl_dir = tmp_path / "plbl_gen" / "round_00"
    plbl_dir.mkdir(parents=True)
    rng = np.random.RandomState(3)
    plbls = []
    for i in range(2):
        p = rng.randint(0, C, (24, 24)).astype(np.uint8)
        p[1, :3] = 255
        plbls.append(p)
        Image.fromarray(p).save(plbl_dir / f"lbl_{i}.png")
    ds = RegionDatasetOr(cfg, str(datalist), str(root / "train.dict"),
                         split="active-label", encode_fn=encode_identity,
                         multi_hot_cls=mh, plbl_dir=str(plbl_dir))
    ds.suppix[ds.im_idx[1][2]] = [0, 5]
    s = ds[1]
    # no transform: the plbl map comes through untouched
    np.testing.assert_array_equal(s["labels"], plbls[1].astype(np.int32))
    assert s["target"].shape == (S, C + 1)
    np.testing.assert_array_equal(s["spmask"], np.isin(spx_map, [0, 5]))
    # _sequence criterion contract: labels + target + spx + spmask present
    assert {"images", "labels", "target", "spx", "spmask"} <= set(s)
    # the pool split is unaffected (inherited __getpoolitem__ behavior)
    ds.split = "active-ulabel"
    assert "labels" not in ds[0]


def test_label_assignment_cli(disk_fixture, tmp_path):
    """The runnable twin of tools/label_assignment_tensor.py /
    label_assignment_dominant.py over the on-disk fixture."""
    from mulactseg_tpu.tools.label_assignment import main as tool_main

    cfg, root, datalist, gts, spx_map, mh, S, C = disk_fixture
    out = tmp_path / "mh_cli"
    tool_main(["--datalist", str(datalist), "--data_root", str(root),
               "--save_data_dir", str(out), "--nseg", str(S),
               "--num_classes", str(C), "--label-encoding", "identity",
               "--trim_multihot_boundary", "--trim_kernel_size", "3"])
    got = np.load(out / "multi_hot_cls.npy")
    assert got.shape == (2, S, C + 1)
    # same generator the fixture used (trim=False there) — recompute
    from mulactseg_tpu.tools.label_assignment import multi_hot_for_image
    want0, _ = multi_hot_for_image(gts[0], spx_map, S, C, trim=True,
                                   trim_kernel=3)
    np.testing.assert_array_equal(got[0], want0)

    dom_dir = tmp_path / "dom_cli"
    tool_main(["--mode", "dominant", "--datalist", str(datalist),
               "--data_root", str(root), "--save_data_dir", str(dom_dir),
               "--nseg", str(S), "--num_classes", str(C),
               "--label-encoding", "identity"])
    pngs = sorted(os.listdir(dom_dir))
    assert len(pngs) == 2
    dom = np.asarray(Image.open(dom_dir / pngs[0]))
    # non-ignore mode: original 255 pixels restored
    assert (dom[gts[0] == 255] == 255).all()
    # each superpixel (outside restored 255s) carries one class
    for s in range(S):
        m = (spx_map == s) & (gts[0] != 255)
        if m.any():
            assert len(np.unique(dom[m])) == 1


def test_normalize_bf16_lut_matches_cast():
    """normalize(img, bf16) must be bit-identical to
    normalize(img).astype(bf16) — the bf16 LUT is the f32 table rounded
    once, so the one-pass gather equals the two-pass cast."""
    import ml_dtypes

    from mulactseg_tpu.data.transforms import (
        PairedTransform,
        normalize,
        train_out_dtype,
    )

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (40, 56, 3), np.uint8)
    direct = normalize(img, ml_dtypes.bfloat16)
    two_pass = normalize(img).astype(ml_dtypes.bfloat16)
    assert direct.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(direct.view(np.uint16),
                                  two_pass.view(np.uint16))

    cfg_bf16 = Config(dtype="bfloat16")
    assert train_out_dtype(cfg_bf16) == ml_dtypes.bfloat16
    assert train_out_dtype(Config(dtype="float32")) == np.float32
    # ship_uint8 keeps crops u8 — the dtype knob must not interfere
    assert train_out_dtype(Config(dtype="bfloat16",
                                  ship_uint8=True)) == np.float32
    tf = PairedTransform(out_dtype=ml_dtypes.bfloat16)
    out, _ = tf(img, [np.zeros((40, 56), np.int32)])
    assert out.dtype == ml_dtypes.bfloat16


def test_gen_datalists_cli(disk_fixture, tmp_path):
    from mulactseg_tpu.data import load_region_dict
    from mulactseg_tpu.tools.gen_datalists import main as gen_main

    cfg, root, datalist, gts, spx_map, mh, S, C = disk_fixture
    out = tmp_path / "init_data"
    gen_main(["--data_root", str(root), "--nseg", str(S),
              "--img-glob", "img_*.png",
              "--lbl-sub", "img_=lbl_",
              "--spx-sub", "img_0.png=spx_0.pkl",
              "--spx-sub", "img_1.png=spx_1.png",
              "--out-dir", str(out)])
    rows = (out / f"train_seed{S}.txt").read_text().splitlines()
    assert rows[0] == "img_0.png\tlbl_0.png\tspx_0.pkl"
    region = load_region_dict(str(out / "train.dict"))
    # the grid map contains every id -> no missing ids
    assert list(region["spx_0.pkl"]) == list(range(S))


def test_or_plbl_dispatch_requires_checkpoint(disk_fixture, monkeypatch):
    from mulactseg_tpu.cli.common import build_active_datasets

    cfg, root, datalist, gts, spx_map, mh, S, C = disk_fixture
    cfg.loader = "region_cityscapes_or_plbl"
    cfg.trg_datalist = str(datalist)
    cfg.region_dict = str(root / "train.dict")
    cfg.resume_checkpoint = ""
    with pytest.raises(ValueError, match="resume-checkpoint"):
        build_active_datasets(cfg)


def test_val_dataset(disk_fixture):
    cfg, root, datalist, gts, spx_map, mh, S, C = disk_fixture
    vl = root / "val.txt"
    vl.write_text("img_0.png\tlbl_0.png")
    ds = ValDataset(cfg, str(vl), encode_fn=encode_identity)
    item = ds[0]
    np.testing.assert_array_equal(item["labels"], gts[0].astype(np.int32))


def test_open_spx_formats(disk_fixture):
    cfg, root, datalist, gts, spx_map, mh, S, C = disk_fixture
    a = open_spx(str(root / "spx_0.pkl"))
    b = open_spx(str(root / "spx_1.png"))
    np.testing.assert_array_equal(a, spx_map)
    np.testing.assert_array_equal(b, spx_map)


def test_multi_hot_tool_against_bruteforce():
    rng = np.random.RandomState(1)
    H = W = 30
    S, C = 9, 4
    spx = grid_superpixels(H, W, S)
    gt = rng.randint(0, C, (H, W))
    gt[rng.rand(H, W) < 0.1] = 255
    mh, sizes = multi_hot_for_image(gt, spx, S, C, trim=False)
    for s in range(S):
        m = spx == s
        present = set(np.unique(gt[m]).tolist())
        for c in range(C):
            assert mh[s, c] == (c in present)
        assert mh[s, C] == (255 in present)
        assert sizes[s] == m.sum()


def test_multi_hot_trim_vanish_fallback():
    # a 1-pixel-wide superpixel vanishes under trim -> falls back to full
    spx = np.zeros((8, 8), np.int32)
    spx[:, 4:] = 1
    gt = np.zeros((8, 8), np.int64)
    gt[:, 4:] = 2
    mh, sizes = multi_hot_for_image(gt, spx, 4, 3, trim=True, trim_kernel=5)
    assert mh[0, 0] == 1 and mh[1, 2] == 1  # both survive via fallback


def test_dominant_label():
    spx = grid_superpixels(6, 6, 4)
    gt = np.zeros((6, 6), np.int64)
    gt[spx == 1] = 2
    gt[0, 3] = 255  # minority ignore in spx 1
    dom = dominant_label_for_image(gt, spx, 4, 3)
    assert (dom[spx == 1] == 2).all()
    assert (dom[spx == 0] == 0).all()


def test_async_and_small_spx_disk_loader(disk_fixture, tmp_path):
    """The _ignore_async loader contract: weak (unaugmented, resized) view
    with its own spmask, plus the finer superpixel map by path
    substitution (region_cityscapes_or_tensor_ignore_async.py:17-71)."""
    import pickle
    from mulactseg_tpu.data.synthetic import grid_superpixels
    cfg, root, datalist, gts, spx_map, mh, S, C = disk_fixture
    # write the finer superpixel files the seeds-path substitution expects
    import dataclasses
    cfg = dataclasses.replace(cfg, small_nseg=36)
    small_map = grid_superpixels(24, 24, 36)
    for i in range(2):
        src = root / f"spx_{i}.pkl" if i == 0 else root / f"spx_{i}.png"
    # loader substitutes seeds_{nseg} in the path; our fixture paths lack
    # that token, so place files under names that contain it
    rows = []
    for i in range(2):
        with open(root / f"seeds_{S}_spx_{i}.pkl", "wb") as f:
            pickle.dump({"labels": spx_map}, f)
        with open(root / f"seeds_36_spx_{i}.pkl", "wb") as f:
            pickle.dump({"labels": small_map}, f)
        rows.append(f"img_{i}.png\tlbl_{i}.png\tseeds_{S}_spx_{i}.pkl")
    dl = root / "train_async.txt"
    dl.write_text("\n".join(rows))
    import json as _json
    (root / "train_async.dict").write_text(_json.dumps(
        {f"seeds_{S}_spx_{i}.pkl": [S, []] for i in range(2)}))

    from mulactseg_tpu.data import RegionDatasetOr, encode_identity
    ds = RegionDatasetOr(cfg, str(dl), str(root / "train_async.dict"),
                         split="active-label", encode_fn=encode_identity,
                         multi_hot_cls=mh, ignore_gt_in_spmask=True,
                         load_smaller_spx=True, async_views=True,
                         weak_size=(24, 24))
    s = ds[0]
    for k in ("images_weak", "spx_weak", "spmask_weak", "spx_small",
              "spx_small_weak", "labels"):
        assert k in s, k
    assert s["spx_small"].max() < 36
    # weak spmask excludes GT-255 pixels
    assert not s["spmask_weak"][s["labels"] == 255].any()
    assert s["images_weak"].shape == (24, 24, 3)


def test_asyncv2_weak_hflip_redraws_per_call(disk_fixture, tmp_path):
    """asyncv2's weak view random-hflips with a FRESH draw every call
    (region_cityscapes_or_tensor_ignore_asyncv2.py:19) — within 12 reads
    of one item both orientations must appear (P[all same] ~ 2^-11)."""
    import json as _json
    import pickle

    import numpy as np

    cfg, root, datalist, gts, spx_map, mh, S, C = disk_fixture
    rows = [f"img_0.png\tlbl_0.png\tv2_spx_0.pkl"]
    with open(root / "v2_spx_0.pkl", "wb") as f:
        pickle.dump({"labels": spx_map}, f)
    (root / "train_v2.txt").write_text("\n".join(rows))
    (root / "train_v2.dict").write_text(
        _json.dumps({"v2_spx_0.pkl": [S, []]}))

    from mulactseg_tpu.data import RegionDatasetOr, encode_identity
    ds = RegionDatasetOr(cfg, str(root / "train_v2.txt"),
                         str(root / "train_v2.dict"),
                         split="active-label", encode_fn=encode_identity,
                         multi_hot_cls=mh, async_views=True,
                         async_weak_hflip=True, weak_size=(24, 24))
    orientations = set()
    first = None
    for _ in range(12):
        w = ds[0]["images_weak"]
        if first is None:
            first = w
        if np.allclose(w, first):
            orientations.add("same")
        elif np.allclose(w, first[:, ::-1]):
            orientations.add("flipped")
    assert orientations == {"same", "flipped"}


def test_dataprovider_tiny_dataset_no_hang():
    """A labeled set smaller than the batch must not spin forever
    (pre-fix: drop_last yielded zero batches and the infinite iterator
    looped through empty epochs)."""
    from mulactseg_tpu.data.loader import DataProvider

    class One:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            import numpy as np

            return {"images": np.zeros((4, 4, 3), np.float32)}

    dp = DataProvider(One(), batch_size=2, num_workers=1, prefetch=1)
    b = next(iter(dp))
    assert b["images"].shape[0] == 2  # sampled with replacement


def test_eval_all_remove_dominant_and_withinmulti(disk_fixture):
    """eval_region_cityscapes_all.py:52-57 (analysis mode drops
    single-candidate superpixels) + eval_region_cityscapes_withinmulti.py:61
    (GT 255-masked outside spmask)."""
    cfg, root, datalist, gts, spx_map, mh, S, C = disk_fixture
    mh = np.array(mh, np.float32)
    idx0 = 0  # force superpixel 0 of image 0 to a single-candidate row
    mh[0, idx0] = 0
    mh[0, idx0, 2] = 1
    ds = RegionDatasetOr(cfg, str(datalist), str(root / "train.dict"),
                         split="active-label", encode_fn=encode_identity,
                         multi_hot_cls=mh)
    row_sums = np.asarray(mh[ds._target_index(ds.im_idx[0][1])]).sum(-1)
    single = [i for i in range(S) if row_sums[i] == 1]
    multi = [i for i in range(S) if row_sums[i] > 1]
    assert single and multi, "fixture needs both kinds"
    sel = [single[0], multi[0]]
    suppix = {ds.im_idx[0][2]: sel}

    plain = EvalRegionDatasetAll(cfg, ds, suppix)[0]
    filt = EvalRegionDatasetAll(cfg, ds, suppix, remove_dominant=True)[0]
    np.testing.assert_array_equal(plain["spmask"],
                                  np.isin(spx_map, sel))
    np.testing.assert_array_equal(filt["spmask"],
                                  np.isin(spx_map, [multi[0]]))

    wm = EvalRegionDatasetAll(cfg, ds, suppix, mask_unselected=True)[0]
    assert (wm["labels"][~wm["spmask"]] == cfg.ignore_idx).all()
    np.testing.assert_array_equal(wm["labels"][wm["spmask"]],
                                  plain["labels"][plain["spmask"]])


def test_box_resize_matches_resize_then_crop():
    """The train transform's box-resample fast path (PairedTransform.
    _scaled_crop) reproduces the generic full-resize-then-crop up to
    PIL's exact-tie rounding: same RNG draw order, bilinear image within
    2 uint8 LSB on <12% of pixels (PIL evaluates bilinear filter
    centers with different float rounding per path), nearest labels
    BYTE-IDENTICAL (the fast path gathers over the exact full-resize
    nearest grid), over scales covering both pad-if-needed and
    in-bounds crops."""
    from PIL import Image

    from mulactseg_tpu.data.transforms import (
        PairedTransform,
        normalize,
    )

    H0, W0, CROP, NSEG = 100, 200, 80, 64
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (H0, W0, 3), np.uint8)
    gt = rng.randint(0, 19, (H0, W0)).astype(np.uint8)
    spx = rng.randint(0, NSEG, (H0, W0)).astype(np.int32)

    def generic(seed):
        """Transcription of the materializing path."""
        r = np.random.RandomState(seed)
        s = r.uniform(0.5, 2.0)
        nh, nw = int(round(H0 * s)), int(round(W0 * s))
        im = np.asarray(Image.fromarray(img).resize((nw, nh),
                                                    Image.BILINEAR))
        g = np.asarray(Image.fromarray(gt).resize((nw, nh), Image.NEAREST))
        sp = np.asarray(Image.fromarray(spx, mode="I").resize(
            (nw, nh), Image.NEAREST))
        labels = [g, sp]
        h, w = im.shape[:2]
        if h < CROP or w < CROP:
            ph, pw = max(CROP - h, 0), max(CROP - w, 0)
            im = np.pad(im, ((0, ph), (0, pw), (0, 0)))
            for c, v in enumerate((124, 116, 104)):
                im[h:, :, c] = v
                im[:, w:, c] = v
            labels = [np.pad(labels[0], ((0, ph), (0, pw)),
                             constant_values=255),
                      np.pad(labels[1], ((0, ph), (0, pw)),
                             constant_values=NSEG)]
            h, w = im.shape[:2]
        y0 = r.randint(0, h - CROP + 1)
        x0 = r.randint(0, w - CROP + 1)
        im = im[y0:y0 + CROP, x0:x0 + CROP]
        labels = [l[y0:y0 + CROP, x0:x0 + CROP] for l in labels]
        if r.rand() < 0.5:
            im = im[:, ::-1]
            labels = [l[:, ::-1] for l in labels]
        return (normalize(np.ascontiguousarray(im)),
                [np.ascontiguousarray(l).astype(np.int32) for l in labels])

    from mulactseg_tpu.data.constants import IMAGENET_STD
    two_lsb = 2.0 / 255.0 / float(np.min(IMAGENET_STD)) + 1e-6
    pad_seen = inbounds_seen = False
    for seed in range(24):
        tf = PairedTransform(scale_range=(0.5, 2.0), crop_size=(CROP, CROP),
                             pad_values=[255, NSEG], hflip=True, seed=seed)
        got_im, got_lb = tf(img, [gt, spx])
        want_im, want_lb = generic(seed)
        d = np.abs(got_im - want_im)
        assert d.max() <= two_lsb, (seed, d.max())
        assert (d > 1e-6).mean() < 0.12, (seed, (d > 1e-6).mean())
        for a, b in zip(got_lb, want_lb):
            np.testing.assert_array_equal(a, b, err_msg=f"seed {seed}")
        s = np.random.RandomState(seed).uniform(0.5, 2.0)
        if round(H0 * s) < CROP or round(W0 * s) < CROP:
            pad_seen = True
        else:
            inbounds_seen = True
    assert pad_seen and inbounds_seen  # both branches exercised


def test_same_size_resize_identity_skip():
    """resize_image skips the resample when the size already matches
    (Cityscapes val resizes 1024x2048 images to 1024x2048 every step);
    pinned equal to the actual PIL resample output."""
    from PIL import Image

    from mulactseg_tpu.data.transforms import resize_image

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (40, 70, 3), np.uint8)
    lbl = rng.randint(0, 19, (40, 70)).astype(np.int32)
    np.testing.assert_array_equal(
        resize_image(img, (40, 70)),
        np.asarray(Image.fromarray(img).resize((70, 40), Image.BILINEAR)))
    np.testing.assert_array_equal(
        resize_image(lbl, (40, 70), nearest=True),
        np.asarray(Image.fromarray(lbl, mode="I").resize((70, 40),
                                                         Image.NEAREST)))


def test_pil_nearest_index_exact():
    """_pil_nearest_index replicates PIL's NEAREST source-index choice
    exactly, including accumulated-rounding ties, over random shapes."""
    from PIL import Image

    from mulactseg_tpu.data.transforms import _pil_nearest_index

    rng = np.random.RandomState(11)
    for _ in range(80):
        w0 = rng.randint(3, 400)
        nw = rng.randint(3, 500)
        a = np.arange(w0, dtype=np.int32)[None, :].repeat(2, 0)
        pil = np.asarray(Image.fromarray(a, mode="I").resize(
            (nw, 2), Image.NEAREST))[0]
        np.testing.assert_array_equal(_pil_nearest_index(w0, nw), pil,
                                      err_msg=f"{w0}->{nw}")


def test_normalize_lut_bit_identical():
    """The uint8 LUT fast path of normalize() is bit-identical to the
    arithmetic path (same float ops per byte value); non-uint8 input
    falls through to arithmetic."""
    from mulactseg_tpu.data.constants import IMAGENET_MEAN, IMAGENET_STD
    from mulactseg_tpu.data.transforms import normalize

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (33, 47, 3)).astype(np.uint8)
    want = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    got = normalize(img)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, want.astype(np.float32))
    # non-contiguous (hflip view) input
    np.testing.assert_array_equal(normalize(img[:, ::-1]),
                                  normalize(np.ascontiguousarray(img[:, ::-1])))
    # fallback path still works for float input
    f = img.astype(np.float32)
    np.testing.assert_allclose(normalize(f), want, rtol=1e-6)


def test_windowed_box_resize_byte_equal():
    """Slicing the source to the filter window (+ support margin) before
    a PIL box resize matches box-resizing the full image to within 1
    uint8 LSB on a small fraction of pixels (tie density grows at
    strong downscales; the composite transform is pinned separately) (the integer window shift changes PIL's
    float center evaluation by 1 ULP, flipping rare rounding ties; the
    sampling grid itself is unchanged). This is what PairedTransform.
    _scaled_crop does to avoid fromarray copying the whole source per
    item."""
    from mulactseg_tpu.data.transforms import resize_image

    rng = np.random.RandomState(17)
    H0, W0 = 100, 200
    img = rng.randint(0, 256, (H0, W0, 3)).astype(np.uint8)
    for seed in range(40):
        r = np.random.RandomState(seed)
        s = r.uniform(0.5, 2.0)
        nh, nw = int(round(H0 * s)), int(round(W0 * s))
        oh = r.randint(1, min(60, nh) + 1)
        ow = r.randint(1, min(60, nw) + 1)
        y0 = r.randint(0, nh - oh + 1)
        x0 = r.randint(0, nw - ow + 1)
        sy, sx = H0 / nh, W0 / nw
        box = (x0 * sx, y0 * sy, (x0 + ow) * sx, (y0 + oh) * sy)
        full = resize_image(img, (oh, ow), box=box)
        mgx = int(np.ceil(max(sx, 1.0))) + 2
        mgy = int(np.ceil(max(sy, 1.0))) + 2
        wx0 = max(int(np.floor(box[0])) - mgx, 0)
        wy0 = max(int(np.floor(box[1])) - mgy, 0)
        wx1 = min(int(np.ceil(box[2])) + mgx, W0)
        wy1 = min(int(np.ceil(box[3])) + mgy, H0)
        win = resize_image(img[wy0:wy1, wx0:wx1], (oh, ow),
                           box=(box[0] - wx0, box[1] - wy0,
                                box[2] - wx0, box[3] - wy0))
        d = np.abs(win.astype(int) - full.astype(int))
        assert d.max() <= 1, (seed, d.max())
        assert (d != 0).mean() < 0.15, (seed, (d != 0).mean())


def test_spmask_lut_matches_isin():
    """spmask_from_selected == np.isin for superpixel maps, including the
    crop-pad value nseg and an empty selection."""
    from mulactseg_tpu.data.datasets import spmask_from_selected

    rng = np.random.RandomState(19)
    nseg = 64
    spx = rng.randint(0, nseg + 1, (37, 53)).astype(np.int32)  # incl. pad
    for n_sel in (0, 1, 7, 40):
        sel = list(rng.choice(nseg, n_sel, replace=False))
        np.testing.assert_array_equal(
            spmask_from_selected(spx, sel, nseg), np.isin(spx, sel))
