"""Sliding-window eval, TTA feat-forward, and the pseudo-label generator
driven end-to-end on the synthetic fixture."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from mulactseg_tpu.config import Config
from mulactseg_tpu.data.loader import DataProvider
from mulactseg_tpu.data.synthetic import SyntheticRegionDataset
from mulactseg_tpu.engine.sliding import SlidingEval, _window_grid
from mulactseg_tpu.engine.tta import tta_feat_forward
from mulactseg_tpu.models.deeplab import DeepLabHeadV3Plus, DeepLabV3
from mulactseg_tpu.models.resnet import ResNet
from mulactseg_tpu.plbl.generator import PseudoLabelGenerator, plbl_save_dir


def tiny_model(num_classes):
    bb = ResNet(layers=(1, 1, 1, 1), deep_stem=True, stem_width=8)
    head = DeepLabHeadV3Plus(num_classes, (2, 4, 6), variant="wn")
    return DeepLabV3(backbone=bb, classifier=head)


def _init(num_classes=6, size=48):
    m = tiny_model(num_classes)
    x = jnp.ones((1, size, size, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return m, v


def test_window_grid_covers_image():
    padH, padW, pos = _window_grid(100, 160, 64, 2 / 3)
    cover = np.zeros((padH, padW), int)
    for y, x in pos:
        cover[y:y + 64, x:x + 64] += 1
    assert (cover > 0).all()


@pytest.mark.slow
def test_sliding_eval_matches_direct_on_small_image():
    # image smaller than one crop: sliding == direct forward
    m, v = _init()
    se = SlidingEval(m, num_classes=6, crop_size=64, stride_rate=2 / 3)
    img = jnp.asarray(np.random.RandomState(0).randn(1, 48, 48, 3),
                      jnp.float32)
    out = se(v["params"], v["batch_stats"], img)
    # 48 < crop 64: single window, center-padded; compare against direct
    # forward on the padded image cropped back
    pad = jnp.pad(img, ((0, 0), (8, 8), (8, 8), (0, 0)))
    want = m.apply(v, pad, train=False)[:, 8:56, 8:56, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4)


def test_sliding_eval_overlap_sums():
    m, v = _init()
    se = SlidingEval(m, num_classes=6, crop_size=64, stride_rate=2 / 3)
    img = jnp.asarray(np.random.RandomState(1).randn(1, 80, 112, 3),
                      jnp.float32)
    out = se(v["params"], v["batch_stats"], img)
    assert out.shape == (1, 80, 112, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_tta_shapes_and_flip_consistency():
    m, v = _init()
    img = jnp.asarray(np.random.RandomState(2).randn(1, 32, 32, 3),
                      jnp.float32)
    feat, logits = tta_feat_forward(m, v["params"], v["batch_stats"], img,
                                    scales=(1.0,))
    assert feat.shape == (1, 32, 32, 256)
    assert logits.shape == (1, 32, 32, 6)
    # feats re-normalized
    norms = np.linalg.norm(np.asarray(feat), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_plbl_generator_end_to_end(tmp_path):
    cfg = Config(num_classes=5, nseg=16, val_batch_size=1,
                 method="active_joint_multi_predignore_lossdecomp")
    m, v = _init(num_classes=6, size=32)
    ds = SyntheticRegionDataset(n_images=2, H=32, W=32, num_classes=5,
                                nseg=16, split="active-label", seed=3)
    # fake "eval-all" items: labels with 255 -> extra class, batch of 1
    class EvalView:
        def __len__(self):
            return len(ds)
        def __getitem__(self, i):
            s = ds[i]
            gt = np.where(s["labels"] == 255, cfg.num_classes, s["labels"])
            # multi-hot includes undefined channel: C+1 = 6 == model classes
            return {"images": s["images"], "labels": gt, "spx": s["spx"],
                    "spmask": s["spmask"], "target": s["target"],
                    "fnames": s["fnames"]}

    loader = DataProvider(EvalView(), 1, shuffle=False, drop_last=False,
                          infinite=False, num_workers=1)
    gen = PseudoLabelGenerator(m, cfg, plbl_type="cosprop_includeonehot",
                               max_protos=64)
    save_dir = str(tmp_path / "plbl")
    miou, iou_t, prec_t, rec_t = gen.generate(
        v["params"], v["batch_stats"], loader, save_dir=save_dir,
        suppix=ds.suppix)
    assert 0 <= miou <= 100
    import os
    files = os.listdir(save_dir)
    assert len(files) == 2 and all(f.endswith(".png") for f in files)
    assert plbl_save_dir("/x/checkpoint00.tar", "cosprop", "00").endswith(
        "plbl_gen_cosprop/round_00")


def test_plbl_generator_fused_matches_unfused(tmp_path):
    """The one-dispatch fused executable (generator._build_fused) must
    produce byte-identical plbl maps and the same streamed mIoU as the
    reference-shaped plbl_for_batch + MeanIoU chain it replaces."""
    cfg = Config(num_classes=5, nseg=16, val_batch_size=1,
                 method="active_joint_multi_predignore_lossdecomp")
    m, v = _init(num_classes=6, size=32)
    ds = SyntheticRegionDataset(n_images=2, H=32, W=32, num_classes=5,
                                nseg=16, split="active-label", seed=7)

    class EvalView:
        def __len__(self):
            return len(ds)
        def __getitem__(self, i):
            s = ds[i]
            gt = np.where(s["labels"] == 255, cfg.num_classes, s["labels"])
            return {"images": s["images"], "labels": gt, "spx": s["spx"],
                    "spmask": s["spmask"], "target": s["target"],
                    "fnames": s["fnames"]}

    import os
    results = {}
    for mode in ("fused", "unfused"):
        loader = DataProvider(EvalView(), 1, shuffle=False, drop_last=False,
                              infinite=False, num_workers=1)
        gen = PseudoLabelGenerator(m, cfg, plbl_type="cosprop_includeonehot",
                                   max_protos=64)
        if mode == "fused":
            assert gen._fused_step is not None
        else:
            gen._fused_step = None
        save_dir = str(tmp_path / mode)
        miou, *_ = gen.generate(v["params"], v["batch_stats"], loader,
                                save_dir=save_dir, suppix=ds.suppix)
        maps = {f: np.asarray(Image.open(os.path.join(save_dir, f)))
                for f in sorted(os.listdir(save_dir))}
        results[mode] = (miou, maps)

    assert results["fused"][0] == results["unfused"][0]
    assert sorted(results["fused"][1]) == sorted(results["unfused"][1])
    for f, arr in results["fused"][1].items():
        np.testing.assert_array_equal(arr, results["unfused"][1][f])


def test_plbl_generator_u8_wire_matches_float(tmp_path):
    """EvalRegionDatasetAll(emit_u8=True) ships raw bytes; the generator
    normalizes on device (fused) or host (unfused). Both must produce
    byte-identical plbl maps to the classic host-normalized float path:
    the device normalize is the same f32 arithmetic the host LUT
    tabulates, and both round once to the backbone dtype."""
    from mulactseg_tpu.data.transforms import normalize

    cfg = Config(num_classes=5, nseg=16, val_batch_size=1,
                 method="active_joint_multi_predignore_lossdecomp")
    m, v = _init(num_classes=6, size=32)
    ds = SyntheticRegionDataset(n_images=2, H=32, W=32, num_classes=5,
                                nseg=16, split="active-label", seed=11)
    rng = np.random.RandomState(0)
    raw_u8 = [rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
              for _ in range(len(ds))]

    class EvalView:
        def __init__(self, u8):
            self.u8 = u8

        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            s = ds[i]
            gt = np.where(s["labels"] == 255, cfg.num_classes, s["labels"])
            img = raw_u8[i] if self.u8 else normalize(raw_u8[i])
            return {"images": img, "labels": gt, "spx": s["spx"],
                    "spmask": s["spmask"], "target": s["target"],
                    "fnames": s["fnames"]}

    import os
    results = {}
    for mode in ("u8_fused", "u8_unfused", "float"):
        loader = DataProvider(EvalView(mode.startswith("u8")), 1,
                              shuffle=False, drop_last=False,
                              infinite=False, num_workers=1)
        gen = PseudoLabelGenerator(m, cfg, plbl_type="cosprop_includeonehot",
                                   max_protos=64)
        if mode == "u8_unfused":
            gen._fused_step = None
        save_dir = str(tmp_path / mode)
        miou, *_ = gen.generate(v["params"], v["batch_stats"], loader,
                                save_dir=save_dir, suppix=ds.suppix)
        maps = {f: np.asarray(Image.open(os.path.join(save_dir, f)))
                for f in sorted(os.listdir(save_dir))}
        results[mode] = (miou, maps)

    ref_miou, ref_maps = results["float"]
    for mode in ("u8_fused", "u8_unfused"):
        assert results[mode][0] == ref_miou, mode
        for f, arr in ref_maps.items():
            np.testing.assert_array_equal(arr, results[mode][1][f])


def test_spx12_roundtrip():
    """_pack_spx12 (host) and the "spx12" branch of _decode_buf (device)
    are exact inverses, including the odd-element-count pad, for ids up
    to the 4095 guard."""
    from mulactseg_tpu.plbl.generator import _decode_buf, _pack_spx12

    rng = np.random.RandomState(0)
    for n in (6, 7, 1, 4096):
        ids = rng.randint(0, 4096, size=n).astype(np.int32)
        b = _pack_spx12(ids)
        assert b.dtype == np.uint8 and b.size == ((n + 1) // 2) * 3
        layout = (("spx_flat", 0, b.size, "spx12", (n,)),)
        out = jax.jit(_decode_buf, static_argnames=("layout",))(
            jnp.asarray(b), layout=layout)
        np.testing.assert_array_equal(np.asarray(out["spx_flat"]), ids)


def test_fused_wire_has_no_labels():
    """ADVICE r04: the fused arg pack must NOT ship the GT (the host CM
    accumulates from the fetched map instead), and superpixel ids < 4096
    ride the 12-bit codec."""
    cfg = Config(num_classes=5, nseg=16, val_batch_size=1,
                 method="active_joint_multi_predignore_lossdecomp")
    m, _ = _init(num_classes=6, size=32)
    ds = SyntheticRegionDataset(n_images=1, H=32, W=32, num_classes=5,
                                nseg=16, split="active-label", seed=5)
    s = ds[0]
    batch = {k: (np.asarray(v)[None] if k != "fnames" else [v])
             for k, v in s.items()}
    gen = PseudoLabelGenerator(m, cfg, plbl_type="cosprop_includeonehot",
                               max_protos=64)
    prep = gen.host_prep(batch, ds.suppix)
    dev_args = gen._fused_args([batch], [prep])
    names = {e[0] for e in dev_args["layout"]}
    assert "labels" not in names
    spx_entry = [e for e in dev_args["layout"] if e[0] == "spx_flat"][0]
    assert spx_entry[3] == "spx12"


def test_method_to_plbl_aliases_complete():
    """Every reference eval_save_* trainer module name resolves to a
    registered plbl type (trainer/ directory listing, SURVEY.md 2e)."""
    from mulactseg_tpu.plbl.generator import METHOD_TO_PLBL, PLBL_TYPES

    ref_files = [
        "eval_save_candidateplbl", "eval_save_candidateplbl_prop",
        "eval_save_cosplbl", "eval_save_cosplbl_filtgt",
        "eval_save_cosplbl_naive_voc", "eval_save_cosplbl_naive_voc_ms",
        "eval_save_cosplbl_naiveprop", "eval_save_cosplbl_prop",
        "eval_save_cosplbl_prop_filtered",
        "eval_save_cosplbl_prop_includeonehot",
        "eval_save_cosplbl_prop_includeonehot_slide",
        "eval_save_cosplbl_prop_includeonehot_voc",
        "eval_save_cosplbl_prop_includeonehot_voc_ms",
        "eval_save_cosplbl_prop_onehot", "eval_save_cosplbl_prop_onehotignore",
        "eval_save_cosplbl_prop_plusonehot", "eval_save_cosplbl_prop_withinspx",
        "eval_save_naiveplbl", "eval_save_plbl",
    ]
    for name in ref_files:
        assert name in METHOD_TO_PLBL, name
        assert METHOD_TO_PLBL[name] in PLBL_TYPES, name
