"""Hier/async criteria through the real train step, mseg active set,
within-spx plbl type, loss_type registry, datalist tools."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mulactseg_tpu.config import Config
from mulactseg_tpu.data.loader import collate
from mulactseg_tpu.data.synthetic import SyntheticRegionDataset


def tiny_model(num_classes):
    from mulactseg_tpu.models.deeplab import DeepLabHeadV3Plus, DeepLabV3
    from mulactseg_tpu.models.resnet import ResNet
    return DeepLabV3(
        backbone=ResNet(layers=(1, 1, 1, 1), deep_stem=True, stem_width=8),
        classifier=DeepLabHeadV3Plus(num_classes, (2, 4, 6), variant="wn"))


@pytest.mark.parametrize("method", [
    "active_joint_hier_multi",
    # the async pair each compile their own two-forward train step
    # (~34 s/CPU); the base hier case keeps the family in the fast suite
    pytest.param("active_joint_hier_multi_async", marks=pytest.mark.slow),
    pytest.param("active_joint_hier_multi_async_weight",
                 marks=pytest.mark.slow)])
def test_hier_methods_train_step(method):
    from mulactseg_tpu.engine.state import create_train_state
    from mulactseg_tpu.engine.train import make_train_step
    cfg = Config(num_classes=5, nseg=16, small_nseg=64, crop_size=(32, 32),
                 train_batch_size=2, finetune_itrs=10, method=method,
                 dtype="float32", loader="synthetic")
    model = tiny_model(cfg.num_model_classes)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (2, 32, 32, 3), total_itrs=10)
    ds = SyntheticRegionDataset(
        n_images=2, H=32, W=32, num_classes=5, nseg=16, small_nseg=64,
        async_views="async" in method)
    b = collate([ds[0], ds[1]])
    keys = [k for k in b if k != "fnames" and k != "labels"]
    batch = {k: jnp.asarray(b[k]) for k in keys}
    step = make_train_step(model, cfg, donate=False)
    state2, aux = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["train_loss"])), method


def test_loss_type_registry():
    from mulactseg_tpu.losses.registry import LOSS_TYPES, get_loss_type
    cfg = Config(num_classes=4, nseg=8, small_nseg=16, loader="synthetic")
    rng = np.random.RandomState(0)
    B, H, W = 1, 8, 8
    batch = {
        "labels": jnp.asarray(rng.randint(0, 4, (B, H, W)), jnp.int32),
        "target": jnp.asarray((rng.rand(B, 8, 5) < 0.4), jnp.float32),
        "spx": jnp.asarray(rng.randint(0, 8, (B, H, W)), jnp.int32),
        "spx_small": jnp.asarray(rng.randint(0, 16, (B, H, W)), jnp.int32),
        "spmask": jnp.asarray(np.ones((B, H, W), bool)),
    }
    logits = jnp.asarray(rng.randn(B, H, W, 4), jnp.float32)
    for name in ("cross_entropy", "focal_loss", "multi_choice_ce",
                 "group_multi_label_ce", "hierarchy_group_multi_label_ce"):
        fn = get_loss_type(Config(num_classes=4, nseg=8, small_nseg=16,
                                  loss_type=name, loader="synthetic"))
        v = fn(logits, batch)
        assert np.isfinite(float(v)), name
    joint = get_loss_type(Config(num_classes=4, nseg=8, small_nseg=16,
                                 loss_type="joint_multi_loss",
                                 loader="synthetic"))
    g, m = joint(logits, batch)
    assert np.isfinite(float(g)) and np.isfinite(float(m))


def test_mseg_active_set(tmp_path):
    from mulactseg_tpu.active.mseg_active_set import MsegRegionActiveSet

    class Pool:
        root = "/data"
        suppix = {}

    class Label:
        im_idx = []
        suppix = {}

    cfg = Config(model_save_dir=str(tmp_path), loader="synthetic")
    pool, label = Pool(), Label()
    # two scales of the same image + one other image
    k16 = "/data/superpixel_seed/cityscapes/seeds_16/train/label/aachen_000000.pkl"
    k32 = "/data/superpixel_seed/cityscapes/seeds_32/train/label/aachen_000000.pkl"
    k16b = "/data/superpixel_seed/cityscapes/seeds_16/train/label/bochum_000001.pkl"
    pool.suppix = {k16: [1, 2], k32: [7], k16b: [3]}
    scores = [(0.9, "16/aachen_000000", 1), (0.8, "32/aachen_000000", 7),
              (0.7, "16/bochum_000001", 3), (0.6, "16/aachen_000000", 2)]
    a = MsegRegionActiveSet(cfg, pool, label)
    a.selection_iter = 1
    n = a.expand_training_set(scores, 2, "mseg_test")
    assert n == 3  # stops after exceeding the budget
    img_list = [i[0] for i in label.im_idx]
    assert len(img_list) == 2
    assert "16" in label.im_idx[0][1] and "32" in label.im_idx[0][1]
    assert label.suppix[k16] == [1]
    assert pool.suppix.get(k32) is None  # emptied and removed
    a.dump_datalist()
    label2 = Label(); label2.im_idx = []; label2.suppix = {}
    pool2 = Pool(); pool2.suppix = {}
    b = MsegRegionActiveSet(cfg, pool2, label2)
    b.selection_iter = 1
    b.load_datalist()
    assert len(label2.im_idx) == 2


def test_within_spx_plbl_type(tmp_path):
    from mulactseg_tpu.data.loader import DataProvider
    from mulactseg_tpu.plbl.generator import PseudoLabelGenerator
    cfg = Config(num_classes=5, nseg=16, val_batch_size=1,
                 loader="synthetic")
    m = tiny_model(6)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.ones((1, 32, 32, 3)),
               train=False)
    ds = SyntheticRegionDataset(n_images=1, H=32, W=32, num_classes=5,
                                nseg=16, seed=5)

    class EvalView:
        def __len__(self):
            return 1
        def __getitem__(self, i):
            s = ds[i]
            gt = np.where(s["labels"] == 255, 5, s["labels"])
            return {"images": s["images"], "labels": gt, "spx": s["spx"],
                    "spmask": s["spmask"], "target": s["target"],
                    "fnames": s["fnames"]}

    loader = DataProvider(EvalView(), 1, shuffle=False, drop_last=False,
                          infinite=False, num_workers=1)
    gen = PseudoLabelGenerator(m, cfg, plbl_type="cos_withinspx_includeonehot",
                               max_protos=64)
    miou, *_ = gen.generate(v["params"], v["batch_stats"], loader,
                            suppix=ds.suppix)
    assert 0 <= miou <= 100


def test_gen_datalists(tmp_path):
    import pickle
    from mulactseg_tpu.tools.gen_datalists import gen_datalist, gen_region_dict
    from mulactseg_tpu.data.datasets import load_region_dict
    from mulactseg_tpu.data.synthetic import grid_superpixels
    spx = grid_superpixels(8, 8, 9)
    spx[spx == 4] = 0  # id 4 missing
    with open(tmp_path / "a.pkl", "wb") as f:
        pickle.dump({"labels": spx}, f)
    triples = [("a.png", "a_lbl.png", "a.pkl")]
    gen_datalist(triples, str(tmp_path / "train.txt"))
    gen_region_dict(triples, 9, str(tmp_path / "train.dict"),
                    data_root=str(tmp_path))
    assert (tmp_path / "train.txt").read_text().strip().count("\t") == 2
    region = load_region_dict(str(tmp_path / "train.dict"))
    assert 4 not in region["a.pkl"] and 0 in region["a.pkl"]
