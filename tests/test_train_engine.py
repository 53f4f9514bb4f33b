"""End-to-end engine tests on the synthetic fixture: the train step learns,
checkpoints round-trip, evaluation runs, and the step compiles under an
8-device data-parallel mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mulactseg_tpu.config import Config
from mulactseg_tpu.data.synthetic import SyntheticRegionDataset
from mulactseg_tpu.engine.state import create_train_state
from mulactseg_tpu.engine.train import make_train_step, make_eval_step
from mulactseg_tpu.models import get_model
from mulactseg_tpu.models.deeplab import DeepLabHeadV3Plus, DeepLabV3
from mulactseg_tpu.models.resnet import ResNet


def tiny_model(num_classes):
    bb = ResNet(layers=(1, 1, 1, 1), deep_stem=True, stem_width=8)
    head = DeepLabHeadV3Plus(num_classes, (2, 4, 6), variant="wn")
    return DeepLabV3(backbone=bb, classifier=head)


def tiny_cfg(**kw):
    d = dict(num_classes=5, nseg=16, crop_size=(32, 32), train_batch_size=2,
             finetune_itrs=50, train_lr=1e-3, dataset="cityscapes",
             method="active_joint_multi_predignore_lossdecomp")
    d.update(kw)
    cfg = Config(**d)
    return cfg


def _batch(ds, idxs):
    from mulactseg_tpu.data.loader import collate
    return collate([ds[i] for i in idxs])


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    ds = SyntheticRegionDataset(n_images=2, H=32, W=32,
                                num_classes=cfg.num_classes, nseg=cfg.nseg)
    model = tiny_model(cfg.num_model_classes)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (2, 32, 32, 3), total_itrs=50)
    return cfg, ds, model, state


def test_train_step_decreases_loss(setup):
    cfg, ds, model, state = setup
    step = make_train_step(model, cfg, donate=False)
    b = _batch(ds, [0, 1])
    batch = {k: jnp.asarray(b[k]) for k in ("images", "target", "spx", "spmask")}
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(12):
        rng, r = jax.random.split(rng)
        state, aux = step(state, batch, r)
        losses.append(float(aux["train_loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_lr_schedule_and_groups(setup):
    cfg, ds, model, state = setup
    # poly LR floors at min_lr; classifier group sees 10x lr
    from mulactseg_tpu.utils.schedule import poly_lr
    s = poly_lr(1e-3, 100, 0.9, 1e-6)
    assert abs(float(s(0)) - 1e-3) < 1e-9
    assert float(s(99)) > 1e-6
    assert float(s(100)) == pytest.approx(1e-6)


def test_eval_and_checkpoint_roundtrip(tmp_path, setup):
    cfg, ds, model, state = setup
    from mulactseg_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, state)
    state2 = load_checkpoint(p, state)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ev = make_eval_step(model)
    b = _batch(ds, [0])
    logits = ev(state2.params, state2.batch_stats, jnp.asarray(b["images"]))
    assert logits.shape == (1, 32, 32, cfg.num_model_classes)


def test_merge_pretrained_strips_classifier(setup):
    cfg, ds, model, state = setup
    from mulactseg_tpu.engine.checkpoint import merge_pretrained
    import jax.numpy as jnp
    donor = jax.tree.map(lambda x: x + 1.0, jax.device_get(state.params))
    merged = merge_pretrained(jax.device_get(state.params), donor)
    # backbone leaves copied, classifier proxy kept fresh
    np.testing.assert_allclose(
        np.asarray(merged["backbone"]["bn1"]["scale"]),
        np.asarray(donor["backbone"]["bn1"]["scale"]))
    np.testing.assert_allclose(
        np.asarray(merged["classifier"]["proxy"]),
        np.asarray(jax.device_get(state.params)["classifier"]["proxy"]))


def test_data_parallel_step_on_mesh(setup):
    cfg, ds, model, state = setup
    from mulactseg_tpu.parallel import make_mesh, shard_batch
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    step = make_train_step(model, cfg, donate=False)
    b = _batch(ds, [0, 1, 0, 1, 0, 1, 0, 1])
    batch = {k: jnp.asarray(b[k]) for k in ("images", "target", "spx", "spmask")}
    batch = shard_batch(batch, mesh)
    state2, aux = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["train_loss"]))


@pytest.mark.slow
def test_nchw_logits_handoff_matches_nhwc(setup):
    """The NCHW logits hand-off (DeepLabV3 nchw_logits=True -> criterion
    nchw=True) must give the same loss and parameter gradients as the
    NHWC path — the transpose just moves to head resolution."""
    from mulactseg_tpu.engine.train import _build_loss_fn, get_criterion

    cfg, ds, model, state = setup
    b = _batch(ds, [0, 1])
    batch = {k: jnp.asarray(b[k])
             for k in ("images", "target", "spx", "spmask", "target_bits")
             if k in b}
    rng = jax.random.PRNGKey(3)

    crit_nchw = get_criterion(cfg)
    assert getattr(crit_nchw, "accepts_nchw", False)
    crit_plain = get_criterion(cfg)
    del crit_plain.accepts_nchw

    def total(loss_fn, params):
        return loss_fn(params, state.batch_stats, batch, rng,
                       jnp.asarray(0))[0]

    f1 = _build_loss_fn(model, cfg, crit_nchw)
    f2 = _build_loss_fn(model, cfg, crit_plain)
    v1, g1 = jax.value_and_grad(lambda p: total(f1, p))(state.params)
    v2, g2 = jax.value_and_grad(lambda p: total(f2, p))(state.params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(g1)
    l2 = jax.tree_util.tree_leaves(g2)
    for a, c in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_uint8_batch_matches_host_normalized(setup):
    """cfg.ship_uint8 path: a uint8 image batch is normalized on device
    (engine/train._device_normalize) and produces the same loss/update as
    the host-normalized float32 batch — same op order, so differences are
    at f32 ULP level."""
    from mulactseg_tpu.data.transforms import PairedTransform, normalize

    cfg, ds, model, state = setup
    step = make_train_step(model, cfg, donate=False)
    b = _batch(ds, [0, 1])
    rng = np.random.RandomState(9)
    img_u8 = rng.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    base = {k: jnp.asarray(b[k]) for k in ("target", "spx", "spmask")}
    rkey = jax.random.PRNGKey(3)

    f32 = dict(base, images=jnp.asarray(
        np.stack([normalize(im) for im in img_u8])))
    _, aux_f = step(state, f32, rkey)
    u8 = dict(base, images=jnp.asarray(img_u8))
    assert u8["images"].dtype == jnp.uint8
    _, aux_u = step(state, u8, rkey)
    np.testing.assert_allclose(float(aux_f["train_loss"]),
                               float(aux_u["train_loss"]), rtol=1e-5)

    # transform plumbing: emit_u8 hands the uint8 crop through, and
    # host-normalizing it reproduces the default output exactly
    img = rng.randint(0, 256, (48, 64, 3)).astype(np.uint8)
    spx = rng.randint(0, 16, (48, 64)).astype(np.int32)
    kw = dict(scale_range=(0.5, 2.0), crop_size=(32, 32), pad_values=[16],
              hflip=True, seed=4)
    out_f, lb_f = PairedTransform(**kw)(img, [spx])
    out_u, lb_u = PairedTransform(emit_u8=True, **kw)(img, [spx])
    assert out_u.dtype == np.uint8
    np.testing.assert_array_equal(normalize(out_u), out_f)
    np.testing.assert_array_equal(lb_u[0], lb_f[0])


@pytest.mark.slow
def test_ship_uint8_through_altrainer_matches_f32(tmp_path):
    """Regression: the bf16 loader post hook must NOT cast uint8 crops
    (that would defeat the dtype check that triggers on-device
    normalization — the model would train on raw 0..255 inputs). The
    full ALTrainer dispatch with ship_uint8=True reproduces the
    host-normalized run's loss trace to bf16 tolerance."""
    from mulactseg_tpu.active import RegionActiveSet
    from mulactseg_tpu.data.transforms import get_train_transform
    from mulactseg_tpu.engine.rounds import ALTrainer

    def run(ship_u8):
        cfg = Config(num_classes=5, nseg=16, crop_size=(32, 32),
                     train_batch_size=2, finetune_itrs=4, val_period=100,
                     steps_per_dispatch=2, dtype="bfloat16", train_lr=1e-3,
                     n_devices=1, num_workers=0, ship_uint8=ship_u8,
                     model="deeplabv3pluswn_resnet50deepstem",
                     method="active_joint_multi_predignore_lossdecomp",
                     model_save_dir=str(tmp_path), loader="synthetic")
        ds = SyntheticRegionDataset(n_images=2, H=32, W=32, num_classes=5,
                                    nseg=16)
        ds.transform = get_train_transform("rescale_769_multi_notrg", cfg)
        item = ds[0]
        # under --dtype bfloat16 the train transform emits bf16 directly
        # (bf16 normalize LUT); uint8 crops still pass straight through
        import ml_dtypes

        assert item["images"].dtype == (
            np.uint8 if ship_u8 else ml_dtypes.bfloat16)
        active = RegionActiveSet(cfg, ds, ds)
        tr = ALTrainer(cfg, 1)
        seen = []
        tr.train(active, metrics_cb=lambda it, aux: seen.append(aux),
                 log_every=1)
        return [float(a["train_loss"]) for a in seen]

    np.testing.assert_allclose(run(False), run(True), rtol=5e-3)


def test_eval_step_uint8_matches_host_normalized(setup):
    """make_eval_step normalizes uint8 pool batches on device
    (cfg.ship_uint8 pool scoring) — same logits as host-normalized f32."""
    from mulactseg_tpu.data.transforms import normalize

    cfg, ds, model, state = setup
    step = make_eval_step(model)
    rng = np.random.RandomState(13)
    img_u8 = rng.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    lg_u8 = step(state.params, state.batch_stats, jnp.asarray(img_u8))
    lg_f = step(state.params, state.batch_stats, jnp.asarray(
        np.stack([normalize(im) for im in img_u8])))
    np.testing.assert_allclose(np.asarray(lg_u8), np.asarray(lg_f),
                               rtol=1e-4, atol=1e-5)
