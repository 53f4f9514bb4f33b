"""K-steps-per-dispatch training path: identical results to per-step
dispatch (same rng stream handling aside), and the ALTrainer loop uses it
when configured."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mulactseg_tpu.config import Config
from mulactseg_tpu.data.loader import collate
from mulactseg_tpu.data.synthetic import SyntheticRegionDataset
from mulactseg_tpu.engine.state import create_train_state
from mulactseg_tpu.engine.train import make_train_step, make_train_step_scan
from mulactseg_tpu.models.deeplab import DeepLabHeadV3Plus, DeepLabV3
from mulactseg_tpu.models.resnet import ResNet


def _setup():
    cfg = Config(num_classes=5, nseg=16, crop_size=(32, 32),
                 train_batch_size=2, finetune_itrs=20, dtype="float32",
                 method="active_joint_multi_predignore_lossdecomp",
                 loader="synthetic")
    model = DeepLabV3(
        backbone=ResNet(layers=(1, 1, 1, 1), deep_stem=True, stem_width=8),
        classifier=DeepLabHeadV3Plus(cfg.num_model_classes, (2, 4, 6),
                                     variant="wn"))
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (2, 32, 32, 3), total_itrs=20)
    ds = SyntheticRegionDataset(n_images=4, H=32, W=32, num_classes=5,
                                nseg=16)
    batches = [collate([ds[i % 4], ds[(i + 1) % 4]]) for i in range(4)]
    keys = ("images", "target", "spx", "spmask")
    dev = [{k: jnp.asarray(b[k]) for k in keys} for b in batches]
    return cfg, model, state, dev


@pytest.mark.slow
def test_scan_matches_per_step_dispatch():
    cfg, model, state, dev = _setup()
    K = 4
    rng = jax.random.PRNGKey(7)
    rngs = jax.random.split(rng, K)

    step = make_train_step(model, cfg, donate=False)
    s1 = state
    losses1 = []
    for i in range(K):
        s1, aux = step(s1, dev[i], rngs[i])
        losses1.append(float(aux["train_loss"]))

    run = make_train_step_scan(model, cfg, K, donate=False)
    super_batch = {k: jnp.stack([d[k] for d in dev]) for k in dev[0]}
    s2, auxs = run(state, super_batch, rng)
    losses2 = [float(v) for v in auxs["train_loss"]]

    # first step must agree to float precision; later steps drift by
    # accumulated f32 nondeterminism between the two compiled programs
    np.testing.assert_allclose(losses1[0], losses2[0], rtol=1e-6)
    np.testing.assert_allclose(losses1, losses2, rtol=2e-3)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                                   atol=2e-3)


@pytest.mark.slow
def test_altrainer_auto_layout_matches_default(tmp_path, monkeypatch):
    """MULACTSEG_AUTO_LAYOUT=1 (XLA-chosen entry layouts + lowered
    compile + device_put into input_formats) reproduces the default
    dispatch path exactly — same data/rng stream, same loss trace."""
    from mulactseg_tpu.active import RegionActiveSet
    from mulactseg_tpu.engine.rounds import ALTrainer

    def run(auto):
        if auto:
            monkeypatch.setenv("MULACTSEG_AUTO_LAYOUT", "1")
        else:
            monkeypatch.delenv("MULACTSEG_AUTO_LAYOUT", raising=False)
        cfg = Config(num_classes=5, nseg=16, crop_size=(32, 32),
                     train_batch_size=2, finetune_itrs=6, val_period=100,
                     steps_per_dispatch=3, dtype="float32", train_lr=1e-3,
                     n_devices=1,
                     model="deeplabv3pluswn_resnet50deepstem",
                     method="active_joint_multi_predignore_lossdecomp",
                     model_save_dir=str(tmp_path), loader="synthetic")
        ds = SyntheticRegionDataset(n_images=2, H=32, W=32, num_classes=5,
                                    nseg=16)
        active = RegionActiveSet(cfg, ds, ds)
        tr = ALTrainer(cfg, 1)
        seen = []
        tr.train(active, metrics_cb=lambda it, aux: seen.append(aux),
                 log_every=1)
        if auto:
            assert tr._auto_layout and tr._scan_compiled is not None
        return [a["train_loss"] for a in seen]

    np.testing.assert_allclose(run(auto=False), run(auto=True), rtol=1e-6)


@pytest.mark.slow
def test_altrainer_uses_scan_dispatch(tmp_path):
    from mulactseg_tpu.active import RegionActiveSet
    from mulactseg_tpu.engine.rounds import ALTrainer
    cfg = Config(num_classes=5, nseg=16, crop_size=(32, 32),
                 train_batch_size=2, finetune_itrs=6, val_period=100,
                 steps_per_dispatch=3, dtype="float32", train_lr=1e-3,
                 model="deeplabv3pluswn_resnet50deepstem",
                 method="active_joint_multi_predignore_lossdecomp",
                 model_save_dir=str(tmp_path), loader="synthetic")
    ds = SyntheticRegionDataset(n_images=2, H=32, W=32, num_classes=5,
                                nseg=16)
    active = RegionActiveSet(cfg, ds, ds)
    tr = ALTrainer(cfg, 1)
    assert tr._scan_step is not None
    seen = []
    tr.train(active, metrics_cb=lambda it, aux: seen.append((it, aux)),
             log_every=3)
    assert seen, "metrics callback never fired under scan dispatch"
    assert all(np.isfinite(a["train_loss"]) for _, a in seen)
