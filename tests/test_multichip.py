"""Data-parallel training through the REAL trainer path on the 8-device
CPU mesh: run_al_rounds end-to-end with sharded batches (single + K-step
scan dispatch), sharded pool scoring with uneven final batches, and the
driver's dryrun_multichip gate itself."""

import os
import sys

import jax
import numpy as np
import pytest

from mulactseg_tpu.cli.common import build_active_datasets
from mulactseg_tpu.config import Config
from mulactseg_tpu.engine.rounds import ALTrainer, run_al_rounds


def dp_cfg(tmp_path, **kw):
    d = dict(num_classes=5, nseg=16, crop_size=(32, 32), train_batch_size=8,
             finetune_itrs=2, loader="synthetic", n_devices=8,
             method="active_joint_multi_predignore_lossdecomp",
             dtype="float32", num_workers=0, val_num_workers=0,
             max_iterations=1, active_selection_size=40,
             init_active_method="my_random",
             active_method="my_bvsb_predclsbal_pwr_banignore",
             model_save_dir=str(tmp_path), save_scores=False)
    d.update(kw)
    return Config(**d)


@pytest.mark.slow
def test_run_al_rounds_8dev_dp(tmp_path):
    assert len(jax.devices()) == 8
    cfg = dp_cfg(tmp_path, steps_per_dispatch=2)
    active_set, val = build_active_datasets(cfg)
    results = run_al_rounds(cfg, active_set, eval_dataset=val)
    assert 1 in results and np.isfinite(results[1])


@pytest.mark.slow
def test_dp_state_replicated_and_pool_scoring_pads(tmp_path):
    cfg = dp_cfg(tmp_path)
    trainer = ALTrainer(cfg, selection_iter=1)
    assert trainer.dp and trainer.mesh.size == 8
    leaf = jax.tree.leaves(trainer.state.params)[0]
    assert len(leaf.sharding.device_set) == 8  # replicated over all 8

    # uneven batch (3 images) pads to 8, shards, slices back
    imgs = np.random.RandomState(0).randn(3, 32, 32, 3).astype(np.float32)
    logits = trainer.predict_logits(imgs)
    assert logits.shape[0] == 3
    assert np.isfinite(np.asarray(logits)).all()


def test_global_batch_from_local_matches_shard_batch():
    """Multi-host feeding contract (parallel/mesh.global_batch_from_local):
    on one process the local slice IS the global batch and the assembled
    jax.Array must be bit-identical to shard_batch, with the same
    sharding. The >1-process path can't execute on one host; this pins
    the single-process degenerate case + the API shape contract."""
    from mulactseg_tpu.parallel.mesh import (global_batch_from_local,
                                             make_mesh, shard_batch)

    mesh = make_mesh(8)
    rs = np.random.RandomState(0)
    batch = {"images": rs.randn(8, 4, 4, 3).astype(np.float32),
             "spx": rs.randint(0, 5, (8, 4, 4)).astype(np.int32)}
    a = shard_batch(batch, mesh)
    b = global_batch_from_local(batch, mesh)
    for k in batch:
        assert b[k].sharding.is_equivalent_to(a[k].sharding, b[k].ndim)
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_single_chip_tail_batch_pads_to_val_batch_size(tmp_path):
    """Single-chip predict_logits pads a short final pool batch (e.g.
    2975 % 4) up to val_batch_size so the sweep reuses ONE compiled
    shape, and slices the pad rows back off."""
    cfg = dp_cfg(tmp_path, n_devices=1, val_batch_size=4)
    trainer = ALTrainer(cfg, selection_iter=1)
    assert not trainer.dp

    rs = np.random.RandomState(0)
    imgs = rs.randn(4, 32, 32, 3).astype(np.float32)
    full = np.asarray(trainer.predict_logits(imgs))
    tail = np.asarray(trainer.predict_logits(imgs[:3]))
    assert tail.shape[0] == 3
    np.testing.assert_allclose(tail, full[:3], rtol=1e-5, atol=1e-5)


def test_dp_batch_size_divisibility_guard(tmp_path):
    cfg = dp_cfg(tmp_path, train_batch_size=6)
    with pytest.raises(ValueError, match="not divisible"):
        ALTrainer(cfg, selection_iter=1)


@pytest.mark.slow
def test_driver_dryrun_multichip():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_spatial_sharded_eval_matches_replicated():
    """Full-res eval with the image height sharded over 8 devices must
    match the replicated forward numerically — GSPMD inserts the conv
    halo exchanges (parallel/mesh.spatial_sharding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mulactseg_tpu.engine.train import make_eval_step
    from mulactseg_tpu.models import get_model
    from mulactseg_tpu.parallel.mesh import make_mesh, shard_spatial

    model = get_model("deeplabv3plus_mobilenet", num_classes=6,
                      output_stride=16, dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                    jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    step = make_eval_step(model)
    ref = np.asarray(step(v["params"], v["batch_stats"], x))

    mesh = make_mesh(8)
    xs = shard_spatial(x, mesh)
    assert len(set(d for d in xs.devices())) == 8
    got = np.asarray(step(v["params"], v["batch_stats"], xs))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
