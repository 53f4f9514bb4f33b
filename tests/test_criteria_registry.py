"""Every registered trainer criterion produces a finite loss and gradient
on a tiny synthetic batch (the 'ablation trainers as semantic tests'
strategy, SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mulactseg_tpu.config import Config
from mulactseg_tpu.engine.train import CRITERIA, get_criterion

B, H, W, S = 2, 8, 8, 7


def make_batch(C_model, rng):
    batch = {
        "images": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        "target": jnp.asarray((rng.rand(B, S, C_model) < 0.3), jnp.float32),
        "spx": jnp.asarray(rng.randint(0, S, (B, H, W)), jnp.int32),
        "spmask": jnp.asarray(rng.rand(B, H, W) < 0.7),
        "labels": jnp.asarray(rng.randint(0, C_model, (B, H, W)), jnp.int32),
        "spx_small": jnp.asarray(rng.randint(0, 2 * S, (B, H, W)), jnp.int32),
        "spx_weak": jnp.asarray(rng.randint(0, S, (B, H, W)), jnp.int32),
        "spmask_weak": jnp.asarray(rng.rand(B, H, W) < 0.7),
        "spx_small_weak": jnp.asarray(rng.randint(0, 2 * S, (B, H, W)),
                                      jnp.int32),
    }
    return batch


@pytest.mark.parametrize("method", sorted(CRITERIA))
def test_criterion_finite_loss_and_grad(method):
    rng = np.random.RandomState(hash(method) % 2**31)
    cfg = Config(num_classes=4, nseg=S, small_nseg=2 * S, method=method,
                 finetune_itrs=10, loader="synthetic",
                 nseg_list=(S, 2 * S) if method.endswith("_mseg") else (),
                 loss_type="rc_multi_ce" if method.endswith("_ablation")
                 else "joint_multi_loss")
    crit = get_criterion(cfg)
    C_model = cfg.num_model_classes
    # non-predignore joint losses slice targets[..., :-1], so give C+1 chans
    C_t = C_model if "predignore" in method or method in (
        "active", "active_slide", "active_joint_multi_lossdecomp",
        "active_joint_multi_lossdecomp_rc",
        "active_joint_multi_lossdecomp_topone") else C_model + 1
    batch = make_batch(C_t, rng)
    logits = jnp.asarray(rng.randn(B, H, W, C_model), jnp.float32)

    needs_feat = getattr(crit, "needs_feat", False)
    needs_weak = getattr(crit, "needs_weak_forward", False)
    needs_rng = getattr(crit, "needs_rng", False)
    if needs_weak:
        batch["logits_weak"] = jnp.asarray(
            rng.randn(B, H, W, C_model), jnp.float32)
    if method.endswith("_mseg"):
        batch["mseg_spx"] = jnp.stack([batch["spx"], batch["spx_small"]], 1)
        batch["mseg_spmask"] = jnp.asarray(rng.rand(B, 2, H, W) < 0.5)
        batch["mseg_target_0"] = batch["target"]
        batch["mseg_target_1"] = jnp.asarray(
            (rng.rand(B, 2 * S, C_t) < 0.3), jnp.float32)

    def loss(lg):
        if needs_feat:
            feat = jnp.asarray(rng.randn(B, H, W, 16), jnp.float32)
            feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
            extra = {"feat": feat, "plbl_logits": lg,
                     "frac": jnp.float32(0.5)}
            total, aux = crit(lg, batch, extra)
        elif needs_rng:
            total, aux = crit(lg, batch, {"rng": jax.random.PRNGKey(0)})
        else:
            total, aux = crit(lg, batch)
        return total

    v = float(loss(logits))
    g = jax.grad(loss)(logits)
    assert np.isfinite(v), method
    assert np.isfinite(np.asarray(g)).all(), method


@pytest.mark.parametrize("loss_type", ["rc_multi_ce", "max_multi_ce",
                                       "rand_multi_ce"])
def test_ablation_loss_types(loss_type):
    """--loss_type switch of active_joint_multi_ablation.py:13-24 (rand/max
    are documented reconstructions; the reference file cannot import them)."""
    rng = np.random.RandomState(3)
    cfg = Config(num_classes=4, nseg=S, method="active_joint_multi_ablation",
                 loss_type=loss_type, finetune_itrs=10, loader="synthetic")
    crit = get_criterion(cfg)
    batch = make_batch(cfg.num_model_classes + 1, rng)
    logits = jnp.asarray(rng.randn(B, H, W, cfg.num_model_classes),
                         jnp.float32)
    extra = {"rng": jax.random.PRNGKey(0)}

    def loss(lg):
        return crit(lg, batch, extra)[0]

    v = float(loss(logits))
    g = jax.grad(loss)(logits)
    assert np.isfinite(v)
    assert np.isfinite(np.asarray(g)).all()


def test_selector_registry_complete():
    from mulactseg_tpu.acquisition import SELECTORS
    want = {"my_random", "dummy", "my_bvsb", "my_bvsb_banignore",
            "my_bvsb_predclsbal_pwr", "my_bvsb_predclsbal_pwr_banignore",
            "my_bvsb_clsbal_v2", "my_bvsb_clsbal_v2_banignore"}
    assert want <= set(SELECTORS)
