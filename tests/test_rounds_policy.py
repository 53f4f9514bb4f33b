"""Multi-round weight policy of run_al_rounds vs the reference AL loop
(train_AL.py:44-81): round r>1 selects the pool with the PREVIOUS round's
best checkpoint (prevckpt_fname, train_AL.py:50-52), start_over
reinitializes the model before training (train_AL.py:74-75), and the
round's best checkpoint is written so the next round can pick it up."""

import numpy as np
import pytest

from mulactseg_tpu.active import RegionActiveSet
from mulactseg_tpu.config import Config
from mulactseg_tpu.data.synthetic import SyntheticRegionDataset
from mulactseg_tpu.engine import rounds as R
from mulactseg_tpu.engine.checkpoint import load_checkpoint


def _fp(params):
    import jax

    return float(sum(np.abs(np.asarray(leaf)).sum()
                     for leaf in jax.tree_util.tree_leaves(params)))


@pytest.mark.slow
def test_multi_round_weight_policy(tmp_path, monkeypatch):
    C, S, HH = 5, 16, 24
    cfg = Config(num_classes=C, nseg=S, crop_size=(HH, HH),
                 train_batch_size=2, finetune_itrs=3, val_period=100,
                 max_iterations=2, active_selection_size=12,
                 val_batch_size=2, model_save_dir=str(tmp_path),
                 dtype="float32", train_lr=1e-3, num_workers=0,
                 val_num_workers=0, model="deeplabv3plus_mobilenet",
                 method="active_joint_multi_predignore_lossdecomp")
    mk = lambda s: SyntheticRegionDataset(n_images=3, H=HH, W=HH,
                                          num_classes=C, nseg=S, split=s,
                                          seed=1)
    pool, label = mk("active-ulabel"), mk("active-label")
    label.suppix = {}
    label.im_idx = []
    active_set = RegionActiveSet(cfg, pool, label)

    sel_fp, train_fp = {}, {}
    real_get = R.get_selector

    def spy_get(name, cfg):
        sel = real_get(name, cfg)
        orig = sel.select_next_batch

        def wrapper(trainer, active_set, n):
            sel_fp[trainer.selection_iter] = _fp(trainer.state.params)
            return orig(trainer, active_set, n)

        sel.select_next_batch = wrapper
        return sel

    orig_train = R.ALTrainer.train

    def spy_train(self, *a, **k):
        train_fp[self.selection_iter] = _fp(self.state.params)
        return orig_train(self, *a, **k)

    monkeypatch.setattr(R, "get_selector", spy_get)
    monkeypatch.setattr(R.ALTrainer, "train", spy_train)

    R.run_al_rounds(cfg, active_set)

    ckpt1 = load_checkpoint(str(tmp_path / "checkpoint01"))
    assert (tmp_path / "checkpoint02").exists()

    # round-2 selection used round-1's best checkpoint, not a fresh init
    assert np.isclose(sel_fp[2], _fp(ckpt1["params"]), rtol=1e-6)
    assert not np.isclose(sel_fp[2], sel_fp[1], rtol=1e-6)
    # start_over: both rounds trained from the identical fresh init
    # (ALTrainer re-inits from PRNGKey(cfg.seed) every round)
    assert train_fp[1] == train_fp[2] == sel_fp[1]
