"""Selector sweep invariants.

The scorer selectors accumulate per-batch device rows and fetch once at
the end of the sweep (acquisition/selectors.py `_concat_rows`, a tunnel
dispatch-latency optimization). These tests pin that the score list is
independent of `val_batch_size` (row order, concat, and the deferred
fetch), matching the reference semantics where pool scoring iterates a
fixed-order loader (active_selection/my_bvsb.py:29-48).

Note pass 1 of the predclsbal selector averages per-batch means, so the
invariance holds for equal-size batches (n_images % batch == 0) — the
reference has the same property.
"""

import numpy as np
import pytest

from mulactseg_tpu.acquisition.selectors import get_selector
from mulactseg_tpu.config import Config
from mulactseg_tpu.data.synthetic import SyntheticRegionDataset

C = 5  # dataset classes; predignore methods model C+1


class _FakeTrainer:
    """Deterministic per-image logits: a fixed linear map of the pixels,
    so predict_logits is batch-composition invariant."""

    def __init__(self, num_out):
        rng = np.random.RandomState(7)
        self.proj = rng.randn(3, num_out).astype(np.float32)

    def predict_logits(self, images):
        imgs = np.asarray(images, np.float32)
        return np.einsum("bhwc,cd->bhwd", imgs, self.proj)


class _PoolSet:
    """Adapter exposing the loader/selector surface of the real pool
    dataset (im_idx, suppix, iteration in fixed order)."""

    def __init__(self, n_images):
        self.ds = SyntheticRegionDataset(
            n_images=n_images, H=32, W=32, num_classes=C, nseg=16,
            split="active-ulabel", seed=3)
        self.im_idx = self.ds.im_idx
        self.suppix = self.ds.suppix

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        return self.ds[i]


@pytest.mark.parametrize("method", [
    "my_bvsb_banignore",
    "my_bvsb_predclsbal_pwr_banignore",
    "my_bvsb_clsbal_v2_banignore",
])
def test_scores_invariant_to_val_batch_size(method):
    pool = _PoolSet(n_images=4)
    trainer = _FakeTrainer(C + 1)

    def scores_at(bs):
        cfg = Config(num_classes=C, nseg=16, val_batch_size=bs,
                     val_num_workers=0,
                     method="active_joint_multi_predignore_lossdecomp",
                     active_method=method)
        sel = get_selector(method, cfg)
        return sel.calculate_scores(trainer, pool)

    ref = scores_at(4)  # single launch
    assert len(ref) == 4 * 16
    # every pool superpixel got exactly one row, in loader order
    assert [r[1:] for r in ref] == [
        (",".join(k), i) for k in pool.im_idx for i in pool.suppix[k[2]]]
    for bs in (1, 2):
        got = scores_at(bs)
        assert [r[1:] for r in got] == [r[1:] for r in ref]
        np.testing.assert_allclose([r[0] for r in got],
                                   [r[0] for r in ref], rtol=2e-5,
                                   atol=1e-6)
