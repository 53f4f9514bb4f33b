"""Metric parity tests vs the reference formulas (utils/miou.py)."""

import numpy as np
import jax.numpy as jnp

from mulactseg_tpu.utils import MeanIoU, IoUIgnore


def _ref_miou(preds, targets, C, ignore):
    seen = np.zeros(C)
    correct = np.zeros(C)
    positive = np.zeros(C)
    o = preds[targets != ignore]
    t = targets[targets != ignore]
    for i in range(C):
        seen[i] = (t == i).sum()
        correct[i] = ((t == i) & (o == t)).sum()
        positive[i] = (o == i).sum()
    ious = []
    for i in range(C):
        if seen[i] == 0:
            ious.append(1.0)
        else:
            ious.append(correct[i] / (seen[i] + positive[i] - correct[i]))
    return [v * 100 for v in ious]


def test_mean_iou_streaming():
    rng = np.random.RandomState(0)
    C = 6
    helper = MeanIoU(C, 255)
    all_p, all_t = [], []
    for _ in range(3):
        p = rng.randint(0, C, size=(2, 9, 9))
        t = rng.randint(0, C, size=(2, 9, 9))
        t[0, :2] = 255
        # make class 4 never appear in GT
        t[t == 4] = 3
        helper._after_step({"outputs": jnp.asarray(p), "targets": jnp.asarray(t)})
        all_p.append(p); all_t.append(t)
    got = helper._after_epoch()
    want = _ref_miou(np.concatenate(all_p).ravel(), np.concatenate(all_t).ravel(),
                     C, 255)
    np.testing.assert_allclose(got, want, rtol=1e-9)
    assert got[4] == 100.0  # unseen class reports IoU 1 (x100)

    ious, precs, recs = helper._after_epoch_ipr()
    np.testing.assert_allclose(ious, want, rtol=1e-9)
    assert all(0 <= v <= 100 for v in precs)
    assert all(0 <= v <= 100 for v in recs)


def test_iou_ignore():
    C = 4
    helper = IoUIgnore(num_classes=C, ignore_label=255)
    t = np.zeros((1, 4, 4), np.int32)
    t[0, :2] = 255
    p = np.zeros((1, 4, 4), np.int32)
    p[0, :1] = C  # predicts "undefined" on half the ignored region
    helper._after_step({"outputs": jnp.asarray(p), "targets": jnp.asarray(t)})
    # intersection 4, union 8
    assert abs(helper._after_epoch() - 50.0) < 1e-9
