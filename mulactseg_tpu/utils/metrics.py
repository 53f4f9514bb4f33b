"""Streaming segmentation metrics, accumulated on device.

The reference keeps numpy accumulators updated per batch with a Python
loop over classes (/root/reference/utils/miou.py:23-38). Here each update
is one jitted confusion-matrix accumulation (one-hot matmul on the MXU),
and seen/correct/positive are confusion-matrix marginals, so IoU,
precision and recall come from the same state. The final per-class
formulas match utils/miou.py:57-96 exactly, including the quirk that a
class never seen in GT reports IoU 1 (:63-64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_classes", "ignore_label"),
                   donate_argnums=(0,))
def _cm_update_u8(cm, preds, targets, *, num_classes: int,
                  ignore_label: int):
    """One-dispatch streaming update for loops whose predictions are
    already device-resident (the plbl generator): accumulate the
    confusion matrix AND cast the prediction map to uint8 in the same
    executable, so the host fetches 1 byte/pixel instead of 4 and pays
    one tunnel dispatch instead of two (matmul + eager add)."""
    cm = cm + confusion_matrix(preds, targets, num_classes=num_classes,
                               ignore_label=ignore_label)
    return cm, preds.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("num_classes", "ignore_label"))
def confusion_matrix(preds, targets, *, num_classes: int, ignore_label: int):
    """(C, C) int32 confusion matrix: rows = GT class, cols = predicted.
    Pixels whose GT equals ignore_label are dropped."""
    p = preds.reshape(-1).astype(jnp.int32)
    t = targets.reshape(-1).astype(jnp.int32)
    valid = t != ignore_label
    oh_t = jax.nn.one_hot(jnp.where(valid, t, 0), num_classes, dtype=jnp.float32)
    oh_p = jax.nn.one_hot(p, num_classes, dtype=jnp.float32)
    oh_t = oh_t * valid[:, None].astype(jnp.float32)
    cm = jnp.einsum("pt,pc->tc", oh_t, oh_p,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    return cm.astype(jnp.int32)


class MeanIoU:
    """Streaming per-class IoU with the reference's API shape
    (_before_epoch/_after_step/_after_epoch, utils/miou.py:5-96)."""

    def __init__(self, num_classes: int, ignore_label: int,
                 output_tensor: str = "outputs", target_tensor: str = "targets"):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.output_tensor = output_tensor
        self.target_tensor = target_tensor
        self._before_epoch()

    def _before_epoch(self):
        self.cm = jnp.zeros((self.num_classes, self.num_classes), jnp.int32)
        self.cm_host = np.zeros((self.num_classes, self.num_classes),
                                np.int64)
        self.extra_positive = np.zeros(self.num_classes, np.float64)

    def _after_step_host(self, preds, targets):
        """Numpy twin of confusion_matrix for loops where the prediction
        map has ALREADY been fetched to host (the plbl generator fetches
        every map to save PNGs): accumulating here instead of on device
        removes the GT upload (2.1 MB/image at 1024x2048) from the wire.
        Bit-exact vs the device path: a pixel contributes iff its GT is a
        real class != ignore AND its prediction is in [0, C) — the einsum
        drops out-of-range one-hots the same way."""
        C = self.num_classes
        p = np.asarray(preds).reshape(-1).astype(np.int64)
        t = np.asarray(targets).reshape(-1).astype(np.int64)
        m = (t != self.ignore_label) & (t >= 0) & (t < C) & (p >= 0) & (p < C)
        self.cm_host = self.cm_host + np.bincount(
            t[m] * C + p[m], minlength=C * C).reshape(C, C)

    def _after_step(self, output_dict):
        preds = output_dict[self.output_tensor]
        targets = output_dict[self.target_tensor]
        self.cm = self.cm + confusion_matrix(
            jnp.asarray(preds), jnp.asarray(targets),
            num_classes=self.num_classes, ignore_label=self.ignore_label)

    def _after_step_device_u8(self, preds_dev, targets):
        """Accumulate from a DEVICE-resident prediction map and return the
        map as a DEVICE uint8 array (not fetched) — one dispatch, and the
        eventual fetch moves 1 byte/pixel down the tunnel. Used by the
        plbl generator, where the int32 map would otherwise round-trip
        host->device for the matrix and device->host at 4 bytes/pixel for
        saving. Dispatch this IMMEDIATELY after the producing kernel: the
        tunnel executes dispatches FIFO, so an update queued after the
        NEXT image's forward would stall the fetch behind it."""
        self.cm, u8 = _cm_update_u8(
            self.cm, jnp.asarray(preds_dev), jnp.asarray(targets),
            num_classes=self.num_classes, ignore_label=self.ignore_label)
        return u8

    def _after_step_within_predregion(self, output_dict):
        """Accumulate only over pixels the prediction actually labeled
        (pred != ignore_label); GT-ignore pixels still count into the
        positive (prediction) marginal (utils/miou.py:40-55)."""
        preds = jnp.asarray(output_dict[self.output_tensor])
        targets = jnp.asarray(output_dict[self.target_tensor])
        pred_valid = preds != self.ignore_label
        # rows with GT==ignore vanish from the confusion matrix, so count
        # their predictions separately to keep the positive marginal right
        p = jnp.where(pred_valid, preds, 0)
        self.cm = self.cm + confusion_matrix(
            jnp.where(pred_valid, preds, self.num_classes + 1), targets,
            num_classes=self.num_classes, ignore_label=self.ignore_label)
        extra_mask = pred_valid & (targets == self.ignore_label)
        oh = jax.nn.one_hot(p.reshape(-1), self.num_classes,
                            dtype=jnp.float32)
        extra = jnp.sum(oh * extra_mask.reshape(-1)[:, None].astype(
            jnp.float32), axis=0)
        self.extra_positive = getattr(
            self, "extra_positive", np.zeros(self.num_classes)) + \
            np.asarray(extra, np.float64)

    # -- host-side summaries ------------------------------------------------
    def _marginals(self):
        cm = np.asarray(self.cm, dtype=np.float64) + getattr(
            self, "cm_host", 0)
        seen = cm.sum(1)
        positive = cm.sum(0) + getattr(self, "extra_positive", 0)
        correct = np.diag(cm)
        return seen, correct, positive

    def _after_epoch(self, ignore_label_list=None):
        seen, correct, positive = self._marginals()
        ious = []
        for i in range(self.num_classes):
            if ignore_label_list is not None and i in ignore_label_list:
                continue
            if seen[i] == 0:
                ious.append(1.0)
            else:
                ious.append(correct[i] / (seen[i] + positive[i] - correct[i]))
        return [v * 100 for v in ious]

    def _after_epoch_ipr(self):
        seen, correct, positive = self._marginals()
        ious, precs, recs = [], [], []
        for i in range(self.num_classes):
            if seen[i] == 0:
                ious.append(1.0); precs.append(1.0); recs.append(1.0)
            else:
                ious.append(correct[i] / (seen[i] + positive[i] - correct[i]))
                precs.append(correct[i] / positive[i] if positive[i] else 0.0)
                recs.append(correct[i] / seen[i])
        return ([v * 100 for v in ious], [v * 100 for v in precs],
                [v * 100 for v in recs])


class IoUIgnore:
    """IoU of the model's "undefined" prediction (class index C) against
    GT-ignore regions (utils/miou_evalignore.py:8-62)."""

    def __init__(self, num_classes: int, ignore_label: int):
        self.num_classes = num_classes  # undefined channel index
        self.ignore_label = ignore_label
        self._before_epoch()

    def _before_epoch(self):
        self.seen = 0
        self.correct = 0
        self.positive = 0

    def _after_step(self, output_dict):
        preds = jnp.asarray(output_dict["outputs"]).reshape(-1)
        targets = jnp.asarray(output_dict["targets"]).reshape(-1)
        is_ignore = targets == self.ignore_label
        is_pred = preds == self.num_classes
        self.seen += int(jnp.sum(is_ignore))
        self.positive += int(jnp.sum(is_pred))
        self.correct += int(jnp.sum(is_ignore & is_pred))

    def _after_epoch(self):
        if self.seen == 0:
            return 100.0
        denom = self.seen + self.positive - self.correct
        return (self.correct / denom) * 100 if denom else 0.0
