"""Round-LEVEL parity vs torch transcriptions of the reference: one full
synthetic AL round (selection -> stage-1 lossdecomp -> cosine plbl ->
stage-2 CE -> val mIoU) with weight sync at each stage boundary.
See tools_dev/round_parity.py for the stage map and reference citations.

Tolerances (measured 2026-08-19, this box):
  selection  identical weights -> score tensors to float noise (<1e-5)
             and the selected (image, spx) set EXACTLY (ties at the
             budget cutoff would be excused, none occur on this fixture)
  stage-1    step-0 loss rel gap <1e-3 pins the criterion; the multi-step
             trajectory is AdamW sign-descent-bounded (loose)
  plbl       >=99.5% pixel agreement at synchronized weights
  stage-2    step-0 <1e-3; final val mIoU within 1.0 point
"""

import pytest

pytestmark = pytest.mark.slow


def test_full_round_parity():
    from tools_dev.round_parity import run

    rep = run(steps1=8, steps2=8, verbose=False)

    sel = rep["selection"]
    assert sel["score_dev"] < 1e-5, sel
    assert sel["n_mismatch"] == 0 or sel["ties_explain_mismatch"], sel
    assert sel["n_prod"] == sel["n_ref"], sel

    s1 = rep["stage1"]
    assert s1["step0_rel"] < 1e-3, s1
    assert s1["mean_rel"] < 0.15, s1  # AdamW sign-descent bound

    assert rep["plbl"]["pixel_agreement"] >= 0.995, rep["plbl"]

    s2 = rep["stage2"]
    assert s2["step0_rel"] < 1e-3, s2
    assert s2["miou_gap"] <= 1.0, s2
