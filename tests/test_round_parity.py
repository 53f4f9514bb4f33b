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


def test_multi_round_parity():
    """FREE-RUNNING multi-round protocol (train_AL.py:37-82 x
    --max_iterations): no weight sync between rounds — each side
    compounds its own numeric noise, and the assertable invariants are
    outcomes, not trajectories (the temp-0.1 loss amplifies float noise
    ~x30/step, see tools_dev/round_parity_multi.py). Bounds calibrated
    2026-08-21 (rounds=5: jaccard 1.0 every round, step0 <=1.5e-5,
    synced plbl >=0.9955, final mIoU gap 2.11 with each side trained on
    its OWN drift-divergent plbl maps)."""
    from tools_dev.round_parity_multi import run

    rep = run(rounds=3, steps1=8, steps2=12, verbose=False)
    for row in rep["rounds"]:
        # the product claim: same regions chosen every round, even with
        # fully decorrelated weights
        assert row["selection_jaccard"] == 1.0, row
        # shared init + own labeled set: tight iff selection + loss agree
        assert row["stage1_step0_rel"] < 1e-3, row
        # plbl implementation pinned at this round's drifted weights
        assert row["plbl_agreement_synced"] >= 0.99, row
    assert rep["final"]["miou_gap"] <= 5.0, rep["final"]
