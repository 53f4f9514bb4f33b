"""Optimization-trajectory parity vs the torch twin: identical init,
batches, AdamW groups (classifier x10), poly LR with floor, train-mode
BN — loss curves must track (trainer/base.py:64-76 semantics)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_trajectory_60_steps():
    import sys

    sys.path.insert(0, ".")
    from tools_dev.trajectory_parity import run

    rel = run(steps=60, lr=1e-3, print_every=1000)
    assert rel.mean() < 5e-3, rel.mean()
    assert rel.max() < 2e-2, rel.max()


@pytest.mark.slow
def test_lossdecomp_trajectory_60_steps():
    """Trajectory parity under the SHIPPED stage-1 criterion (lossdecomp
    through the segment engine) vs a torch transcription of
    active_joint_multi_predignore_lossdecomp.py:16-72 +
    GroupMultiLabelCE_onlymulti, recipe lr/temps/coeffs. Step-0 losses
    must agree to f32 noise (criterion semantics are exact); the
    trajectory bound is loose because the temp-0.1 coeff-16 loss
    amplifies f32 op-order noise through AdamW (measured: ~1% mean /
    ~5% max by step 60; a real semantic break measures >50%)."""
    import sys

    sys.path.insert(0, ".")
    from tools_dev.trajectory_parity import run_lossdecomp

    rel = run_lossdecomp(steps=60, lr=2e-5, print_every=1000)
    assert rel[0] < 1e-4, rel[0]          # identical criterion at step 0
    assert rel.mean() < 3e-2, rel.mean()
    assert rel.max() < 0.1, rel.max()
