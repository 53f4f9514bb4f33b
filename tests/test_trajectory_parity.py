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
