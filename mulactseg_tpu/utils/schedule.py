"""Learning-rate and loss-weight schedules.

poly_lr matches the reference PolyLR exactly
(/root/reference/utils/scheduler.py:4-13): lr = max(base * (1 - t/T)^p, min_lr),
stepped per iteration.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def poly_lr(base_lr: float, max_iters: int, power: float = 0.9,
            min_lr: float = 1e-6):
    """Returns an optax-compatible schedule fn step -> lr."""

    def schedule(step):
        frac = 1.0 - jnp.asarray(step, jnp.float32) / max_iters
        return jnp.maximum(base_lr * jnp.maximum(frac, 0.0) ** power, min_lr)

    return schedule


def sigmoid_ramp_up(x: float, lamparam: float, scale: float) -> float:
    den = 1.0 + math.exp(-x / lamparam)
    return (2.0 / den - 1.0) * scale


def ramp_up(x: float, lamparam: float = 0.1, scale: float = 1.0,
            dorampup: bool = True) -> float:
    """Adaptive loss-weight ramp (utils/scheduler.py:15-28)."""
    if not dorampup or x > 1.0:
        return 1.0
    return sigmoid_ramp_up(x, lamparam, scale)
