"""On-device morphology for superpixel maps.

Replaces the reference's CPU skimage/cv2 calls:
  - per-superpixel binary_dilation neighbor discovery
    (/root/reference/trainer/eval_save_cosplbl_prop.py:260-266) becomes a
    single reduce-window pass producing the *full* segment adjacency in
    one shot,
  - boundary trimming (find_boundaries + binary_dilation,
    /root/reference/dataloader/region_cityscapes_tensor.py:41-84) becomes
    max/min pooling over the id map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def binary_dilation3x3(mask: jax.Array, iterations: int = 1) -> jax.Array:
    """3x3 full-kernel binary dilation of an (H, W) bool map."""
    x = mask.astype(jnp.float32)
    for _ in range(iterations):
        x = lax.reduce_window(x, -jnp.inf, lax.max, (3, 3), (1, 1), "SAME")
    return x > 0


def _window_ids(spx: jax.Array, k: int):
    """All k*k shifted copies of an (H, W) id map, edge-replicated.
    Returns (k*k, H, W)."""
    H, W = spx.shape
    r = k // 2
    padded = jnp.pad(spx, ((r, r), (r, r)), mode="edge")
    shifts = []
    for dy in range(k):
        for dx in range(k):
            shifts.append(lax.dynamic_slice(padded, (dy, dx), (H, W)))
    return jnp.stack(shifts)


def neighbor_ids_map(spx: jax.Array, k: int = 3) -> jax.Array:
    """(k*k, H, W) — for each pixel, the segment ids inside its k x k
    neighborhood (edge replicated). Feeding these into a segment
    reduction yields per-segment neighbor sets without any Python loop."""
    return _window_ids(spx, k)


def segment_adjacency(spx: jax.Array, num_segments: int, k: int = 3) -> jax.Array:
    """(S, S) bool adjacency: adj[a, b] iff some pixel of segment `a` has a
    pixel of segment `b` inside its k x k neighborhood (includes a==a).

    Equivalent to the reference's per-superpixel binary_dilation + unique
    loop (/root/reference/trainer/eval_save_cosplbl_prop.py:257-266) but
    computed for all segments at once: one-hot(center) ^T @ one-hot(shifted)
    accumulated over the k*k shifts — an MXU matmul per shift.

    Entries for ids >= num_segments (the invalid bucket) are dropped.
    """
    H, W = spx.shape
    center = spx.reshape(-1)
    shifted = _window_ids(spx, k).reshape(k * k, -1)
    oh_center = jax.nn.one_hot(center, num_segments, dtype=jnp.float32)  # (P, S)

    def body(acc, sh):
        oh_sh = jax.nn.one_hot(sh, num_segments, dtype=jnp.float32)  # (P, S)
        acc = acc + jnp.einsum("pa,pb->ab", oh_center, oh_sh,
                               preferred_element_type=jnp.float32)
        return acc, None

    adj, _ = lax.scan(body, jnp.zeros((num_segments, num_segments), jnp.float32),
                      shifted)
    return adj > 0


def boundary_mask(spx: jax.Array) -> jax.Array:
    """(H, W) bool — pixels whose 3x3 neighborhood contains more than one
    segment id (i.e. superpixel boundaries), the on-device equivalent of
    skimage find_boundaries(mode='thick')."""
    ids = _window_ids(spx, 3).astype(jnp.int32)
    return (ids.max(axis=0) != ids.min(axis=0))
