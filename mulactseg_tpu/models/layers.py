"""Shared Flax building blocks (NHWC, torch-compatible geometry).

Padding is explicit and symmetric to match torch's Conv2d(padding=p)
exactly — SAME padding differs in pixel alignment for stride-2 convs,
which would break torch-weight import parity.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

# torch kaiming_normal_: backbone uses mode='fan_out'
# (models/segmentation/backbone/resnet.py:178), heads use the default
# fan_in (models/segmentation/deeplabv3.py:69).
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
kaiming_in = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
         use_bias: bool = False, groups: int = 1, name: Optional[str] = None,
         init=kaiming_out, dtype=None) -> nn.Conv:
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        kernel_dilation=(dilation, dilation),
        padding=((pad, pad), (pad, pad)),
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=init,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class FastBatchNorm(nn.Module):
    """BatchNorm with the per-channel affine folded to one multiply-add in
    the compute dtype: y = x*a + b with a = scale*rsqrt(var+eps),
    b = bias - mean*a computed once per channel in f32. Saves ~11 ms/step
    at stage-1 shapes vs flax nn.BatchNorm (whose normalize keeps the
    subtract/rsqrt chain per pixel). Param and batch_stats names match
    nn.BatchNorm exactly (scale/bias, mean/var) so checkpoints and the
    torch importer are unaffected. Variance is the biased (fast) estimate,
    same as nn.BatchNorm(use_fast_variance=True); momentum semantics:
    torch BatchNorm2d(momentum=0.1) == momentum 0.9 here."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if self.use_running_average:
            m, v = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            # converting reduces (f32 accumulate straight from the compute
            # dtype) instead of a materialized f32 cast of the whole
            # activation: the cast copy cost ~0.4 ms/pass at stage-1
            # shapes (tools_dev/bench_bn.py). The sum of squares runs as a
            # self-contraction: bf16*bf16 products are EXACT in the f32
            # accumulator and no f32 cast of the activation is staged
            # (astype+square+sum left a ~3 ms/step formatting pass in the
            # profile at stage-1 shapes).
            import numpy as _np

            n = float(_np.prod([x.shape[a] for a in axes]))
            m = jnp.sum(x, axis=axes, dtype=jnp.float32) / n
            xf = x.reshape(-1, x.shape[-1])
            m2 = jnp.einsum("pc,pc->c", xf, xf,
                            preferred_element_type=jnp.float32) / n
            v = jnp.maximum(m2 - jnp.square(m), 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1.0 - self.momentum) * m)
                ra_var.value = (self.momentum * ra_var.value +
                                (1.0 - self.momentum) * v)
        a = scale * jax.lax.rsqrt(v + self.epsilon)
        b = bias - m * a
        dt = self.dtype or x.dtype
        return x.astype(dt) * a.astype(dt) + b.astype(dt)


_BN_FROZEN = False  # trace-time flag set by bn_frozen() — see below


@contextlib.contextmanager
def bn_frozen(flag: bool):
    """Freeze BN during a train-mode forward (reference freeze_bn():
    trainer/active_voc.py:74-76 puts only the BN modules in eval mode;
    dropout stays active). The flag is read when batch_norm() runs, i.e.
    while the surrounding jit traces the model.apply call this context
    wraps — each criterion's loss_fn re-enters the context on every
    (re)trace, so concurrent programs with different settings can't
    cross-contaminate."""
    global _BN_FROZEN
    prev = _BN_FROZEN
    _BN_FROZEN = bool(flag)
    try:
        yield
    finally:
        _BN_FROZEN = prev


def batch_norm(train: bool, name: Optional[str] = None,
               momentum: float = 0.9, dtype=None) -> FastBatchNorm:
    """torch BatchNorm2d(momentum=0.1) == flax momentum 0.9
    (running = 0.9*running + 0.1*batch; models/__init__.py:7 sets 0.1)."""
    return FastBatchNorm(use_running_average=(not train) or _BN_FROZEN,
                         momentum=momentum,
                         epsilon=1e-5, dtype=dtype, name=name)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    separable: bool = False
    init: Callable = kaiming_out
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.separable and self.kernel > 1:
            # AtrousSeparableConvolution (deeplabv3.py:168-192)
            x = conv(x.shape[-1], self.kernel, self.stride, self.dilation,
                     groups=x.shape[-1], name="depthwise", init=self.init,
                     dtype=self.dtype)(x)
            x = conv(self.features, 1, 1, 1, name="pointwise", init=self.init,
                     dtype=self.dtype)(x)
        else:
            x = conv(self.features, self.kernel, self.stride, self.dilation,
                     name="conv", init=self.init, dtype=self.dtype)(x)
        x = batch_norm(train, name="bn", dtype=self.dtype)(x)
        if self.relu:
            x = nn.relu(x)
        return x


def max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def _upsample_axis_int(x, k: int, axis: int):
    """Bilinear (half-pixel centers, no antialias) upsample by an INTEGER
    factor k along one axis, as shift + lerp + phase interleave.

    For out index i = k*q + p the source coordinate is q + (p+0.5)/k - 0.5,
    so the floor offset (-1 or 0) and fractional weight depend only on the
    phase p — each phase is one elementwise lerp of x with its +/-1 shift
    (edge-clamped), and stack+reshape interleaves them. No gather and no
    dot: XLA's alternatives are a windowed convolution over the full input
    extent (measured 148 ms for the plbl feature upsample; this form is
    ~7 ms) or 2M-row gathers."""
    import numpy as np

    n = x.shape[axis]
    f = (np.arange(k) + 0.5) / k - 0.5
    off = np.floor(f).astype(int)  # -1 for the leading phases, else 0
    a = (f - off)  # weight of the higher tap
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    x_prev = jnp.concatenate(
        [first, jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis=axis)
    x_next = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, n, axis=axis), last], axis=axis)
    outs = []
    for p in range(k):
        lo, hi = (x_prev, x) if off[p] < 0 else (x, x_next)
        w = x.dtype.type(a[p])
        outs.append(lo * (1 - w) + hi * w)
    y = jnp.stack(outs, axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = n * k
    return y.reshape(shape)


def resize_bilinear(x, size: Tuple[int, int]):
    """F.interpolate(mode='bilinear', align_corners=False) equivalent
    (half-pixel centers)."""
    B, H, W, C = x.shape
    if (H, W) == tuple(size):
        return x
    oh, ow = size
    if oh % H == 0 and ow % W == 0:
        if oh // H > 1:
            x = _upsample_axis_int(x, oh // H, axis=1)
        if ow // W > 1:
            x = _upsample_axis_int(x, ow // W, axis=2)
        return x
    # antialias=False for torch F.interpolate parity (matters only when
    # downsampling; tested in tests/test_backbone_parity.py)
    return jax.image.resize(x, (B, size[0], size[1], C), method="bilinear",
                            antialias=False)


class S2DStemConv(nn.Module):
    """The stem's 3x3 stride-2 conv computed on a 2x2 space-to-depth view
    (the MLPerf-ResNet TPU trick): a 2x2 stride-1 conv on the 12-channel
    half-res view is EXACTLY the same linear map with rearranged weights.
    Gated by MULACTSEG_S2D_STEM (models/resnet.py): on the current chip
    it measured slightly SLOWER than the native 3-channel conv emitter
    (29.0 -> 28.7 img/s at stage-1 shapes) — kept as a per-hardware
    switch since the balance differs across TPU generations.

    The parameter keeps the canonical (3, 3, 3, features) shape under
    the same tree path ("<name>/kernel"), so torch import, checkpoints
    and inits are unchanged; the (2, 2, 12, features) kernel is derived
    in-trace (gradients flow through the rearrangement).

    Derivation: y[i,j] = sum_{di,dj in {-1,0,1}} W[di+1,dj+1] x[2i+di,
    2j+dj] (stride 2, pad 1). With z[u,v,(p,q,c)] = x[2u+p, 2v+q, c],
    the taps live at (u,v) in {i-1,i} x {j-1,j}: di = 2a+p-2 for
    z-offset a and phase p (a=p=0 -> di=-2 is out of support, weight 0).
    So a 2x2 stride-1 conv over z with top/left padding 1."""

    features: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        k = self.param("kernel", kaiming_out, (3, 3, C, self.features),
                       jnp.float32)
        dt = self.dtype or x.dtype
        # (B, H, W, C) -> (B, H/2, W/2, 4C), channel index (p*2+q)*C + c
        z = x.reshape(B, H // 2, 2, W // 2, 2, C)
        z = z.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        w2 = jnp.zeros((2, 2, 4 * C, self.features), k.dtype)
        for a in (0, 1):
            for p in (0, 1):
                di = 2 * a + p - 2
                if not -1 <= di <= 1:
                    continue
                for b in (0, 1):
                    for q in (0, 1):
                        dj = 2 * b + q - 2
                        if not -1 <= dj <= 1:
                            continue
                        w2 = w2.at[a, b, (p * 2 + q) * C:
                                   (p * 2 + q) * C + C, :].set(
                            k[di + 1, dj + 1])
        return jax.lax.conv_general_dilated(
            z.astype(dt), w2.astype(dt), window_strides=(1, 1),
            padding=((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
