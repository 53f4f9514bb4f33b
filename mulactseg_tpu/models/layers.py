"""Shared Flax building blocks (NHWC, torch-compatible geometry).

Padding is explicit and symmetric to match torch's Conv2d(padding=p)
exactly — SAME padding differs in pixel alignment for stride-2 convs,
which would break torch-weight import parity.
"""

from __future__ import annotations

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
            # shapes (tools_dev/bench_bn.py)
            import numpy as _np

            n = float(_np.prod([x.shape[a] for a in axes]))
            m = jnp.sum(x, axis=axes, dtype=jnp.float32) / n
            m2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axes) / n
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


def batch_norm(train: bool, name: Optional[str] = None,
               momentum: float = 0.9, dtype=None) -> FastBatchNorm:
    """torch BatchNorm2d(momentum=0.1) == flax momentum 0.9
    (running = 0.9*running + 0.1*batch; models/__init__.py:7 sets 0.1)."""
    return FastBatchNorm(use_running_average=not train, momentum=momentum,
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


def resize_bilinear(x, size: Tuple[int, int]):
    """F.interpolate(mode='bilinear', align_corners=False) equivalent
    (half-pixel centers)."""
    import jax
    B, H, W, C = x.shape
    if (H, W) == tuple(size):
        return x
    # antialias=False for torch F.interpolate parity (matters only when
    # downsampling; tested in tests/test_backbone_parity.py)
    return jax.image.resize(x, (B, size[0], size[1], C), method="bilinear",
                            antialias=False)
