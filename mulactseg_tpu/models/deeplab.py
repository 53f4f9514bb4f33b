"""DeepLabV3 / V3+ heads and full models in Flax (NHWC).

Re-design of /root/reference/models/segmentation/deeplabv3.py and
utils.py: ASPP (5 branches + projection + dropout 0.1, deeplabv3.py:216-245),
the V3+ head (48-ch low-level projection, 304-ch concat,
deeplabv3.py:35-64), the C1 variant (two 3x3 blocks, :73-83), and the
weight-normalized cosine head — bias-free final 1x1 on L2-normalized
features against L2-normalized class proxies (:85-129).

`__call__(x, train, return_feat)` subsumes forward/feat_forward
(models/segmentation/utils.py:20-34): logits (and, when requested, the
256-d point features) are bilinearly upsampled to the input size.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from mulactseg_tpu.models.layers import (
    ConvBNReLU,
    batch_norm,
    conv,
    kaiming_in,
    resize_bilinear,
)


class ASPP(nn.Module):
    """use_space_to_batch: run the dilated branches on the phase view at
    the rates' common factor (e.g. rates 6/12/18 -> factor 6 -> dense-ish
    convs at dilation 1/2/3 on 36x batch) — exact, MXU-friendlier than
    XLA's dilated-conv lowering; auto-disabled when the spatial dims don't
    divide the factor. See models/resnet.space_to_batch."""

    atrous_rates: Sequence[int]
    out_channels: int = 256
    separable: bool = False
    dtype: object = None
    use_space_to_batch: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math

        from mulactseg_tpu.models.resnet import batch_to_space, space_to_batch

        size = x.shape[1:3]
        B = x.shape[0]
        dt = self.dtype
        f = math.gcd(*self.atrous_rates) if len(self.atrous_rates) > 1 else 0
        use_s2b = (self.use_space_to_batch and not self.separable and f > 1
                   and size[0] % f == 0 and size[1] % f == 0)
        xb = space_to_batch(x, f) if use_s2b else x
        res = [ConvBNReLU(self.out_channels, 1, init=kaiming_in, dtype=dt,
                          name="b0")(xb, train)]
        for i, rate in enumerate(self.atrous_rates):
            res.append(ConvBNReLU(self.out_channels, 3,
                                  dilation=rate // f if use_s2b else rate,
                                  separable=self.separable, init=kaiming_in,
                                  dtype=dt, name=f"b{i + 1}")(xb, train))
        # image pooling branch (per original image, computed outside the
        # phase view)
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = conv(self.out_channels, 1, init=kaiming_in, dtype=dt,
                      name="pool_conv")(pooled)
        pooled = batch_norm(train, name="pool_bn", dtype=dt)(pooled)
        pooled = nn.relu(pooled)
        if use_s2b:
            pooled = jnp.repeat(pooled, f * f, axis=0)
        pooled = jnp.broadcast_to(
            pooled, (xb.shape[0], xb.shape[1], xb.shape[2],
                     self.out_channels))
        res.append(pooled)
        y = jnp.concatenate(res, axis=-1)
        y = ConvBNReLU(self.out_channels, 1, init=kaiming_in, dtype=dt,
                       name="project")(y, train)
        if use_s2b:
            y = batch_to_space(y, f, B)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        return y


class DeepLabHeadV3Plus(nn.Module):
    """variant: 'plain' (one 3x3 block + biased final), 'c1' (two blocks),
    'wn' (two blocks + cosine final)."""

    num_classes: int
    aspp_dilate: Sequence[int] = (6, 12, 18)
    variant: str = "plain"
    separable: bool = False
    dtype: object = None
    low_channels: int = 48       # low-level projection width (deeplabv3.py:39)
    mid_channels: int = 256      # ASPP/classifier width (deeplabv3.py:47,219)

    @nn.compact
    def __call__(self, feats, train: bool = False, return_feat: bool = False):
        dt = self.dtype
        low = ConvBNReLU(self.low_channels, 1, init=kaiming_in, dtype=dt,
                         name="project")(feats["low_level"], train)
        y = ASPP(self.aspp_dilate, out_channels=self.mid_channels,
                 separable=self.separable, dtype=dt,
                 name="aspp")(feats["out"], train)
        y = resize_bilinear(y, low.shape[1:3])
        y = jnp.concatenate([low, y], axis=-1)
        y = ConvBNReLU(self.mid_channels, 3, separable=self.separable,
                       init=kaiming_in, dtype=dt, name="cls0")(y, train)
        if self.variant in ("c1", "wn"):
            y = ConvBNReLU(self.mid_channels, 3, separable=self.separable,
                           init=kaiming_in, dtype=dt, name="cls1")(y, train)
        if self.variant == "wn":
            # cosine-similarity logits (deeplabv3.py:97-100); normalization
            # and the proxy matmul run in f32 for numerical stability.
            y32 = y.astype(jnp.float32)
            feat = y32 / jnp.sqrt(
                jnp.sum(jnp.square(y32), axis=-1, keepdims=True) + 1e-12)
            proxy = self.param(
                "proxy", kaiming_in, (1, 1, y.shape[-1], self.num_classes))
            proxy_n = proxy / jnp.sqrt(
                jnp.sum(jnp.square(proxy), axis=2, keepdims=True) + 1e-12)
            logits = jnp.einsum("bhwc,ijcn->bhwn", feat, proxy_n)
            point_feature = feat
        else:
            logits = conv(self.num_classes, 1, use_bias=True, init=kaiming_in,
                          dtype=dt, name="final")(y)
            point_feature = y
        if return_feat:
            return point_feature, logits
        return logits


class DeepLabHeadV3(nn.Module):
    num_classes: int
    aspp_dilate: Sequence[int] = (6, 12, 18)
    separable: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False, return_feat: bool = False):
        y = ASPP(self.aspp_dilate, separable=self.separable,
                 name="aspp")(feats["out"], train)
        y = ConvBNReLU(256, 3, separable=self.separable, init=kaiming_in,
                       name="cls0")(y, train)
        logits = conv(self.num_classes, 1, use_bias=True, init=kaiming_in,
                      name="final")(y)
        if return_feat:
            return y, logits
        return logits


class DeepLabHeadV2(nn.Module):
    """Legacy DeepLabV2 head: sum of 4 dilated 3x3 classifiers, no BN
    (models/segmentation/deeplabv2.py)."""

    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)

    @nn.compact
    def __call__(self, feats, train: bool = False, return_feat: bool = False):
        x = feats["out"]
        logits = None
        for i, d in enumerate(self.dilations):
            out = conv(self.num_classes, 3, dilation=d, use_bias=True,
                       init=kaiming_in, name=f"branch{i}")(x)
            logits = out if logits is None else logits + out
        if return_feat:
            return x, logits
        return logits


class SimpleAuxHead(nn.Module):
    """Single 3x3 conv auxiliary classifier
    (models/segmentation/deeplabv2.py:64-70; exported by the reference but
    never wired into a constructor — included for model-zoo completeness,
    attachable via DeepLabV3(aux_classifier=...))."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        return conv(self.channels, 3, use_bias=False, init=kaiming_in,
                    name="classifier")(x)


class DeepLabV3(nn.Module):
    """Backbone + head + bilinear upsample to the input size
    (models/segmentation/utils.py:20-34). aux_classifier, when set, taps
    the backbone's low_level features and returns (logits, aux) — the
    _SimpleSegmentationModel aux contract.

    nchw_logits=True returns (B, C, H, W) instead of (B, H, W, C): the
    NHWC->NCHW transpose happens at HEAD resolution (16x fewer pixels)
    before the bilinear upsample, for train criteria that consume the
    native NCHW layout (losses/fused.py). Measured perf-NEUTRAL on the
    current chip (29.6 both ways — XLA already stores the full-res
    logits NCHW-physical, so the logical transpose was near-free); kept
    because it makes the loss's layout explicit instead of relying on
    XLA's layout assignment, which may differ on other hardware."""

    backbone: nn.Module
    classifier: nn.Module
    aux_classifier: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_feat: bool = False,
                 return_aux: bool = False, nchw_logits: bool = False,
                 feat_bf16: bool = False):
        input_size = x.shape[1:3]
        feats = self.backbone(x, train)
        if return_aux:
            if self.aux_classifier is None:
                raise ValueError("model built without aux_classifier")
            aux = self.aux_classifier(feats["low_level"], train)
            aux = resize_bilinear(aux, input_size).astype(jnp.float32)
            logits = self.classifier(feats, train)
            return resize_bilinear(logits, input_size).astype(jnp.float32), aux
        if return_feat:
            feat, logits = self.classifier(feats, train, return_feat=True)
            if feat_bf16:
                # plbl fast path (generator sim_bf16): cast the normalized
                # features to bf16 at HEAD resolution so the full-res
                # upsample writes half the HBM bytes and the cosine
                # kernel's scan passes read bf16 directly (its matmuls run
                # bf16 anyway). ~1e-3 of per-pixel sim noise, inside the
                # sim_bf16 tolerance documented in plbl/cosine_prop.py.
                feat = resize_bilinear(feat.astype(jnp.bfloat16), input_size)
            else:
                feat = resize_bilinear(feat, input_size).astype(jnp.float32)
            logits = resize_bilinear(logits, input_size).astype(jnp.float32)
            return feat, logits
        logits = self.classifier(feats, train)
        if nchw_logits:
            lg = jnp.transpose(logits, (0, 3, 1, 2))  # head res — cheap
            B, C = lg.shape[:2]
            lg = jax.image.resize(
                lg, (B, C, input_size[0], input_size[1]),
                method="bilinear", antialias=False)
            return lg.astype(jnp.float32)
        return resize_bilinear(logits, input_size).astype(jnp.float32)
