"""Model zoo shape/behavior tests (SURVEY.md section 2c parity)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mulactseg_tpu.models import get_model


def _init_apply(name, num_classes=7, os=16, size=33, train=False, **kw):
    m = get_model(name, num_classes=num_classes, output_stride=os, **kw)
    x = jnp.ones((1, size, size, 3)) * 0.1
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = m.init(rngs, x, train=False)
    return m, variables, x


def test_wn_head_cosine_logits_bounded():
    m, v, x = _init_apply("deeplabv3pluswn_resnet50deepstem")
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 33, 33, 7)
    # cosine similarity logits must lie in [-1, 1]
    assert float(jnp.max(jnp.abs(y))) <= 1.0 + 1e-5


def test_feat_forward_normalized():
    m, v, x = _init_apply("deeplabv3pluswn_resnet50deepstem")
    f, l = m.apply(v, x, train=False, return_feat=True)
    assert f.shape == (1, 33, 33, 256)
    assert l.shape == (1, 33, 33, 7)


def test_output_stride_changes_backbone_resolution():
    from mulactseg_tpu.models.resnet import resnet50deepstem
    x = jnp.ones((1, 64, 64, 3))
    for os, want in ((16, 4), (8, 8)):
        rswd = (False, False, True) if os == 16 else (False, True, True)
        bb = resnet50deepstem(replace_stride_with_dilation=rswd)
        v = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        taps = bb.apply(v, x, train=False)
        assert taps["out"].shape[1] == want
        assert taps["low_level"].shape[1] == 16  # stride 4
        assert taps["out"].shape[-1] == 2048
        assert taps["low_level"].shape[-1] == 256


@pytest.mark.parametrize("name", [
    "deeplabv3plus_resnet50",
    "deeplabv3_resnet50",
    "deeplabv3plus_mobilenet",
    "deeplabv2_resnet101",
])
def test_other_archs_forward(name):
    m, v, x = _init_apply(name, num_classes=5)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 33, 33, 5)


def test_separable_conv_variant():
    m, v, x = _init_apply("deeplabv3plus_resnet50", separable_conv=True)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 33, 33, 7)
    flat = jax.traverse_util_flatten = None  # noqa: F841
    from flax.traverse_util import flatten_dict
    keys = {"/".join(k) for k in flatten_dict(v["params"]).keys()}
    assert any("depthwise" in k for k in keys)


def test_train_mode_updates_batch_stats():
    m, v, x = _init_apply("deeplabv3pluswn_resnet50deepstem")
    y, mutated = m.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    old = v["batch_stats"]["backbone"]["bn1"]["mean"]
    new = mutated["batch_stats"]["backbone"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_simple_aux_head():
    """DeepLabV2's SimpleAuxHead (deeplabv2.py:64-70) attaches to the
    wrapper's low_level tap and returns (logits, aux)."""
    import jax
    import jax.numpy as jnp

    from mulactseg_tpu.models.deeplab import (DeepLabHeadV2, DeepLabV3,
                                              SimpleAuxHead)
    from mulactseg_tpu.models.resnet import ResNet

    m = DeepLabV3(
        backbone=ResNet(layers=(1, 1, 1, 1), deep_stem=False, stem_width=8,
                        replace_stride_with_dilation=(False, False, True),
                        stage_planes=(4, 8, 16, 32)),
        classifier=DeepLabHeadV2(num_classes=6),
        aux_classifier=SimpleAuxHead(channels=6))
    x = jnp.ones((1, 33, 33, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False,
               return_aux=True)
    logits, aux = m.apply(v, x, train=False, return_aux=True)
    assert logits.shape == (1, 33, 33, 6)
    assert aux.shape == (1, 33, 33, 6)
