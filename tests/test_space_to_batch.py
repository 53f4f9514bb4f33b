"""Space-to-batch rewrites of dilated stages/ASPP are EXACT: phase
decomposition never mixes pixels a dilated conv would mix, and BN batch
stats see the same pixel multiset (models/resnet.space_to_batch)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mulactseg_tpu.models.deeplab import ASPP
from mulactseg_tpu.models.resnet import ResNet


@pytest.mark.parametrize("train", [False, True])
def test_resnet_s2b_exact(train):
    kw = dict(layers=(2, 2, 2, 2), deep_stem=True, stem_width=8,
              replace_stride_with_dilation=(False, True, True),
              stage_planes=(4, 8, 16, 32))
    m1 = ResNet(use_space_to_batch=False, **kw)
    m2 = ResNet(use_space_to_batch=True, **kw)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    v = m1.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    if train:
        o1, s1 = m1.apply(v, x, train=True, mutable=["batch_stats"])
        o2, s2 = m2.apply(v, x, train=True, mutable=["batch_stats"])
        for a, b in zip(jax.tree_util.tree_leaves(s1),
                        jax.tree_util.tree_leaves(s2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)
    else:
        o1 = m1.apply(v, x, train=False)
        o2 = m2.apply(v, x, train=False)
    for k in o1:
        np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o2[k]),
                                   rtol=2e-4, atol=2e-4)


def test_aspp_s2b_exact():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 12, 16),
                    jnp.float32)
    m1 = ASPP((6, 12, 18), out_channels=8, use_space_to_batch=False)
    m2 = ASPP((6, 12, 18), out_channels=8, use_space_to_batch=True)
    v = m1.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    o1 = m1.apply(v, x, train=False)
    o2 = m2.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-4,
                               atol=2e-4)
    _, s1 = m1.apply(v, x, train=True, mutable=["batch_stats"],
                     rngs={"dropout": jax.random.PRNGKey(1)})
    _, s2 = m2.apply(v, x, train=True, mutable=["batch_stats"],
                     rngs={"dropout": jax.random.PRNGKey(1)})
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-5)


def test_s2b_auto_disabled_on_indivisible():
    """49x49-style odd spatial dims fall back to dilated convs."""
    m = ResNet(layers=(1, 1, 1, 1), deep_stem=False, stem_width=8,
               stage_planes=(4, 8, 16, 32), use_space_to_batch=True)
    x = jnp.ones((1, 65, 65, 3))  # layer4 spatial 5x5, not divisible by 2
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = m.apply(v, x, train=False)
    assert out["out"].shape[1] == 5


def test_s2d_stem_conv_exact():
    """S2DStemConv == the plain 3x3 stride-2 pad-1 conv with the SAME
    parameter tree (models/layers.S2DStemConv derivation)."""
    import jax
    import jax.numpy as jnp

    from mulactseg_tpu.models.layers import S2DStemConv, conv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 96, 3), jnp.float32)
    m1 = conv(16, 3, 2, name="stem_conv1")
    v1 = m1.init(jax.random.PRNGKey(0), x)
    y1 = m1.apply(v1, x)
    y2 = S2DStemConv(16, name="stem_conv1").apply(v1, x)
    assert y1.shape == y2.shape
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-6)
