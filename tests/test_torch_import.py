"""Torch->Flax weight import: numeric parity at the layer level (conv
geometry + BN semantics) and name-mapping coverage."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from mulactseg_tpu.models.layers import batch_norm, conv
from mulactseg_tpu.models.torch_import import (
    _map_backbone,
    torch_state_dict_to_variables,
)


def test_conv_bn_numeric_parity_stride2():
    torch.manual_seed(0)
    tconv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    tbn = torch.nn.BatchNorm2d(8)
    tbn.eval()
    with torch.no_grad():
        tbn.running_mean.uniform_(-1, 1)
        tbn.running_var.uniform_(0.5, 2)
        tbn.weight.uniform_(0.5, 2)
        tbn.bias.uniform_(-1, 1)
        x = torch.randn(1, 3, 9, 9)
        want = tbn(tconv(x)).numpy().transpose(0, 2, 3, 1)

    fconv = conv(8, 3, 2)
    fbn = batch_norm(train=False)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    kernel = jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0))
    y = fconv.apply({"params": {"kernel": kernel}}, xj)
    y = fbn.apply({"params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                              "bias": jnp.asarray(tbn.bias.detach().numpy())},
                   "batch_stats": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                                   "var": jnp.asarray(tbn.running_var.numpy())}},
                  y)
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-5, atol=2e-5)


def test_name_mapping_backbone():
    assert _map_backbone("conv1.0.weight") == ("stem_conv1", "kernel", "conv")
    assert _map_backbone("conv1.4.running_mean") == ("stem_bn2",
                                                     "running_mean", "bn")
    assert _map_backbone("layer3.5.conv2.weight") == ("layer3_5.conv2",
                                                      "kernel", "conv")
    assert _map_backbone("layer1.0.downsample.1.weight") == (
        "layer1_0.downsample_bn", "weight", "bn")
    assert _map_backbone("fc.weight") is None


def test_full_state_dict_conversion_into_model():
    """Synthesize a torch-named state_dict with the right shapes for the
    flagship model, convert, and check the tree merges into a fresh init
    with every backbone/classifier leaf matched."""
    from mulactseg_tpu.models import get_model
    from mulactseg_tpu.engine.checkpoint import merge_pretrained
    from flax.traverse_util import flatten_dict

    m = get_model("deeplabv3pluswn_resnet50deepstem", num_classes=7)
    variables = m.init({"params": jax.random.PRNGKey(0)},
                       jnp.ones((1, 33, 33, 3)), train=False)
    flat = flatten_dict(variables["params"])

    # build a fake torch state_dict by inverse-mapping our own tree
    sd = {}
    def tname(path):
        scope = path[0]
        mods = path[1:-1]
        leaf = path[-1]
        if scope == "backbone":
            parts = []
            for mo in mods:
                if mo.startswith("stem_conv"):
                    return f"backbone.conv1.{(int(mo[-1])-1)*3}.weight"
                if mo.startswith("stem_bn"):
                    base = f"backbone.conv1.{int(mo[-1])*3-2}"
                    return f"{base}.{'weight' if leaf=='scale' else 'bias'}"
                if mo.startswith("layer"):
                    l, b = mo[5:].split("_")
                    parts.append(f"layer{l}.{b}")
                elif mo == "downsample_conv":
                    parts.append("downsample.0")
                elif mo == "downsample_bn":
                    parts.append("downsample.1")
                else:
                    parts.append(mo)
            lf = ("weight" if leaf in ("kernel", "scale") else leaf)
            return "backbone." + ".".join(parts) + "." + lf
        return None

    rng = np.random.RandomState(0)
    for path, v in flat.items():
        name = tname(path)
        if name is None:
            continue
        shape = v.shape
        if path[-1] == "kernel":
            shape = (v.shape[3], v.shape[2], v.shape[0], v.shape[1])
        sd[name] = rng.randn(*shape).astype(np.float32)

    converted = torch_state_dict_to_variables(sd)
    merged = merge_pretrained(jax.device_get(variables["params"]),
                              converted["params"])
    # every backbone conv kernel must now differ from the fresh init
    n_checked = 0
    for path, v in flatten_dict(merged).items():
        if path[0] == "backbone" and path[-1] == "kernel":
            orig = flat[path]
            assert not np.allclose(np.asarray(v), np.asarray(orig))
            n_checked += 1
    assert n_checked > 50


def test_classifier_mapping():
    sd = {
        "classifier.aspp.convs.4.1.weight": np.zeros((256, 16, 1, 1), np.float32),
        "classifier.aspp.convs.0.0.weight": np.zeros((256, 16, 1, 1), np.float32),
        "classifier.classifier.3.weight": np.zeros((256, 256, 3, 3), np.float32),
        "classifier.proxy": np.zeros((7, 256, 1, 1), np.float32),
        "classifier.final.weight": np.zeros((7, 256, 1, 1), np.float32),
    }
    out = torch_state_dict_to_variables(sd, wn_head=True)
    p = out["params"]["classifier"]
    assert p["aspp"]["pool_conv"]["kernel"].shape == (1, 1, 16, 256)
    assert p["aspp"]["b0"]["conv"]["kernel"].shape == (1, 1, 16, 256)
    assert p["cls1"]["conv"]["kernel"].shape == (3, 3, 256, 256)
    assert p["proxy"].shape == (1, 1, 256, 7)
