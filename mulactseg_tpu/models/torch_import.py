"""Torch state_dict -> Flax variables converter.

Lets this framework consume the reference's checkpoints: the deep-stem
ImageNet init (.pth referenced at models/segmentation/backbone/
resnet.py:256-260) and round checkpoints
({'model_state_dict': ...} tars, trainer/base.py:281-294).

Name mapping (torch left, ours right):
  backbone.conv1.{0,3,6}            -> backbone.stem_conv{1,2,3}
  backbone.conv1.{1,4}              -> backbone.stem_bn{1,2}
  backbone.conv1 (plain 7x7)        -> backbone.conv1
  backbone.bn1                      -> backbone.bn1
  backbone.layerL.B.convK/bnK       -> backbone.layerL_{B}.convK/bnK
  backbone.layerL.B.downsample.{0,1}-> ...downsample_conv/_bn
  classifier.project.{0,1}          -> classifier.project.conv/bn
  classifier.aspp.convs.k.{...}     -> classifier.aspp.b{k}.conv/bn
  classifier.aspp.convs.4.{1,2}     -> classifier.aspp.pool_conv/pool_bn
  classifier.aspp.project.{0,1}     -> classifier.aspp.project.conv/bn
  classifier.classifier.{0,1}/{3,4} -> classifier.cls0/cls1 .conv/.bn
  classifier.final / proxy          -> classifier.final / proxy

Conv kernels transpose OIHW -> HWIO; BN weight/bias -> scale/bias and
running stats -> batch_stats.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np
from flax.traverse_util import unflatten_dict


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _map_backbone(name: str):
    m = re.match(r"conv1\.([036])\.weight$", name)
    if m:
        idx = int(m.group(1))
        return ("stem_conv" + {0: "1", 3: "2", 6: "3"}[idx], "kernel", "conv")
    m = re.match(r"conv1\.([14])\.(weight|bias|running_mean|running_var)$", name)
    if m:
        idx = int(m.group(1))
        return ("stem_bn" + {1: "1", 4: "2"}[idx], m.group(2), "bn")
    if name == "conv1.weight":
        return ("conv1", "kernel", "conv")
    m = re.match(r"bn1\.(weight|bias|running_mean|running_var)$", name)
    if m:
        return ("bn1", m.group(1), "bn")
    m = re.match(r"layer(\d)\.(\d+)\.conv(\d)\.weight$", name)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}.conv{m.group(3)}", "kernel",
                "conv")
    m = re.match(r"layer(\d)\.(\d+)\.bn(\d)\.(weight|bias|running_mean|running_var)$",
                 name)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}.bn{m.group(3)}", m.group(4),
                "bn")
    m = re.match(r"layer(\d)\.(\d+)\.downsample\.0\.weight$", name)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}.downsample_conv", "kernel",
                "conv")
    m = re.match(r"layer(\d)\.(\d+)\.downsample\.1\.(weight|bias|running_mean|running_var)$",
                 name)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}.downsample_bn", m.group(3),
                "bn")
    return None


def _map_classifier(name: str):
    def cbn(prefix, idx_conv, idx_bn, ours):
        m = re.match(rf"{prefix}\.{idx_conv}\.weight$", name)
        if m:
            return (f"{ours}.conv", "kernel", "conv")
        m = re.match(rf"{prefix}\.{idx_bn}\.(weight|bias|running_mean|running_var)$",
                     name)
        if m:
            return (f"{ours}.bn", m.group(1), "bn")
        return None

    for args in ((r"project", 0, 1, "project"),
                 (r"aspp\.convs\.0", 0, 1, "aspp.b0"),
                 (r"aspp\.convs\.1", 0, 1, "aspp.b1"),
                 (r"aspp\.convs\.2", 0, 1, "aspp.b2"),
                 (r"aspp\.convs\.3", 0, 1, "aspp.b3"),
                 (r"aspp\.project", 0, 1, "aspp.project"),
                 (r"classifier", 0, 1, "cls0"),
                 (r"classifier", 3, 4, "cls1")):
        r = cbn(*args)
        if r:
            return r
    m = re.match(r"aspp\.convs\.4\.1\.weight$", name)
    if m:
        return ("pool_conv_", "kernel", "conv")
    m = re.match(r"aspp\.convs\.4\.2\.(weight|bias|running_mean|running_var)$",
                 name)
    if m:
        return ("pool_bn_", m.group(1), "bn")
    if name == "final.weight":
        return ("final_or_proxy", "kernel", "conv")
    if name == "final.bias":
        return ("final_bias", "bias", "raw")
    if name == "proxy":
        return ("proxy_", "kernel", "conv")
    return None


def torch_state_dict_to_variables(state_dict: Dict[str, "object"],
                                  wn_head: bool = True) -> Dict:
    """Returns {'params': ..., 'batch_stats': ...} nested dicts with this
    framework's module names. Unrecognized keys are skipped (fc.* etc.)."""
    params = {}
    stats = {}

    def put(tree, dotted: Tuple[str, ...], leaf, value):
        tree[tuple(dotted) + (leaf,)] = value

    for name, tensor in state_dict.items():
        value = np.asarray(getattr(tensor, "numpy", lambda: tensor)())
        if name.startswith("backbone."):
            mapped = _map_backbone(name[len("backbone."):])
            scope = ("backbone",)
        elif name.startswith("classifier."):
            mapped = _map_classifier(name[len("classifier."):])
            scope = ("classifier",)
        else:
            mapped = _map_backbone(name)
            scope = ("backbone",)
        if mapped is None:
            continue
        mod, leaf, kind = mapped
        if mod == "pool_conv_":
            path = scope + ("aspp", "pool_conv")
            put(params, path, "kernel", _conv(value))
            continue
        if mod == "pool_bn_":
            path = scope + ("aspp", "pool_bn")
            _put_bn(params, stats, path, leaf, value)
            continue
        if mod == "final_or_proxy":
            tgt = "proxy" if wn_head else "final"
            if wn_head:
                put(params, scope, "proxy", _conv(value))
            else:
                put(params, scope + ("final",), "kernel", _conv(value))
            continue
        if mod == "proxy_":
            put(params, scope, "proxy", _conv(value))
            continue
        if mod == "final_bias":
            put(params, scope + ("final",), "bias", value)
            continue
        path = scope + tuple(mod.split("."))
        if kind == "conv":
            put(params, path, "kernel", _conv(value))
        elif kind == "bn":
            _put_bn(params, stats, path, leaf, value)
    return {"params": unflatten_dict(params),
            "batch_stats": unflatten_dict(stats)}


def _put_bn(params, stats, path, leaf, value):
    if leaf == "weight":
        params[tuple(path) + ("scale",)] = value
    elif leaf == "bias":
        params[tuple(path) + ("bias",)] = value
    elif leaf == "running_mean":
        stats[tuple(path) + ("mean",)] = value
    elif leaf == "running_var":
        stats[tuple(path) + ("var",)] = value


def load_torch_checkpoint(path: str, wn_head: bool = True) -> Dict:
    """Load a torch .pth/.tar (optionally nested under 'model_state_dict'
    or 'model') and convert."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if isinstance(obj, dict) and "model" in obj and not hasattr(
            next(iter(obj.values())), "shape"):
        obj = obj["model"]
    sd = {k: v.cpu().numpy() for k, v in obj.items()
          if hasattr(v, "cpu")}
    return torch_state_dict_to_variables(sd, wn_head=wn_head)
