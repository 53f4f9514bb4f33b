"""Checkpointing: params + batch_stats + opt_state + step + active-set
state in one atomic Orbax unit (SURVEY.md section 5's upgrade of the
reference's torch.save round checkpoints, trainer/base.py:281-294).

Also provides the reference's "ImageNet init with classifier weights
stripped" load semantics (trainer/active_joint_multi_predignore.py:146-173):
when restoring a pretrained tree into a model whose classifier head
changed shape, head params that mismatch are kept at their fresh init.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax.traverse_util import flatten_dict, unflatten_dict


def save_checkpoint(path: str, state, extra: Optional[dict] = None):
    path = os.path.abspath(path)
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
    }
    if extra:
        payload["extra"] = extra
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, state=None):
    """Returns the raw payload dict; if `state` is given, returns a new
    state with params/batch_stats/opt_state/step restored."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if state is None:
        return ckptr.restore(path)
    template = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": 0,
    }
    try:
        payload = ckptr.restore(path, template)
    except Exception:
        payload = ckptr.restore(path)
    return state.replace(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"],
        step=np.asarray(payload["step"], np.int32),
    )


def merge_pretrained(fresh_params: Any, pretrained_params: Any,
                     strip_classifier_final: bool = True) -> Any:
    """Non-strict load: copy every pretrained leaf whose path exists in the
    fresh tree with a matching shape; optionally drop the final classifier
    weights (final kernel/bias and the WN proxy), mirroring
    trainer/active_joint_multi_predignore.py:156-168."""
    fresh = flatten_dict(fresh_params)
    pre = flatten_dict(pretrained_params)
    out = dict(fresh)
    for k, v in pre.items():
        if strip_classifier_final and k and k[0] == "classifier":
            leafname = "/".join(k)
            if "final" in leafname or k[-1] == "proxy":
                continue
        if k in fresh and fresh[k].shape == np.shape(v):
            out[k] = v
    return unflatten_dict(out)
