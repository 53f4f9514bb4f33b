"""Train state: params + BN batch_stats + AdamW with per-group poly LR.

Matches the reference optimizer setup (trainer/base.py:64-76): AdamW (or
SGD momentum 0.9) with the classifier group at cls_lr_scale x the
backbone LR, weight decay on every parameter, PolyLR stepped per
iteration with a per-group min_lr floor (utils/scheduler.py:4-13).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from mulactseg_tpu.utils.schedule import poly_lr


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=new_batch_stats, opt_state=new_opt)


def make_optimizer(cfg, total_itrs: Optional[int] = None,
                   lr_mult: float = 1.0):
    # lr_mult: adaptive_train_lr scales the base lr by the round index
    # (trainer/active.py:30-33)
    total = total_itrs or cfg.finetune_itrs
    base_lr = cfg.train_lr * lr_mult

    def group_tx(scale):
        if cfg.scheduler == "poly":
            sched = poly_lr(base_lr * scale, total, cfg.power, cfg.min_lr)
        else:
            sched = base_lr * scale
        if cfg.optimizer == "adamw":
            return optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                               weight_decay=cfg.weight_decay)
        if cfg.optimizer == "sgd":
            return optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.sgd(sched, momentum=0.9))
        raise NotImplementedError(cfg.optimizer)

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "classifier" if path[0].key == "classifier"
            else "backbone", params)

    return optax.multi_transform(
        {"backbone": group_tx(1.0), "classifier": group_tx(cfg.cls_lr_scale)},
        label_fn)


def create_train_state(model, cfg, rng, input_shape, total_itrs=None,
                       lr_mult: float = 1.0):
    x = jnp.zeros(input_shape, jnp.float32)
    variables = model.init({"params": rng}, x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, total_itrs, lr_mult=lr_mult)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
