"""Active-learning trainer shell and round orchestration.

The functional core (jitted steps) lives in engine/train.py; this module
is the thin stateful shell: fresh model per round (train_AL.py:44-46),
resume scenarios, train loop with periodic validation + best-checkpoint
policy (trainer/base.py:222-244), selection, eval — the call stack of
SURVEY.md section 3.1.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mulactseg_tpu.acquisition import get_selector
from mulactseg_tpu.data.loader import DataProvider
from mulactseg_tpu.engine.checkpoint import (
    load_checkpoint,
    merge_pretrained,
    save_checkpoint,
)
from mulactseg_tpu.engine.evaluate import Evaluator
from mulactseg_tpu.engine.state import create_train_state
from mulactseg_tpu.engine.train import make_eval_step, make_train_step
from mulactseg_tpu.models import get_model
from mulactseg_tpu.parallel import (
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_batch,
)

log = logging.getLogger("mulactseg_tpu")


class ALTrainer:
    """ActiveTrainer equivalent (trainer/active.py:10-104): holds the
    model + state for one AL round."""

    def __init__(self, cfg, selection_iter: int, val_dataset=None,
                 eval_dataset=None, rng: Optional[jax.Array] = None,
                 model=None):
        self.cfg = cfg
        self.selection_iter = selection_iter
        self.best_iou = 0.0
        dtype = {"bfloat16": jnp.bfloat16, "float32": None}.get(cfg.dtype)
        # model injection: tests and the multichip dryrun pass a small
        # network so the (CPU-)compile cost of exercising the REAL
        # trainer path stays bounded; production always builds from
        # cfg.model
        self.model = model if model is not None else get_model(
            cfg.model, num_classes=cfg.num_model_classes,
            output_stride=cfg.output_stride,
            separable_conv=cfg.separable_conv,
            dtype=dtype)
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        h, w = cfg.crop_size
        self.state = create_train_state(
            self.model, cfg, init_rng,
            (cfg.train_batch_size, h, w, 3), total_itrs=cfg.finetune_itrs,
            lr_mult=float(selection_iter) if cfg.adaptive_train_lr else 1.0)
        from mulactseg_tpu.engine.train import CRITERIA

        # eval-only methods (eval_save_* / analysis eval_*) have no
        # training criterion; the trainer still serves model/eval/plbl
        self.train_step = (make_train_step(self.model, cfg)
                           if cfg.method in CRITERIA else None)
        self.eval_step = make_eval_step(self.model)
        self.evaluator = Evaluator(self.model, cfg)
        self.val_dataset = val_dataset
        self.eval_dataset = eval_dataset
        # Data parallelism: params/opt state replicated, batches sharded over
        # the mesh's data axis; XLA inserts the gradient/normalizer psums
        # (replaces the reference's dead SequentialDistributedSampler,
        # active_selection/utils.py:8-45). With n_devices unset, all devices
        # are used when the batch divides evenly; an explicit width that
        # doesn't divide the batch is an error.
        n_dev = cfg.n_devices
        if n_dev is None:
            n_dev = len(jax.devices())
            while n_dev > 1 and cfg.train_batch_size % n_dev:
                n_dev -= 1  # largest width that divides the batch
        elif cfg.train_batch_size % n_dev:
            raise ValueError(
                f"train_batch_size {cfg.train_batch_size} not divisible "
                f"by data-parallel width {n_dev}")
        self.mesh = make_mesh(n_dev)
        self.dp = self.mesh.size > 1
        if self.dp:
            self.state = replicate(self.state, self.mesh)
        # XLA-chosen entry layouts for the K-step scan (single-chip only:
        # under DP the batch carries explicit shardings instead). The host
        # then transfers each super-batch directly into the layout the
        # compiled loop wants, instead of the loop re-laying-out every
        # sliced xs slab per step.
        self._auto_layout = (os.environ.get("MULACTSEG_AUTO_LAYOUT", "0")
                             == "1" and not self.dp)
        self._scan_step = None
        self._scan_compiled = None  # (compiled, fmt_state, fmt_batch, fmt_key)
        if cfg.steps_per_dispatch > 1 and self.train_step is not None:
            from mulactseg_tpu.engine.train import make_train_step_scan

            self._scan_step = make_train_step_scan(
                self.model, cfg, cfg.steps_per_dispatch,
                auto_layout=self._auto_layout)
        self.checkpoint_file = os.path.join(
            cfg.model_save_dir, f"checkpoint{selection_iter:02d}")

    # -- inference helpers ------------------------------------------------------
    def predict_logits(self, images) -> jax.Array:
        """Eval-mode logits; under DP the batch is padded to a multiple of
        the mesh size (edge-repeat) and sharded so pool scoring runs on all
        chips (SURVEY.md section 5 'distributed communication backend')."""
        if self.dp:
            imgs, n = pad_to_multiple(np.asarray(images), self.mesh.size)
            imgs = shard_batch(jnp.asarray(imgs), self.mesh)
            out = self.eval_step(self.state.params, self.state.batch_stats,
                                 imgs)
            return out[:n]
        # single chip: pad a short final batch (e.g. 2975 pool images % 4)
        # up to val_batch_size — one compiled shape instead of a
        # minutes-long extra jit compile for the tail batch
        images = np.asarray(images)
        n = images.shape[0]
        if 0 < n < self.cfg.val_batch_size:
            images, _ = pad_to_multiple(images, self.cfg.val_batch_size)
        out = self.eval_step(self.state.params, self.state.batch_stats,
                             jnp.asarray(images))
        return out[:n]

    # -- checkpointing ------------------------------------------------------------
    def save(self, path: Optional[str] = None):
        save_checkpoint(path or self.checkpoint_file, self.state)

    def load(self, path: str, strip_classifier: Optional[bool] = None,
             load_optim: bool = True):
        """4 resume scenarios of train_AL.py:47-57 funnel here. For
        'imagenet_pretrained' style inits the classifier final weights are
        stripped (trainer/active_joint_multi_predignore.py:146-168).
        load_optim=False restores only params/batch_stats — fresh
        optimizer and step 0, the reference's
        load_checkpoint(load_optimizer=False) (trainer/base.py:288-295)."""
        if strip_classifier is None:
            strip_classifier = "imagenet_pretrained" in path
        if strip_classifier:
            payload = load_checkpoint(path)
            merged = merge_pretrained(jax.device_get(self.state.params),
                                      payload["params"])
            self.state = self.state.replace(params=merged)
            if "batch_stats" in payload:
                bs = merge_pretrained(jax.device_get(self.state.batch_stats),
                                      payload["batch_stats"],
                                      strip_classifier_final=False)
                self.state = self.state.replace(batch_stats=bs)
        elif load_optim:
            self.state = load_checkpoint(path, self.state)
        else:
            restored = load_checkpoint(path, self.state)
            self.state = self.state.replace(params=restored.params,
                                            batch_stats=restored.batch_stats)
        if self.dp:  # restored leaves land on host/device 0; re-replicate
            self.state = replicate(self.state, self.mesh)

    # -- training -----------------------------------------------------------------
    def train(self, active_set, total_itrs: Optional[int] = None,
              val_period: Optional[int] = None,
              log_every: Optional[int] = None,
              metrics_cb: Optional[Callable[[int, Dict], None]] = None):
        cfg = self.cfg
        if self.train_step is None:
            raise RuntimeError(
                f"method {cfg.method!r} is eval-only (no training criterion)")
        total_itrs = total_itrs or cfg.finetune_itrs
        val_period = val_period or cfg.val_period
        # reference log cadence: args.log_period (trainer/active.py:95)
        log_every = log_every if log_every is not None else cfg.log_period
        trainset = active_set.get_trainset()
        post = None
        if cfg.dtype == "bfloat16":
            import ml_dtypes

            def post(batch):  # bf16 images host-side: halves the transfer
                # uint8 crops (cfg.ship_uint8) stay uint8 — casting here
                # would both lose the 1-byte/px transfer and defeat the
                # dtype check that triggers on-device normalization
                # (engine/train._build_loss_fn); already-bf16 images (the
                # train transform's out_dtype emits them directly) skip
                # the redundant full-array astype copy
                for k in ("images", "images_weak"):
                    if (k in batch and batch[k].dtype != np.uint8
                            and batch[k].dtype != ml_dtypes.bfloat16):
                        batch[k] = batch[k].astype(ml_dtypes.bfloat16)
                return batch
        loader = DataProvider(trainset, cfg.train_batch_size, shuffle=True,
                              drop_last=True, infinite=True,
                              num_workers=cfg.num_workers, seed=cfg.seed,
                              post=post)
        t0 = time.time()
        n_img = 0
        profiling = False
        if cfg.profile:
            from jax import profiler as _profiler
            os.makedirs(os.path.join(cfg.model_save_dir, "profile"),
                        exist_ok=True)
            _profiler.start_trace(os.path.join(cfg.model_save_dir, "profile"))
            profiling = True
        keys = ("images", "target", "target_bits", "spx", "spmask", "labels",
                "spx_small", "images_weak", "spx_weak", "spmask_weak",
                "spx_small_weak")

        def ship_keys(first_batch):
            # the fused lossdecomp criterion consumes target_bits / target /
            # spx only — the selection mask is already folded into the bits
            # (losses/fused.pixel_target_bits), so spmask would ship
            # (K, B, H, W) bool per dispatch for nothing. The composed
            # fallback (no bits, e.g. C > 31) still needs it.
            if (cfg.method.endswith("_lossdecomp")
                    and "target_bits" in first_batch):
                return tuple(k for k in keys if k != "spmask")
            return keys
        K = max(1, cfg.steps_per_dispatch)
        it = 0
        while it < total_itrs:
            if self._scan_step is not None and it + K <= total_itrs and \
                    (self.val_dataset is None or
                     (it % val_period) + K <= val_period):
                # device-side K-step dispatch: the per-call round trip
                # (~75ms on the tunnel) amortizes across K optimizer steps
                batches = [next(loader) for _ in range(K)]
                super_batch = {
                    k: np.stack([b[k] for b in batches])
                    for k in ship_keys(batches[0]) if k in batches[0]
                }
                self.rng, step_rng = jax.random.split(self.rng)
                if self._auto_layout:
                    if self._scan_compiled is None:
                        compiled = self._scan_step.lower(
                            self.state, super_batch, step_rng).compile()
                        fmts, _ = compiled.input_formats
                        self._scan_compiled = (compiled,) + tuple(fmts)
                    compiled, f_state, f_batch, f_key = self._scan_compiled
                    # no-op when already in format; re-lays-out after any
                    # default-layout step (fallback path, checkpoint load)
                    self.state = jax.device_put(self.state, f_state)
                    super_batch = jax.device_put(super_batch, f_batch)
                    self.state, auxs = compiled(
                        self.state, super_batch,
                        jax.device_put(step_rng, f_key))
                else:
                    super_batch = {k: jnp.asarray(v)
                                   for k, v in super_batch.items()}
                    if self.dp:  # (K, B, ...) — shard the batch dim, axis 1
                        super_batch = shard_batch(super_batch, self.mesh,
                                                  batch_dim=1)
                    self.state, auxs = self._scan_step(
                        self.state, super_batch, step_rng)
                aux = {k: v[-1] for k, v in auxs.items()}
                it += K
            else:
                batch = next(loader)
                device_batch = {k: jnp.asarray(batch[k])
                                for k in ship_keys(batch) if k in batch}
                if self.dp:
                    device_batch = shard_batch(device_batch, self.mesh)
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, aux = self.train_step(self.state, device_batch,
                                                  step_rng)
                it += 1
            n_img = it * cfg.train_batch_size
            if metrics_cb is not None and it % log_every < K:
                aux_host = {k: float(v) for k, v in aux.items()}
                aux_host["images_per_sec"] = n_img / (time.time() - t0)
                metrics_cb(it - 1, aux_host)
            # reference gate: `iteration % val_period == val_period-1 and
            # iteration > val_start` (trainer/active.py:54); `it` here is
            # already 1-based past the step, so it % val_period == 0
            if (self.val_dataset is not None and it % val_period == 0
                    and it - 1 > cfg.val_start):
                self.validate(it - 1)
        jax.block_until_ready(self.state.params)
        if profiling:
            from jax import profiler as _profiler
            _profiler.stop_trace()
        return n_img / (time.time() - t0)

    def validate(self, trainiter: int):
        loader = DataProvider(self.val_dataset, self.cfg.val_batch_size,
                              shuffle=False, drop_last=False, infinite=False,
                              num_workers=self.cfg.val_num_workers)
        miou, table = self.evaluator.run(self.state.params,
                                         self.state.batch_stats, loader)
        log.info("[val @%d] %s", trainiter, table)
        if miou > self.best_iou:  # best-val overwrite (trainer/base.py:229-233)
            self.best_iou = miou
            self.save()
        return miou

    def eval(self):
        loader = DataProvider(self.eval_dataset, self.cfg.val_batch_size,
                              shuffle=False, drop_last=False, infinite=False,
                              num_workers=self.cfg.val_num_workers)
        # batch-1 full-res eval shards the image height over the mesh
        # (spatial partitioning; GSPMD halo exchange) — batch sharding is
        # useless at val_batch_size 1
        mesh = self.mesh if (self.mesh.size > 1 and
                             self.cfg.val_batch_size == 1) else None
        miou, table = self.evaluator.run(self.state.params,
                                         self.state.batch_stats, loader,
                                         mesh=mesh)
        log.info("[AL %d-round eval] %s", self.selection_iter, table)
        return miou, table


def run_al_rounds(cfg, active_set, *, val_dataset=None, eval_dataset=None,
                  init_checkpoint: Optional[str] = None,
                  metrics_cb=None) -> Dict[int, float]:
    """The stage-1 AL loop (train_AL.py:18-100): for each round select ->
    train -> eval; fresh model every round when start_over.

    The multi-round weight policy follows train_AL.py exactly:
      - round 1 == init_iteration: selection with init_checkpoint weights
        (train_AL.py:47-49);
      - round r>1, r != init_iteration: selection with the PREVIOUS
        round's best-val checkpoint (train_AL.py:50-52 prevckpt_fname);
      - round r>1 == init_iteration: selection with resume_checkpoint
        (train_AL.py:53-55);
      - start_over: training restarts from the init weights every round
        (train_AL.py:74-75), otherwise it continues from the
        selection-time weights;
      - after training, the round's BEST-val checkpoint is loaded back
        before eval (train_AL.py:80-81) so both the reported mIoU and
        the next round's selection use the best model, not the last step.
    """
    results = {}
    for selection_iter in range(cfg.init_iteration, cfg.max_iterations + 1):
        active_set.selection_iter = selection_iter
        trainer = ALTrainer(cfg, selection_iter, val_dataset=val_dataset,
                            eval_dataset=eval_dataset)
        # the fresh-init state (random init, or init_checkpoint merged
        # below): start_over restores it before training. jax arrays are
        # immutable, so holding the reference is free.
        if init_checkpoint:
            trainer.load(init_checkpoint)
        init_state = trainer.state
        if (selection_iter == cfg.init_iteration and selection_iter != 1
                and cfg.resume_checkpoint):
            # resumed run: warm-start from the interrupted round's
            # checkpoint, optionally with optimizer state
            # (train_AL.py:53-55)
            trainer.load(cfg.resume_checkpoint, load_optim=cfg.load_optim)
        elif selection_iter != 1 and selection_iter != cfg.init_iteration:
            # select with the previous round's best-val model
            # (train_AL.py:50-52)
            prev_ckpt = os.path.join(
                cfg.model_save_dir, f"checkpoint{selection_iter - 1:02d}")
            trainer.load(prev_ckpt, strip_classifier=False,
                         load_optim=cfg.load_optim)
        elif cfg.resume_checkpoint and selection_iter == 1:
            # round 1 never warm-starts — same silent rule as
            # train_AL.py:53 (`selection_iter != 1`); say so instead
            # of silently ignoring the flag (or_plbl runs still use
            # it to locate the plbl_gen directory)
            log.warning(
                "--resume-checkpoint is not loaded at round 1 "
                "(reference semantics); training from %s",
                init_checkpoint or "scratch")
        if (not cfg.skip_first_eval and eval_dataset is not None
                and selection_iter == cfg.init_iteration):
            # sanity-check eval of the loaded weights before sampling,
            # logged but not part of the per-round results
            # (train_AL.py:59-60)
            trainer.eval()
        sel_name = (cfg.init_active_method if selection_iter == 1
                    else cfg.active_method)
        selector = get_selector(sel_name, cfg)
        selector.select_next_batch(trainer, active_set,
                                   cfg.active_selection_size)
        active_set.dump_datalist()
        if cfg.start_over and trainer.state is not init_state:
            # reinitialize to the init weights before training
            # (train_AL.py:74-75); fresh optimizer state comes with it
            trainer.state = init_state
        trainer.train(active_set, metrics_cb=metrics_cb)
        if trainer.val_dataset is None or trainer.best_iou == 0.0:
            trainer.save()
        else:
            # load the round's best-val checkpoint so eval (and the next
            # round's selection, which re-reads this file) uses the best
            # model instead of the last training step (train_AL.py:80-81)
            trainer.load(trainer.checkpoint_file, strip_classifier=False)
        if eval_dataset is not None:
            miou, _ = trainer.eval()
            results[selection_iter] = miou
    return results
