"""Checkpoint evaluation / pseudo-label generation CLI (eval_AL.py /
eval_AL_voc.py equivalent).

    # plain eval (eval_naive path)
    python -m mulactseg_tpu.cli.eval_al --resume-checkpoint CKPT

    # pseudo-label generation (eval_save_cosplbl_prop_includeonehot path)
    python -m mulactseg_tpu.cli.eval_al --resume-checkpoint CKPT \
        --plbl-type cosprop_includeonehot --datalist-path datalist_01.json
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from mulactseg_tpu.cli.common import build_active_datasets, setup_run
from mulactseg_tpu.config import parse_config
from mulactseg_tpu.data import DataProvider, EvalRegionDatasetAll
from mulactseg_tpu.engine.rounds import ALTrainer
from mulactseg_tpu.plbl.generator import PseudoLabelGenerator, plbl_save_dir


def main(argv=None):
    cfg = parse_config(argv)
    logger, sink = setup_run(cfg)
    from mulactseg_tpu.plbl.generator import METHOD_TO_PLBL

    if not cfg.plbl_type and cfg.method in METHOD_TO_PLBL:
        # reference command-line compatibility: --method eval_save_*
        cfg.plbl_type = METHOD_TO_PLBL[cfg.method]
    active_set, val = build_active_datasets(cfg)
    trainer = ALTrainer(cfg, cfg.init_iteration, val_dataset=val,
                        eval_dataset=val)
    # the reference evaluates --init_checkpoint (eval_AL.py:43); the
    # resume checkpoint (same file in the scripts) anchors the plbl dir
    ckpt = cfg.init_checkpoint or cfg.resume_checkpoint
    if ckpt:
        trainer.load(ckpt)

    if cfg.method == "active_joint_multi_analysis":
        # top-1 selection accuracy over the labeled set
        # (trainer/active_joint_multi_analysis.py:27-102; its train_impl
        # raises NotImplementedError — eval only)
        from mulactseg_tpu.engine.analysis import SelectionAccuracyEvaluator

        if cfg.datalist_path:
            active_set.selection_iter = cfg.init_iteration
            active_set.load_datalist(cfg.datalist_path)
        label_ds = active_set.trg_label_dataset
        label_ds.load_gt = True  # the probe needs the precise GT map
        loader = DataProvider(label_ds, cfg.train_batch_size, shuffle=False,
                              drop_last=False, infinite=False,
                              num_workers=cfg.val_num_workers)
        evaluator = SelectionAccuracyEvaluator(trainer.model, cfg)
        res = evaluator.run(trainer.state.params, trainer.state.batch_stats,
                            loader, selection_iter=cfg.init_iteration,
                            logger=logger)
        sink.log({"top1_selection_acc": res["acc_total"],
                  "round": cfg.init_iteration})
        return res["acc_total"]

    from mulactseg_tpu.engine.analysis import ANALYSIS_METHODS

    if cfg.method in ANALYSIS_METHODS:
        from mulactseg_tpu.engine.analysis import AnalysisEvaluator

        if cfg.datalist_path:
            active_set.selection_iter = cfg.init_iteration
            active_set.load_datalist(cfg.datalist_path)
        label_ds = active_set.trg_label_dataset
        if ANALYSIS_METHODS[cfg.method].get("pred") == "argmax":
            # eval_naive_vis evaluates the val set (eval_naive_vis.py:25-29)
            if val is None:
                raise SystemExit("eval_naive_vis needs a validation datalist")
            eval_ds = val
        else:
            # analysis (non-eval_save) runs drop single-candidate
            # superpixels (eval_region_cityscapes_all.py:18-24); the
            # withinmulti loader additionally 255-masks GT outside spmask
            eval_ds = EvalRegionDatasetAll(
                cfg, label_ds, label_ds.suppix, remove_dominant=True,
                mask_unselected="withinmulti" in cfg.loader)
        loader = DataProvider(eval_ds, 1, shuffle=False, drop_last=False,
                              infinite=False, num_workers=cfg.val_num_workers)
        prev_suppix = None
        if ANALYSIS_METHODS[cfg.method].get("exclude_round"):
            # eval_selected_spx_plbl.py:40-44: subtract the round-1
            # selections so only this round's superpixels are evaluated
            import json as _json

            r1 = os.path.join(os.path.dirname(cfg.datalist_path or
                                              cfg.model_save_dir),
                              "datalist_01.json")
            if os.path.exists(r1):
                with open(r1) as f:
                    prev_suppix = _json.load(f)["trg_label_suppix"]
        evaluator = AnalysisEvaluator(trainer.model, cfg, cfg.method)
        save_dir = (os.path.join(cfg.model_save_dir,
                                 f"vis_{cfg.method}_{cfg.init_iteration:02d}")
                    if (cfg.save_vis or
                        ANALYSIS_METHODS[cfg.method].get("save_vis"))
                    else None)
        res = evaluator.run(trainer.state.params, trainer.state.batch_stats,
                            loader, suppix=label_ds.suppix,
                            prev_suppix=prev_suppix, save_dir=save_dir,
                            logger=logger)
        sink.log({"analysis_miou": res["miou"], "round": cfg.init_iteration})
        return res["miou"]

    if cfg.plbl_type:
        if cfg.datalist_path:
            active_set.selection_iter = cfg.init_iteration
            active_set.load_datalist(cfg.datalist_path)
        assert cfg.val_batch_size == 1 or True  # generator uses batch 1
        label_ds = active_set.trg_label_dataset
        # eval_save_* keeps dominant superpixels
        # (eval_region_cityscapes_all.py:21-22)
        eval_all = EvalRegionDatasetAll(
            cfg, label_ds, label_ds.suppix,
            mask_unselected="withinmulti" in cfg.loader,
            # raw uint8 on the wire (4x less than f32); the generator
            # normalizes on device (fused) or host (unfused), same LUT
            emit_u8=True)
        loader = DataProvider(eval_all, 1, shuffle=False, drop_last=False,
                              infinite=False, num_workers=cfg.val_num_workers)
        gen = PseudoLabelGenerator(trainer.model, cfg,
                                   plbl_type=cfg.plbl_type,
                                   use_tta=cfg.dataset == "voc" or
                                   cfg.method.endswith("_ms"))
        round_id = f"{cfg.init_iteration:02d}"
        save_dir = plbl_save_dir(
            cfg.resume_checkpoint or os.path.join(cfg.model_save_dir, "x"),
            cfg.plbl_type, round_id)
        miou, iou_t, prec_t, rec_t = gen.generate(
            trainer.state.params, trainer.state.batch_stats, loader,
            save_dir=save_dir, suppix=label_ds.suppix)
        logger.info("[plbl round %s] IoU: %s", round_id, iou_t)
        logger.info("[plbl round %s] Precision: %s", round_id, prec_t)
        logger.info("[plbl round %s] Recall: %s", round_id, rec_t)
        sink.log({"plbl_miou": miou, "round": cfg.init_iteration})
        return miou

    if val is None:
        raise SystemExit("no validation datalist found for evaluation")
    miou, table = trainer.eval()
    sink.log({"eval_miou": miou})
    return miou


if __name__ == "__main__":
    main()
