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
    active_set, val = build_active_datasets(cfg)
    trainer = ALTrainer(cfg, cfg.init_iteration, val_dataset=val,
                        eval_dataset=val)
    if cfg.resume_checkpoint:
        trainer.load(cfg.resume_checkpoint)

    if cfg.plbl_type:
        if cfg.datalist_path:
            active_set.selection_iter = cfg.init_iteration
            active_set.load_datalist(cfg.datalist_path)
        assert cfg.val_batch_size == 1 or True  # generator uses batch 1
        label_ds = active_set.trg_label_dataset
        eval_all = EvalRegionDatasetAll(cfg, label_ds, label_ds.suppix)
        loader = DataProvider(eval_all, 1, shuffle=False, drop_last=False,
                              infinite=False, num_workers=cfg.val_num_workers)
        gen = PseudoLabelGenerator(trainer.model, cfg,
                                   plbl_type=cfg.plbl_type,
                                   use_tta=cfg.dataset == "voc")
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
