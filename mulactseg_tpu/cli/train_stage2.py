"""Stage-2 retraining CLI (train_stage2_AL.py equivalent): plain CE on
the saved pseudo-label maps, fresh C+1-class model per round
(trainer/active_predignore.py:12-95).

    python -m mulactseg_tpu.cli.train_stage2 --stage2 true \
        --method active_predignore --loader region_plbl \
        --datalist-path datalist_01.json --resume-checkpoint CKPT \
        --plbl-type cosprop_includeonehot
"""

from __future__ import annotations

import os

from mulactseg_tpu.cli.common import build_active_datasets, setup_run
from mulactseg_tpu.config import parse_config
from mulactseg_tpu.data import RegionDatasetPlbl, get_train_transform
from mulactseg_tpu.engine.rounds import ALTrainer
from mulactseg_tpu.plbl.generator import plbl_save_dir


def main(argv=None):
    cfg = parse_config(argv)
    logger, sink = setup_run(cfg)
    active_set, val = build_active_datasets(cfg)
    if cfg.datalist_path:
        active_set.selection_iter = cfg.init_iteration
        active_set.load_datalist(cfg.datalist_path)

    round_id = f"{cfg.init_iteration:02d}"
    plbl_dir = plbl_save_dir(
        cfg.resume_checkpoint or os.path.join(cfg.model_save_dir, "x"),
        cfg.plbl_type, round_id)
    tf_name = ("rescale_769_nospx" if cfg.dataset == "cityscapes"
               else "rescale_513_notrg")
    stage2_ds = RegionDatasetPlbl(
        cfg, active_set.trg_label_dataset.im_idx, plbl_dir,
        transform=get_train_transform(tf_name, cfg, seed=cfg.seed))

    class _Stage2Set:
        def get_trainset(self):
            return stage2_ds

    trainer = ALTrainer(cfg, cfg.init_iteration, val_dataset=val,
                        eval_dataset=val)
    if cfg.init_checkpoint:
        trainer.load(cfg.init_checkpoint)
    trainer.checkpoint_file = os.path.join(
        cfg.model_save_dir, f"stage2_checkpoint{round_id}")
    trainer.train(_Stage2Set(),
                  metrics_cb=lambda step, aux: sink.log(aux, step=step))
    if trainer.best_iou == 0.0:
        trainer.save()
    if val is not None:
        miou, table = trainer.eval()
        sink.log({"stage2_eval_miou": miou, "round": cfg.init_iteration})
        logger.info("stage2 round %s eval miou: %.2f", round_id, miou)
        return miou


if __name__ == "__main__":
    main()
