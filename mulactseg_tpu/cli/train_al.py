"""Stage-1 active-learning round loop CLI (train_AL.py / train_AL_voc.py
equivalent — one binary, dataset chosen by --dataset).

    python -m mulactseg_tpu.cli.train_al --dataset cityscapes \
        --method active_joint_multi_predignore_lossdecomp \
        --active-method my_bvsb_predclsbal_pwr_banignore ...

Resume scenarios (train_AL.py:41-57): --init-iteration k with
--datalist-path restores the selection state; --resume-checkpoint warm-
starts the model; --init-checkpoint is the per-round (ImageNet) init.
"""

from __future__ import annotations

import jax

from mulactseg_tpu.cli.common import build_active_datasets, setup_run
from mulactseg_tpu.config import parse_config
from mulactseg_tpu.engine.rounds import run_al_rounds


def main(argv=None):
    cfg = parse_config(argv)
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    logger, sink = setup_run(cfg)
    logger.info("config: %s", cfg)
    active_set, val = build_active_datasets(cfg)
    if cfg.datalist_path:
        active_set.selection_iter = cfg.init_iteration - 1
        active_set.load_datalist(cfg.datalist_path)

    def metrics_cb(step, aux):
        sink.log(aux, step=step)

    results = run_al_rounds(
        cfg, active_set, val_dataset=val, eval_dataset=val,
        init_checkpoint=cfg.init_checkpoint or None,
        metrics_cb=metrics_cb)
    for rnd, miou in results.items():
        logger.info("round %d eval miou: %.2f", rnd, miou)
        sink.log({"eval_miou": miou, "round": rnd})
    return results


if __name__ == "__main__":
    main()
