"""End-to-end ALTrainer.train throughput INCLUDING the input pipeline
(dev tool): real on-disk PNGs at Cityscapes sizes -> DataProvider thread
decode -> PairedTransform 768 crop -> pixel_target_bits packing ->
jnp.asarray + (optional) shard -> device scan steps.

Also times the pipeline stages host-side in isolation so the gap to the
device-only number (bench.py) is attributable. This box has ONE CPU core
— PNG decode is the expected bottleneck here; the stage timings give the
cores-needed-to-sustain-device-rate estimate for a real TPU host.

Run: python tools_dev/bench_e2e.py [--images 8] [--iters 32]
"""

import argparse
import json
import os
import pickle
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

H_FULL, W_FULL = 1024, 2048
CROP = 768
NSEG = 2048
C = 19


def build_fixture(root, n_images):
    from PIL import Image

    from mulactseg_tpu.data.synthetic import irregular_superpixels
    from mulactseg_tpu.tools.label_assignment import generate_multi_hot_dataset

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    spx_maps = [irregular_superpixels(H_FULL, W_FULL, NSEG, rng)
                for _ in range(2)]
    rows, region, pairs = [], {}, []
    for i in range(n_images):
        spx = spx_maps[i % len(spx_maps)]
        img = rng.randint(0, 255, (H_FULL, W_FULL, 3), np.uint8)
        gt = rng.randint(0, C, (H_FULL, W_FULL)).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, f"img_{i}.png"))
        Image.fromarray(gt).save(os.path.join(root, f"lbl_{i}.png"))
        with open(os.path.join(root, f"spx_{i}.pkl"), "wb") as f:
            pickle.dump({"labels": spx}, f)
        rows.append(f"img_{i}.png\tlbl_{i}.png\tspx_{i}.pkl")
        region[f"spx_{i}.pkl"] = [NSEG, []]
        pairs.append((gt, spx))
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(rows))
    import json as _json

    with open(os.path.join(root, "train.dict"), "w") as f:
        f.write(_json.dumps(region))
    mh_dir = os.path.join(root, "superpixel_seed", "cityscapes",
                          f"seeds_{NSEG}", "train",
                          "gtFine_multi_tensor_trim_5x5")
    generate_multi_hot_dataset(pairs, NSEG, C, mh_dir, trim=True,
                               trim_kernel=5)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--root", default="/tmp/bench_e2e_data")
    ap.add_argument("--ship-u8", action="store_true",
                    help="uint8 crops + on-device normalization")
    args = ap.parse_args()

    from mulactseg_tpu.config import Config
    from mulactseg_tpu.data import DataProvider
    from mulactseg_tpu.cli.common import build_active_datasets

    if not os.path.exists(os.path.join(args.root, "train.txt")):
        t0 = time.perf_counter()
        build_fixture(args.root, args.images)
        print(f"# fixture built in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    cfg = Config(num_classes=C, nseg=NSEG, crop_size=(CROP, CROP),
                 train_batch_size=4, dataset="cityscapes",
                 data_root=args.root, datalist_dir=args.root,
                 trg_datalist=os.path.join(args.root, "train.txt"),
                 region_dict=os.path.join(args.root, "train.dict"),
                 label_encoding="identity",
                 method="active_joint_multi_predignore_lossdecomp",
                 dtype="bfloat16", num_workers=4, val_num_workers=0,
                 steps_per_dispatch=8, finetune_itrs=args.iters,
                 ship_uint8=args.ship_u8,
                 model_save_dir="/tmp/bench_e2e_run", save_scores=False)
    active_set, _ = build_active_datasets(cfg)
    label = active_set.trg_label_dataset
    label.im_idx = list(active_set.trg_pool_dataset.im_idx)
    label.suppix = {k[2]: list(range(NSEG)) for k in label.im_idx}

    # --- stage timings, single-thread host ---------------------------------
    t0 = time.perf_counter()
    n_items = 8
    for i in range(n_items):
        item = label[i % len(label)]
    dt_item = (time.perf_counter() - t0) / n_items
    print(json.dumps({"metric": "loader_item_latency",
                      "value": round(dt_item * 1e3, 1),
                      "unit": "ms/item single-thread (decode+crop+pack)"}))

    from mulactseg_tpu.losses.fused import pixel_target_bits

    tgt = np.asarray(label.multi_hot_cls[0], np.float32)
    spx = item["spx"]
    spm = item["spmask"]
    t0 = time.perf_counter()
    for _ in range(20):
        pixel_target_bits(tgt, spx, spm)
    dt_pack = (time.perf_counter() - t0) / 20
    print(json.dumps({"metric": "bit_pack_latency",
                      "value": round(dt_pack * 1e3, 2),
                      "unit": "ms/item host bit-packing share"}))

    # --- end-to-end train through ALTrainer --------------------------------
    from mulactseg_tpu.engine.rounds import ALTrainer

    trainer = ALTrainer(cfg, selection_iter=1)
    # warm compile with one dispatch
    trainer.train(active_set, total_itrs=cfg.steps_per_dispatch,
                  log_every=10**6)
    t0 = time.perf_counter()
    img_s = trainer.train(active_set, total_itrs=args.iters,
                          log_every=10**6)
    wall = time.perf_counter() - t0
    img_per_s = args.iters * cfg.train_batch_size / wall
    print(json.dumps({"metric": "e2e_train_throughput",
                      "value": round(img_per_s, 3),
                      "unit": "images/sec/chip incl. input pipeline"}))


if __name__ == "__main__":
    main()
