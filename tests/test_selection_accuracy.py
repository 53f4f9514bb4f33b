"""active_joint_multi_analysis: top-1 selection-accuracy probe matches a
numpy brute-force transcription of the reference's per-image loop
(/root/reference/trainer/active_joint_multi_analysis.py:66-103)."""

import numpy as np
import jax.numpy as jnp

from mulactseg_tpu.engine.analysis import top1_selection_counts

B, H, W = 2, 16, 16
S, C = 7, 5


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _brute_force(logits, multihot, spx, spmask, gt):
    """Transcription of the reference loop: per image, per superpixel,
    per candidate class — argmax-prob pixel within the superpixel, check
    precise GT there."""
    ncorr_cls = np.zeros(C)
    n_cls = np.zeros(C)
    ncorr_total = 0
    n_total = 0
    for i in range(logits.shape[0]):
        probs = _softmax(logits[i].reshape(-1, C), 1)
        sid = spx[i].reshape(-1)
        mask = spmask[i].reshape(-1).astype(bool)
        g = gt[i].reshape(-1)
        for s in range(S):
            rows = np.where((sid == s) & mask)[0]
            if rows.size == 0:
                continue
            for c in range(C):
                if not multihot[i, s, c]:
                    continue
                amax = rows[np.argmax(probs[rows, c])]
                gtv = int(g[amax])
                ok = gtv == c
                ncorr_total += ok
                n_total += 1
                if gtv < C:  # ref would crash on 255 here
                    ncorr_cls[gtv] += ok
                    n_cls[gtv] += 1
    return ncorr_cls, n_cls, ncorr_total, n_total


def test_top1_selection_counts_parity():
    rng = np.random.RandomState(3)
    logits = rng.randn(B, H, W, C).astype(np.float32)
    spx = rng.randint(0, S, (B, H, W)).astype(np.int32)
    spx[1][spx[1] == 3] = 0          # make one superpixel empty
    spmask = (rng.rand(B, H, W) < 0.7)
    multihot = (rng.rand(B, S, C + 1) < 0.5).astype(np.float32)
    gt = rng.randint(0, C, (B, H, W)).astype(np.int32)
    gt[rng.rand(B, H, W) < 0.1] = 255  # some ignore pixels

    cc, nc, ct, nt = top1_selection_counts(
        jnp.asarray(logits), jnp.asarray(multihot), jnp.asarray(spx),
        jnp.asarray(spmask), jnp.asarray(gt), nseg=S, num_classes=C)
    bc, bn, bct, bnt = _brute_force(logits, multihot, spx, spmask, gt)

    np.testing.assert_allclose(np.asarray(cc), bc)
    np.testing.assert_allclose(np.asarray(nc), bn)
    assert float(ct) == bct
    assert float(nt) == bnt


def test_all_masked_image_contributes_nothing():
    logits = np.zeros((1, H, W, C), np.float32)
    spx = np.zeros((1, H, W), np.int32)
    spmask = np.zeros((1, H, W), bool)
    multihot = np.ones((1, S, C + 1), np.float32)
    gt = np.zeros((1, H, W), np.int32)
    cc, nc, ct, nt = top1_selection_counts(
        jnp.asarray(logits), jnp.asarray(multihot), jnp.asarray(spx),
        jnp.asarray(spmask), jnp.asarray(gt), nseg=S, num_classes=C)
    assert float(nt) == 0 and float(ct) == 0
    assert np.all(np.asarray(nc) == 0)


def test_cli_dispatch(tmp_path):
    """eval_al --method active_joint_multi_analysis runs the probe over
    the labeled set from a datalist (eval_AL.py:45 -> trainer.eval)."""
    import json
    import pickle

    from PIL import Image

    from mulactseg_tpu.data.synthetic import grid_superpixels
    from mulactseg_tpu.tools.label_assignment import generate_multi_hot_dataset

    rng = np.random.RandomState(0)
    Hd = Wd = 24
    Sd, Cd = 16, 19
    root = tmp_path / "data"
    root.mkdir()
    spx_map = grid_superpixels(Hd, Wd, Sd)
    rows, region, gts = [], {}, []
    for i in range(2):
        img = rng.randint(0, 255, (Hd, Wd, 3), np.uint8)
        gt = rng.randint(0, Cd, (Hd, Wd)).astype(np.uint8)
        gts.append(gt)
        Image.fromarray(img).save(root / f"img_{i}.png")
        Image.fromarray(gt).save(root / f"lbl_{i}.png")
        with open(root / f"spx_{i}.pkl", "wb") as f:
            pickle.dump({"labels": spx_map}, f)
        rows.append(f"img_{i}.png\tlbl_{i}.png\tspx_{i}.pkl")
        region[f"spx_{i}.pkl"] = [Sd, []]
    (root / "train.txt").write_text("\n".join(rows))
    (root / "train.dict").write_text(json.dumps(region))
    mh_dir = (root / "superpixel_seed" / "cityscapes" / f"seeds_{Sd}" /
              "train" / "gtFine_multi_tensor_trim_5x5")
    generate_multi_hot_dataset([(g, spx_map) for g in gts], Sd, Cd,
                               str(mh_dir), trim=True, trim_kernel=5)
    # hand-written round-1 datalist: image 0 fully labeled
    datalist = {
        "trg_label_im_idx": [[str(root / "img_0.png"),
                              str(root / "lbl_0.png"),
                              str(root / "spx_0.pkl")]],
        "trg_pool_im_idx": [[str(root / "img_1.png"),
                             str(root / "lbl_1.png"),
                             str(root / "spx_1.pkl")]],
        "trg_label_suppix": {str(root / "spx_0.pkl"): list(range(Sd))},
        "trg_pool_suppix": {str(root / "spx_1.pkl"): list(range(Sd))},
    }
    (tmp_path / "datalist_01.json").write_text(json.dumps(datalist))

    run_dir = tmp_path / "run"
    from mulactseg_tpu.cli.eval_al import main as eval_main
    acc = eval_main([
        "--dataset", "cityscapes", "--num-classes", "19",
        "--data-root", str(root), "--datalist-dir", str(root),
        "--trg-datalist", str(root / "train.txt"),
        "--region-dict", str(root / "train.dict"),
        "--nseg", str(Sd), "--crop-size", "24", "24",
        "--label-encoding", "identity",
        "--train-batch-size", "2", "--val-batch-size", "1",
        "--dtype", "float32", "--num-workers", "2",
        "--val-num-workers", "2",
        "--model-save-dir", str(run_dir),
        "--model", "deeplabv3plus_mobilenet",
        "--init-iteration", "1",
        "--datalist-path", str(tmp_path / "datalist_01.json"),
        "--method", "active_joint_multi_analysis",
    ])
    assert 0.0 <= acc <= 1.0
