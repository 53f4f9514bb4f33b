"""Analysis-only eval trainers (engine/analysis.py): every method runs on
a tiny fixture and reports sane tables; the within-predregion metric mode
matches a numpy transcription of utils/miou.py:40-55."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mulactseg_tpu.config import Config
from mulactseg_tpu.data.synthetic import grid_superpixels
from mulactseg_tpu.engine.analysis import ANALYSIS_METHODS, AnalysisEvaluator
from mulactseg_tpu.models import get_model
from mulactseg_tpu.utils.metrics import MeanIoU

H = W = 24
S, C = 9, 5


def test_within_predregion_metric_parity():
    rng = np.random.RandomState(0)
    preds = rng.randint(0, C, (2, 10, 10))
    preds[rng.rand(2, 10, 10) < 0.3] = 255
    targets = rng.randint(0, C, (2, 10, 10))
    targets[rng.rand(2, 10, 10) < 0.2] = 255

    m = MeanIoU(C, 255)
    m._after_step_within_predregion({"outputs": preds, "targets": targets})
    seen, correct, positive = m._marginals()

    # transcription of MeanIoU._after_step_within_predregion
    # (/root/reference/utils/miou.py:40-55)
    t = targets[preds != 255]
    p = preds[preds != 255]
    for i in range(C):
        assert seen[i] == np.sum(t == i), i
        assert correct[i] == np.sum((t == i) & (p == t)), i
        assert positive[i] == np.sum(p == i), i


@pytest.fixture(scope="module")
def fixture_model():
    cfg = Config(num_classes=C, nseg=S, crop_size=(H, W), dtype="float32",
                 loader="synthetic", model_save_dir="/tmp/analysis_run")
    model = get_model("deeplabv3plus_mobilenet",
                      num_classes=cfg.num_model_classes, output_stride=16,
                      dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.ones((1, H, W, 3)), train=False)
    return cfg, model, variables


def _batches(n=2):
    rng = np.random.RandomState(1)
    spx = grid_superpixels(H, W, S)
    out = []
    for i in range(n):
        labels = rng.randint(0, C, (1, H, W)).astype(np.int32)
        target = (rng.rand(S, C + 1) < 0.4).astype(np.float32)
        target[:, -1] = 0
        spmask = np.isin(spx, [0, 2, 4, 6])
        out.append({
            "images": rng.randn(1, H, W, 3).astype(np.float32),
            "labels": labels,
            "spx": spx[None].astype(np.int32),
            "spmask": spmask[None],
            "target": target[None],
            "fnames": [[f"img_{i}.png", f"lbl_{i}.png", f"spx_{i}.pkl"]],
        })
    return out


@pytest.mark.parametrize("method", sorted(ANALYSIS_METHODS))
def test_analysis_method_runs(method, fixture_model, tmp_path):
    cfg, model, variables = fixture_model
    ev = AnalysisEvaluator(model, cfg, method)
    suppix = {f"spx_{i}.pkl": [0, 2, 4, 6] for i in range(2)}
    prev = {"spx_0.pkl": [0]}
    batches = _batches()
    if method == "eval_all_dominant":
        # its loader contract: 'target' is the per-pixel dominant-label map
        # (eval_all_dominant.py:40; region_cityscapes_all loader)
        rng = np.random.RandomState(2)
        for b in batches:
            dom = rng.randint(0, C, (1, H, W)).astype(np.int32)
            dom[rng.rand(1, H, W) < 0.3] = 255
            b["target"] = dom
    res = ev.run(variables["params"], variables["batch_stats"], batches,
                 suppix=suppix, prev_suppix=prev,
                 save_dir=str(tmp_path / "vis"))
    assert np.isfinite(res["miou"])
    n_expected = (C if method == "eval_naive_vis" else C + 1) + 1
    base_table = res["iou_table"].split(",")
    if method == "eval_naive_vis":
        assert len(base_table) == n_expected + 1  # + undefined IoU column
        assert (tmp_path / "vis").exists()
    else:
        assert len(base_table) == n_expected
    if ANALYSIS_METHODS[method].get("ipr"):
        assert len(res["precision_table"].split(",")) == \
            len(res["recall_table"].split(","))


def test_unknown_method_raises(fixture_model):
    cfg, model, _ = fixture_model
    with pytest.raises(KeyError):
        AnalysisEvaluator(model, cfg, "eval_nonexistent")
