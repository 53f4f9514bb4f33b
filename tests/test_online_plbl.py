"""Online prototype pseudo-label loss: parity of the plbl assignment with
a brute-force transcription (active_onlineplbl_multi_predignore.py:26-125)
and a full train step through the online criterion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mulactseg_tpu.losses.online import local_proto_ce, local_proto_plbl


def _softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def ref_local_plbl(feats, probs, targets, spx, spmask, S):
    P, Ch = feats.shape
    C = probs.shape[1]
    multi = targets.sum(1) > 1
    valid = spmask & multi[spx]
    plbl = np.full(P, 255, np.int64)
    if not valid.any():
        return plbl
    arg = np.full((S, C), -1)
    best = np.full((S, C), -np.inf)
    for p in np.nonzero(valid)[0]:
        for c in range(C):
            if probs[p, c] > best[spx[p], c]:
                best[spx[p], c] = probs[p, c]
                arg[spx[p], c] = p
    protos = []
    for s in range(S):
        if arg[s, 0] < 0 or not multi[s]:
            continue
        for c in range(C):
            if targets[s, c] > 0:
                protos.append((s, c, feats[arg[s, c]]))
    if not protos:
        return plbl
    psid = np.array([x[0] for x in protos])
    pcls = np.array([x[1] for x in protos])
    pf = np.stack([x[2] for x in protos])
    for p in np.nonzero(valid)[0]:
        js = np.nonzero(psid == spx[p])[0]
        if len(js) == 0:
            continue
        sims = pf[js] @ feats[p]
        plbl[p] = pcls[js[np.argmax(sims)]]
    return plbl


def test_local_proto_plbl_parity():
    rng = np.random.RandomState(0)
    P, Ch, S, C = 256, 8, 9, 5
    feats = rng.randn(P, Ch).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    probs = _softmax(rng.randn(P, C).astype(np.float32), 1)
    spx = rng.randint(0, S, P).astype(np.int32)
    targets = np.zeros((S, C), np.float32)
    for s in range(S):
        targets[s, rng.choice(C, rng.randint(1, 4), replace=False)] = 1
    spmask = rng.rand(P) < 0.7
    want = ref_local_plbl(feats, probs, targets, spx, spmask, S)
    got, sim, is_src = local_proto_plbl(jnp.asarray(feats), jnp.asarray(probs),
                                jnp.asarray(targets), jnp.asarray(spx),
                                jnp.asarray(spmask), nseg=S, max_protos=64,
                                chunk=64)
    np.testing.assert_array_equal(np.asarray(got), want)
    # similarity reported only where assigned
    assert (np.asarray(sim)[want == 255] == 0).all()


def test_local_proto_ce_ignores_and_nan_guard():
    logits = jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 5),
                         jnp.float32)
    plbl = jnp.full((2, 4, 4), 255, jnp.int32)
    assert float(local_proto_ce(logits, plbl)) == 0.0
    plbl2 = plbl.at[0, 0, 0].set(2)
    assert float(local_proto_ce(logits, plbl2)) > 0


@pytest.mark.slow
def test_online_criterion_train_step():
    from mulactseg_tpu.config import Config
    from mulactseg_tpu.engine.state import create_train_state
    from mulactseg_tpu.engine.train import make_train_step
    from mulactseg_tpu.models.deeplab import DeepLabHeadV3Plus, DeepLabV3
    from mulactseg_tpu.models.resnet import ResNet
    from mulactseg_tpu.data.synthetic import SyntheticRegionDataset
    from mulactseg_tpu.data.loader import collate

    cfg = Config(num_classes=5, nseg=16, crop_size=(32, 32),
                 train_batch_size=2, finetune_itrs=10,
                 method="active_onlinewplbl_multi_predignore",
                 dtype="float32")
    model = DeepLabV3(
        backbone=ResNet(layers=(1, 1, 1, 1), deep_stem=True, stem_width=8),
        classifier=DeepLabHeadV3Plus(cfg.num_model_classes, (2, 4, 6),
                                     variant="wn"))
    state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                               (2, 32, 32, 3), total_itrs=10)
    ds = SyntheticRegionDataset(n_images=2, H=32, W=32, num_classes=5,
                                nseg=16)
    b = collate([ds[0], ds[1]])
    batch = {k: jnp.asarray(b[k]) for k in ("images", "target", "spx",
                                            "spmask")}
    step = make_train_step(model, cfg, donate=False)
    state2, aux = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["train_loss"]))
    assert "local_proto_loss" in aux and "pos_loss" in aux
